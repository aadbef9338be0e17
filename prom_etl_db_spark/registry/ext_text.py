"""SURVEY.md §2.E — BPE training/encode, Gopher/C4/DSIR/bigram-LM
curation filters, heavy hitters, CDC, rollup cube, TPC-H rows 18/4/14.
Contiguous split of the former extensions.py (round 6, pure mechanics
— registration order unchanged; VERDICT r5 task #6)."""

from __future__ import annotations

from datetime import datetime, timedelta  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from prom_etl_db_spark import store  # noqa: F401
from prom_etl_db_spark.functions import (  # noqa: F401
    clustering,
    decontam,
    dedup,
    multimodal,
    sampling,
    similarity,
    spectral,
    text,
)
from prom_etl_db_spark.functions import gorilla, linkage, urlnorm  # noqa: F401
from prom_etl_db_spark.operators import analytics, promql  # noqa: F401
from prom_etl_db_spark.registry.core import (  # noqa: F401
    FLAGSHIP_DAY,
    NOW,
    _event_samples,
    _events,
    _t,
    register,
)
from prom_etl_db_spark.timeparse import RelativeTimeParser  # noqa: F401


@register(
    "bpe_pair_counts",
    oracle=r"""
WITH words AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM documents)
  WHERE length(w) > 0 GROUP BY w
), toks AS (
  SELECT freq,
         list_append(list_filter(string_split(w, ''), x -> x != ''), '</w>') AS t
  FROM words
), flat AS (
  SELECT unnest(list_zip(list_slice(t, 1, len(t) - 1), list_slice(t, 2, len(t)))) AS p,
         freq
  FROM toks
), counted AS (
  SELECT p[1] AS left_tok, p[2] AS right_tok,
         CAST(sum(freq) AS BIGINT) AS n
  FROM flat GROUP BY 1, 2
)
SELECT left_tok, right_tok, n,
       row_number() OVER (ORDER BY n DESC, left_tok, right_tok) AS rank
FROM counted QUALIFY rank <= 20
""",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair-counting core of BPE training (`text.bpe_train`),
    oracle-checked in isolation: top-20 adjacent-token pairs of the
    char+'</w>' tokenization, frequency-weighted via the distinct-word
    vocab (the hash agg that shrinks 100 TB of text to a language-vocab
    table), ranked with the trainer's exact (count desc, pair asc)
    tiebreak. The iterative trainer itself is rows-only by nature (each
    round's argmax feeds the next round's state, like the IVF index
    build) and is exact-equality unit-tested against a from-scratch
    local reference.

    Scale shape (r5, VERDICT task #2): the top-20 is taken FIRST with
    orderBy().limit() — TakeOrderedAndProject, a per-partition partial
    top-k that never moves the full pair table (a multilingual 100 TB
    corpus has a ~10^7-row pair table). The rank over the 20 survivors
    is then sort_array(collect_list(struct)) + posexplode — row_number
    without any WindowExec, so no unpartitioned-window plan (and no
    single-partition WARN) exists anywhere. The sort key flips n's sign
    so one ascending struct sort realizes the trainer's
    (count desc, pair asc) tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    counted = text.bpe_pair_frequencies(text.bpe_word_vocab(docs))
    top = counted.orderBy(
        F.desc("n"), F.asc("left_tok"), F.asc("right_tok")
    ).limit(20)
    packed = top.select(
        F.struct(
            (-F.col("n")).alias("neg_n"),
            F.col("left_tok"),
            F.col("right_tok"),
        ).alias("row")
    )
    return (
        packed.agg(F.sort_array(F.collect_list("row")).alias("rows"))
        .select(F.posexplode("rows").alias("pos", "row"))
        .select(
            F.col("row.left_tok").alias("left_tok"),
            F.col("row.right_tok").alias("right_tok"),
            (-F.col("row.neg_n")).alias("n"),
            (F.col("pos") + F.lit(1)).alias("rank"),
        )
    )


@register(
    "bpe_learned_merges",
    oracle=r"""
WITH RECURSIVE words AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM documents)
  WHERE length(w) > 0 GROUP BY w
), vocab0 AS (
  -- Each word as ' t1  t2 ... tn ' (single-space wrap, double-space
  -- separators). Tokens come from a \s+ split so they can never contain
  -- whitespace, making the encoding unambiguous.
  SELECT list(struct_pack(freq := freq,
    s := ' ' || array_to_string(
           list_append(list_filter(string_split(w, ''), x -> x != ''), '</w>'),
           '  ') || ' ')) AS vocab
  FROM words
), steps AS (
  SELECT 0 AS i, CAST(NULL AS STRUCT(a VARCHAR, b VARCHAR)) AS w, vocab FROM vocab0
  UNION ALL
  -- replace() is left-to-right non-overlapping = the trainer's greedy
  -- carry-fold; the wrapping spaces survive every substitution so token
  -- boundaries stay intact ([a,a,a,a] -> [aa,aa], not [aa,a,a]).
  SELECT i + 1, win,
    list_transform(vocab, v -> struct_pack(freq := v.freq,
      s := replace(v.s, ' ' || win.a || '  ' || win.b || ' ',
                        ' ' || win.a || win.b || ' ')))
  FROM (
    SELECT i, vocab,
      (SELECT struct_pack(a := l, b := r)
       FROM (
         SELECT tk[x] AS l, tk[x+1] AS r, sum(freq) AS n
         FROM (SELECT u.freq AS freq,
                      string_split(trim(u.s, ' '), '  ') AS tk
               FROM unnest(vocab) AS t(u)),
              unnest(range(1, len(tk))) AS g(x)
         GROUP BY 1, 2)
       ORDER BY n DESC, l, r LIMIT 1) AS win
    FROM steps WHERE i < 10
  )
)
SELECT CAST(i AS BIGINT) AS rank, w.a AS left_tok, w.b AS right_tok,
       w.a || w.b AS merged
FROM steps WHERE i >= 1 ORDER BY rank
""",
)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (`text.bpe_train`, Sennrich
    2016): 10 learned merge rules over the documents corpus. The oracle
    replays the trainer exactly as a DuckDB recursive CTE over the
    collapsed word vocab (the Holt-recurrence oracle technique): each
    recursion step recomputes frequency-weighted pair counts, takes the
    (count desc, pair asc) argmax, and applies the merge via a
    space-delimited string replace — left-to-right non-overlapping
    replacement IS the trainer's greedy carry-fold because tokens are
    whitespace-free by construction. Also exact-equality unit-tested
    against a from-scratch local reference including the self-merge-run
    edge case."""
    docs = _t(spark, sf_dir, "documents")
    merges = text.bpe_train(docs, 10)
    return spark.createDataFrame(
        [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank long, left_tok string, right_tok string, merged string",
    )


@register(
    "doc_gopher_quality",
    oracle=r"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x != '') AS words,
         string_split(text, chr(10)) AS lines
  FROM documents
), metrics AS (
  SELECT doc_id,
    len(words) AS n_words,
    round(CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
          / len(words), 4) AS mean_word_len,
    round((CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
           + CAST((length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT))
          / CAST(len(words) AS DOUBLE), 4) AS symbol_ratio,
    round(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))
          / CAST(len(lines) AS DOUBLE), 4) AS bullet_frac,
    round(len(list_filter(lines, l -> regexp_matches(rtrim(l), '\.\.\.$')))
          / CAST(len(lines) AS DOUBLE), 4) AS ellipsis_frac,
    round(len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
          / CAST(len(words) AS DOUBLE), 4) AS alpha_frac,
    len(list_intersect(list_distinct(words),
        ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM w
)
SELECT *,
       (n_words BETWEEN 50 AND 100000)
       AND (mean_word_len BETWEEN 3 AND 10)
       AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
       AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
       AND stop_hits >= 2 AS gopher_pass
FROM metrics
""",
)
def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, A1.1 — r4): the published
    MassiveWeb pre-training filters as one narrow Column projection —
    word-count and mean-word-length bounds, symbol ratio, bullet/
    ellipsis line fractions, alphabetic-word fraction, the ≥2-stopword
    requirement — every metric emitted so pipelines can audit WHICH
    rule dropped a page. The oracle replays the rule set in DuckDB list
    algebra. On this synthetic corpus every page fails (stop_hits < 2 —
    the fixture vocabulary lacks English function words, which is the
    stopword rule doing its job); the METRIC columns vary per document
    and carry the hash, and the both-ways flag split is pinned on
    English-like fixtures in tests/test_text.py."""
    docs = _t(spark, sf_dir, "documents")
    return text.gopher_quality_flags(docs)


@register(
    "doc_gopher_split",
    oracle=r"""
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN repeat(
                'the words of that land have been with them and they stay true. ',
                CAST(4 + doc_id % 4 AS INT))
              ELSE text END AS text
  FROM documents
), w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x != '') AS words,
         string_split(text, chr(10)) AS lines
  FROM src
), metrics AS (
  SELECT doc_id,
    len(words) AS n_words,
    round(CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
          / len(words), 4) AS mean_word_len,
    round((CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
           + CAST((length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT))
          / CAST(len(words) AS DOUBLE), 4) AS symbol_ratio,
    round(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))
          / CAST(len(lines) AS DOUBLE), 4) AS bullet_frac,
    round(len(list_filter(lines, l -> regexp_matches(rtrim(l), '\.\.\.$')))
          / CAST(len(lines) AS DOUBLE), 4) AS ellipsis_frac,
    round(len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
          / CAST(len(words) AS DOUBLE), 4) AS alpha_frac,
    len(list_intersect(list_distinct(words),
        ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM w
)
SELECT *,
       (n_words BETWEEN 50 AND 100000)
       AND (mean_word_len BETWEEN 3 AND 10)
       AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
       AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
       AND stop_hits >= 2 AS gopher_pass
FROM metrics
""",
)
def doc_gopher_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rules with the PASS flag actually splitting under the
    driver oracle (r5, VERDICT task #3): the sibling
    `doc_gopher_quality` runs the operator over the raw fixture corpus,
    where every page fails the ≥2-stopword rule (the synthetic
    vocabulary has no English function words), so its composite boolean
    is constant in the hashed output. Here the even-doc_id stratum is
    rewritten IN-QUERY to a closed-form English-like page (a 13-word
    stopword-rich sentence repeated 4 + doc_id % 4 times — 52..91 words,
    mean word length 3.85, six stopword hits, no symbols/bullets/
    ellipses) that passes every rule, exactly the stratum-construction
    trick `doc_c4_page_filter` uses; odd doc_ids keep the raw fixture
    text and keep failing. The REAL operator
    (`text.gopher_quality_flags`, pure Column projection, zero shuffle)
    runs unchanged over the constructed corpus, and the driver hash now
    pins gopher_pass = true AND false rows plus every metric column on
    both strata."""
    docs = _t(spark, sf_dir, "documents")
    eng = F.repeat(
        F.lit(
            "the words of that land have been with them and they stay true. "
        ),
        (F.lit(4) + F.col("doc_id") % 4).cast("int"),
    )
    bimodal = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, eng)
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return text.gopher_quality_flags(bimodal)


@register(
    "doc_c4_page_filter",
    oracle=r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x != '') AS words
  FROM documents
), paged AS (
  SELECT doc_id,
    array_to_string(
      list_transform(range(0, CAST(ceil(len(words) / 8.0) AS BIGINT)),
        i -> array_to_string(words[i*8+1 : i*8+8], ' ')
             || CASE WHEN (doc_id + i) % 3 != 0 THEN '.' ELSE '' END),
      chr(10))
    || CASE WHEN doc_id % 97 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet consectetur.' ELSE '' END
    || CASE WHEN doc_id % 89 = 0 THEN chr(10) || 'function() { return cookies; }' ELSE '' END
      AS page
  FROM w
), split AS (
  SELECT doc_id, page, string_split(page, chr(10)) AS lines FROM paged
), kept AS (
  SELECT doc_id, page, len(lines) AS n_lines,
    list_filter(lines, l ->
      regexp_matches(rtrim(l), '[.!?"]$')
      AND len(list_filter(regexp_split_to_array(l, '\s+'), x -> x != '')) >= 5
      AND NOT contains(lower(l), 'javascript')) AS keep
  FROM split
)
SELECT doc_id, CAST(n_lines AS INT) AS n_lines,
       CAST(len(keep) AS INT) AS n_lines_kept,
       (len(keep) >= 3 AND NOT contains(lower(page), 'lorem ipsum')
        AND NOT contains(page, '{')) AS page_kept,
       CASE WHEN len(keep) >= 3 AND NOT contains(lower(page), 'lorem ipsum')
                 AND NOT contains(page, '{')
            THEN array_to_string(keep, chr(10)) ELSE '' END AS kept_text
FROM kept
""",
)
def doc_c4_page_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2 — r4): the published
    line-level heuristics — terminal-punctuation lines with ≥5 words
    and no 'javascript' kept; pages with '{', 'lorem ipsum', or <3
    retained lines dropped. The fixture corpus has no line structure,
    so the query BUILDS a deterministic multi-line page per document
    (8-word lines, terminal punctuation on a (doc_id+i)%3 pattern,
    lorem-ipsum and curly-brace injections on doc_id strata) in the
    same closed form on both engines, then runs the REAL operator
    (`text.c4_line_filter`, pure Column algebra) over it; every rule
    fires on some stratum and the kept-text rejoin itself is part of
    the hash."""
    docs = _t(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
    )
    n_lines = F.ceil(F.size(words) / F.lit(8.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.array_join(F.slice(words, i * 8 + 1, 8), " "),
            F.when((F.col("doc_id") + i) % 3 != 0, F.lit(".")).otherwise(
                F.lit("")
            ),
        ),
    )
    page = F.concat(
        F.array_join(lines, "\n"),
        F.when(
            F.col("doc_id") % 97 == 0,
            F.lit("\nlorem ipsum dolor sit amet consectetur."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 89 == 0,
            F.lit("\nfunction() { return cookies; }"),
        ).otherwise(F.lit("")),
    )
    paged = docs.select("doc_id", page.alias("page"))
    return text.c4_line_filter(paged)


@register(
    "doc_bigram_lm_perplexity",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_train,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x != '') AS tk
  FROM documents
), pairs AS (
  SELECT doc_id, is_train, tk[x] AS prev, tk[x+1] AS w
  FROM toks, unnest(range(1, len(tk))) AS g(x)
), c2 AS (
  SELECT prev, w, count(*) AS c2 FROM pairs WHERE is_train GROUP BY 1, 2
), c1 AS (
  SELECT prev, count(*) AS c1 FROM pairs WHERE is_train GROUP BY 1
), v AS (
  SELECT count(DISTINCT u.w) AS v
  FROM (SELECT unnest(tk) AS w FROM toks WHERE is_train) u
), scored AS (
  SELECT p.doc_id,
         ln((coalesce(c2.c2, 0) + 1.0)
            / (coalesce(c1.c1, 0) + 1.0 * v.v)) AS logp
  FROM pairs p
  LEFT JOIN c2 ON c2.prev = p.prev AND c2.w = p.w
  LEFT JOIN c1 ON c1.prev = p.prev
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(logp), 6) AS avg_logp,
       round(exp(-avg(logp)), 4) AS ppl
FROM scored GROUP BY doc_id
""",
)
def doc_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal with an HONEST in-corpus language
    model (r4): per-document perplexity under an add-1 bigram LM
    trained on the lang='en' slice (Wenzek et al. 2020's selection
    signal, minus the external KenLM this environment can't ship — the
    `doc_ccnet_perplexity_buckets` divergence row documents the proxy
    this replaces for scoring). Training = two hash aggs over the train
    slice; scoring = one equi-join of the corpus bigram stream against
    those counts + a 1-row vocab broadcast. The oracle replays the
    exact smoothing algebra."""
    docs = _t(spark, sf_dir, "documents")
    return text.bigram_lm_perplexity(docs)


@register(
    "doc_dsir_logweights",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_target,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x != '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id, is_target, unnest(
    list_concat(tk,
      list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]))) AS g
  FROM toks
), feats AS (
  SELECT doc_id, is_target,
         CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 256 AS b
  FROM grams
), per_doc AS (
  SELECT doc_id, b, count(*) AS c, bool_or(is_target) AS is_target
  FROM feats GROUP BY 1, 2
), model AS (
  SELECT b, sum(c) AS r,
         sum(CASE WHEN is_target THEN c ELSE 0 END) AS t
  FROM per_doc GROUP BY b
), tot AS (SELECT sum(r) AS r_total, sum(t) AS t_total FROM model),
lr AS (
  SELECT b, ln((t + 1) / (t_total + 256.0))
            - ln((r + 1) / (r_total + 256.0)) AS lr
  FROM model CROSS JOIN tot
)
SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_feats,
       round(sum(d.c * lr.lr), 4) AS dsir_logw
FROM per_doc d JOIN lr USING (b) GROUP BY d.doc_id
""",
)
def doc_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, r4): hashed
    unigram+bigram bucket models for the target slice (lang='en') vs
    the raw corpus, add-one smoothed; per-document log importance
    weight Σ c·(ln p_target − ln p_raw) — the published
    importance-resampling scorer behind quality-targeted pretraining
    selection. One corpus-sized hash agg + two broadcast-class joins
    (256-row model, 1-row totals); the oracle replays the full pipeline
    including the engine-portable md5 bucket hash."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.dsir_logweights(docs)


@register(
    "bpe_encoded_token_counts",
    oracle=r"""
WITH RECURSIVE words0 AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM documents)
  WHERE length(w) > 0 GROUP BY w
), vocab0 AS (
  SELECT list(struct_pack(w := w, freq := freq,
    s := ' ' || array_to_string(
           list_append(list_filter(string_split(w, ''), x -> x != ''), '</w>'),
           '  ') || ' ')) AS vocab
  FROM words0
), steps AS (
  -- the bpe_learned_merges replay, carrying the word through so the
  -- FINAL tokenization joins back to documents
  SELECT 0 AS i, vocab FROM vocab0
  UNION ALL
  SELECT i + 1,
    list_transform(vocab, v -> struct_pack(w := v.w, freq := v.freq,
      s := replace(v.s, ' ' || win.a || '  ' || win.b || ' ',
                        ' ' || win.a || win.b || ' ')))
  FROM (
    SELECT i, vocab,
      (SELECT struct_pack(a := l, b := r)
       FROM (
         SELECT tk[x] AS l, tk[x+1] AS r, sum(freq) AS n
         FROM (SELECT u.freq AS freq,
                      string_split(trim(u.s, ' '), '  ') AS tk
               FROM unnest(vocab) AS t(u)),
              unnest(range(1, len(tk))) AS g(x)
         GROUP BY 1, 2)
       ORDER BY n DESC, l, r LIMIT 1) AS win
    FROM steps WHERE i < 10
  )
), wtoks AS (
  SELECT u.w AS w,
         len(string_split(trim(u.s, ' '), '  ')) AS n_toks
  FROM (SELECT vocab FROM steps WHERE i = 10), unnest(vocab) AS t(u)
), docwords AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '\s+')) AS w
    FROM documents)
  WHERE length(w) > 0
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wt.n_toks) AS BIGINT) AS n_tokens
FROM docwords d JOIN wtoks wt USING (w)
GROUP BY d.doc_id
""",
)
def bpe_encoded_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE end to end (r4 — the trainer's dual): train 10 merges
    on the corpus, apply them with the same pure-Column fold, and count
    per-document (words, tokens) — sequence-length accounting for
    packing. The oracle replays training via the bpe_learned_merges
    recursive CTE (carrying each word through the merge steps) and
    joins the final per-word token counts back to the exploded corpus,
    so ONE hash checks the argmax loop, the greedy merge application,
    and the join-back accounting together. Scale: the fold runs on the
    distinct-word vocab only; the join back is broadcast-class."""
    docs = _t(spark, sf_dir, "documents")
    return text.bpe_token_counts(docs, 10)


@register(
    "heavy_hitters_topk",
    oracle="""
WITH c AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, user_id, n,
         row_number() OVER (
           PARTITION BY event_type ORDER BY n DESC, user_id) AS rank
  FROM c
)
SELECT event_type, user_id, n, rank FROM ranked WHERE rank <= 5
""",
)
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group heavy hitters: top-5 users by event count per
    event_type — the batch ground truth the streaming space-saving
    summary (`streaming.stateful.streaming_space_saving`, k-slot bounded
    state, Metwally 2005) is guarantee-tested against. One hash
    aggregation shrinks events to (type, user) counts; the rank window
    runs over that already-aggregated set (types × active users), never
    the raw stream."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("user_id").asc()
    )
    return counts.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= 5
    )


@register(
    "events_cdc_latest",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type AS last_op,
       round(value, 4) AS last_value, ts AS last_ts
FROM ranked WHERE rn = 1 AND event_type <> 'error'
""",
)
def events_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-state compaction (`store.apply_cdc_latest`): the events
    stream read as a change log — key = user_id, version = (ts,
    event_id), 'error' acting as the delete op — folded to current state
    in ONE lexicographic-struct-max hash aggregation (no window sort, no
    self-join; the same non-invertible-aggregate trick as sliding
    last_over_time). The oracle replays it as the classic row_number
    window — same answer, but the
    window shuffles every change where the partial combine ships one
    candidate per partition-key."""
    ev = _t(spark, sf_dir, "events")
    state = store.apply_cdc_latest(
        ev.select("user_id", "ts", "event_id", "event_type", "value"),
        ["user_id"],
        ["ts", "event_id"],
        op_col="event_type",
        delete_op="error",
    )
    return state.select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.round("value", 4).alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


@register(
    "events_rollup_cube",
    oracle="""
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(CAST(CAST(ts AS DATE) AS VARCHAR), '(all)') AS day,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY CUBE (event_type, CAST(ts AS DATE))
""",
)
def events_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP cube rollup: all four granularities of the (event_type, day)
    report — per cell, per type, per day, grand total — from ONE pass.
    Spark plans ``cube()`` as Expand (4 grouping-set replicas, map-side)
    feeding a single partial-aggregated HashAggregate: one shuffle carries
    all granularities, where naive per-granularity queries would scan and
    shuffle four times. Rollup cells are projected to the '(all)'
    sentinel rather than left NULL — a NULL DATE fetched through pandas
    canonicalizes as NaT and would break the driver's value hash
    (canon-safety checklist, README)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    return (
        ev.cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce(F.date_format("day", "yyyy-MM-dd"), F.lit("(all)")).alias(
                "day"
            ),
            "n_events",
            "sum_value",
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the semi-join-on-a-big-agg
    shape — aggregate lineitem by orderkey, filter on the grouped sum,
    then LEFT SEMI join the order stream against the survivors before the
    (small) customer dim join. The semi join keeps only orderkeys in the
    shuffle; the customer join is broadcast-class. No window, no sort —
    all three joins are equi-joins on their natural keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "tpch_q4_late_orders",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
)
def tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking, adapted to the fixture's
    columns: "late" = any lineitem shipping > 30 days after the order
    date): an EXISTS correlated subquery expressed as a LEFT SEMI join
    whose condition carries both the equi-key and the date comparison —
    Spark plans the equi-part as the join key and the inequality as a
    post-join filter, so lineitem never fans out order rows and only
    (orderkey, shipdate) rides the shuffle. The date window on orders is
    a pushed scan filter."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(datetime(1996, 1, 1)))
        & (F.col("o_orderdate") < F.lit(datetime(1997, 1, 1)))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 30)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4)
         AS promo_revenue_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): ratio of two conditional sums over a
    fact⋈dim join — part is broadcast, so the month of lineitem streams
    through one stage: pushed shipdate scan filter → broadcast hash join
    → single global aggregate computing both sums at once. The division
    happens on the 1-row aggregate, never per row."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(datetime(1996, 9, 1)))
        & (F.col("l_shipdate") < F.lit(datetime(1996, 10, 1)))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )






# --- main-content extraction (r6) -------------------------------------------

_MC_BLOCK_RE = (
    "(?i)</?(?:p|div|section|article|main|body|html|h[1-6]|li|ul|ol"
    "|table|tr|td|nav|footer|header|aside|br)[^>]*>"
)
# the per-block text/link-length algebra as DuckDB lambdas (same
# regexes as functions/text.html_main_content; RE2 vs java.util.regex)
_MC_TEXT = (
    "trim(regexp_replace(regexp_replace({x}, '(?is)<[^>]*>', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


@register(
    "doc_main_content",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
    '<html><body><nav><a href="/">Home</a> <a href="/a">Archive</a> <a href="/c">Contact</a></nav>'
    || '<div>' || text || '</div><p>tiny</p>'
    || '<div>Appendix block long enough to keep, citing <a href="/r">one reference</a> within prose that stays link-sparse overall.</div>'
    || '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer></body></html>' AS html
  FROM documents
), b AS (
  SELECT doc_id,
    string_split(regexp_replace(html, '{_MC_BLOCK_RE}', chr(1), 'g'), chr(1)) AS blocks
  FROM p
), s AS (
  SELECT doc_id, blocks,
    list_filter(
      list_transform(blocks, x -> struct_pack(
        t := {_MC_TEXT.format(x='x')},
        l := coalesce(list_sum(list_transform(
               regexp_extract_all(x, '(?is)<a\\b[^>]*>(.*?)</a>', 1),
               y -> length({_MC_TEXT.format(x='y')}))), 0)
      )),
      e -> length(e.t) >= 20 AND e.l * 100 <= length(e.t) * 50
    ) AS kept
  FROM b
)
SELECT doc_id,
  array_to_string(list_transform(kept, e -> e.t), chr(10)) AS main_text,
  CAST(len(kept) AS INT) AS n_blocks_kept,
  CAST(len(blocks) AS INT) AS n_blocks_total
FROM s
""",
)
def doc_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 text curation, main-content extraction (r6): boilerplate
    removal by the published block/link-density heuristic (jusText,
    Kohlschütter et al.) — segment at block tags, keep blocks ≥ 20
    visible chars with anchor-text share ≤ 50 % (integer-percent
    compare, zero float hazard); nav/footer link farms drop, body
    prose survives. The fixture wraps each document's REAL text in a
    nav/tiny/appendix/footer scaffold; the oracle replays the whole
    block algebra with DuckDB lambdas over the same regexes — the RE2
    vs java.util.regex dual, this time over higher-order list ops.
    Plan: pure Column (one regexp split + filter/transform/aggregate
    HOFs), zero Python, zero shuffle. See functions/text.py."""
    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><body><nav><a href="/">Home</a> <a href="/a">Archive</a>'
                  ' <a href="/c">Contact</a></nav><div>'),
            F.col("text"),
            F.lit('</div><p>tiny</p><div>Appendix block long enough to keep,'
                  ' citing <a href="/r">one reference</a> within prose that'
                  ' stays link-sparse overall.</div><footer><a href="/t">Terms'
                  '</a> <a href="/p">Privacy</a></footer></body></html>'),
        ).alias("html"),
    )
    return text.html_main_content(pages)
