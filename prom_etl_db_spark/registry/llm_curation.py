"""SURVEY.md §2.E — deterministic sampling/splits, curation pipeline,
near-dup clusters, packing, tf-idf/BM25, as-of/interval joins,
sketches, data-quality expectations, parsed-PromQL forms, TPC-H rows.
Contiguous split of the former llm_e.py (round 6, pure mechanics —
registration order unchanged)."""

from __future__ import annotations

from datetime import datetime, timedelta  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from prom_etl_db_spark import store  # noqa: F401
from prom_etl_db_spark.functions import (  # noqa: F401
    clustering,
    decontam,
    dedup,
    multimodal,
    packing,
    sampling,
    similarity,
    text,
)
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
from prom_etl_db_spark.registry.llm_e import (  # shared oracle CTEs
    _NGRAM_MAX_DF,
    _NGRAM_PAIRS_CTES,
)
from prom_etl_db_spark.registry.llm_promql import (  # shared histogram helper
    _cumulative_le_buckets,
)


# -- deterministic sampling / splits (training-data pipeline, §2.E) --------


@register(
    "doc_hash_split_counts",
    oracle="""
SELECT CASE
         WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8) < 'cccccccc'
           THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8) < 'e6666666'
           THEN 'val'
         ELSE 'test'
       END AS split,
       count(*) AS cnt
FROM documents GROUP BY 1
""",
)
def doc_hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by content hash — a pure projection
    (no RNG, no shuffle): every doc keeps its split across re-runs,
    repartitioning, and incremental appends. The oracle re-derives the
    assignment from the same md5-hex comparison."""
    docs = _t(spark, sf_dir, "documents")
    split = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split"
    )
    return split.groupBy("split").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "doc_stratified_sample",
    oracle="""
SELECT lang, count(*) AS cnt
FROM documents
WHERE (lang = 'en'
       AND substr(md5(CAST(doc_id AS VARCHAR) || 'sample'), 1, 8) < '40000000')
   OR lang IN ('fr', 'es', 'zh', 'de')
GROUP BY lang
""",
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language rebalancing: keep 25% of English, all of everything else —
    one deterministic codegen'd filter (pushes into the scan), counted per
    stratum."""
    docs = _t(spark, sf_dir, "documents")
    sampled = sampling.stratified_sample(
        docs,
        "doc_id",
        {"en": 0.25, "fr": 1.0, "es": 1.0, "zh": 1.0, "de": 1.0},
        strata="lang",
        salt="sample",
    )
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "corpus_mix_by_lang",
    oracle="""
WITH wt(lang, w) AS (VALUES ('en', 0.4), ('de', 0.2), ('es', 0.2), ('fr', 0.1), ('zh', 0.1)),
n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
t AS (SELECT min(n.n / wt.w) AS total FROM n JOIN wt ON wt.lang = n.lang),
thr AS (
  SELECT n.lang,
         CASE WHEN n.n / wt.w = t.total THEN 'g'
              WHEN least(1.0, (wt.w * t.total) / n.n) >= 1.0 THEN 'g'
              ELSE printf('%08x', CAST(floor(least(1.0, (wt.w * t.total) / n.n) * 4294967296) AS BIGINT))
         END AS thr
  FROM n JOIN wt ON wt.lang = n.lang CROSS JOIN t
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr ON thr.lang = d.lang
WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix'), 1, 8) < thr.thr
""",
)
def corpus_mix_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data mixing: downsample each language so the output
    matches target weights (en .4 / de .2 / es .2 / fr .1 / zh .1),
    keeping the max feasible total — the binding stratum survives whole.
    The oracle recomputes T = min(n/w) and the per-stratum md5 thresholds
    with the identical IEEE association, so the hash check covers the
    float math as well as the membership."""
    docs = _t(spark, sf_dir, "documents")
    mixed = sampling.mix_by_column(
        docs,
        "lang",
        {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1},
        key="doc_id",
        salt="mix",
    )
    return mixed.select("doc_id", "lang")


@register(
    "doc_deterministic_topn",
    oracle="""
SELECT doc_id, lang
FROM documents
ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'topn'), 1, 8), doc_id
LIMIT 20
""",
)
def doc_deterministic_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample: the 20 smallest hash positions —
    reservoir semantics without sequential state; TakeOrderedAndProject,
    never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.deterministic_topn(docs, "doc_id", 20).select("doc_id", "lang")


@register(
    "doc_cap_per_source",
    oracle="""
SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'cap'), 1, 8), doc_id
         ) AS rn
  FROM documents)
WHERE rn <= 10
""",
)
def doc_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-ext: per-source caps (RefinedWeb-style domain caps) - at most 10
    docs per source, survivors a stable hash-uniform sample. One shuffle
    on source + a counter-per-group window."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.cap_per_key(docs, "source", 10).select(
        "doc_id", "source", "lang"
    )


@register(
    "doc_weighted_sample",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         round(
           ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'wsample'), 1, 13)) AS BIGINT) + 1)
              / CAST(16::HUGEINT ** 13 + 1 AS DOUBLE))
           / n_chars, 10) AS sample_score
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang, n_chars, sample_score
FROM scored
ORDER BY sample_score DESC, doc_id ASC
LIMIT 50
""",
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling without replacement (Efraimidis-Spirakis):
    inclusion probability proportional to document length (stand-in for
    any quality/recency weight), deterministic via the hash-u draw. The
    score is a pure projection; top-n is TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.weighted_sample(docs, "doc_id", F.col("n_chars"), 50)
    return out.select("doc_id", "lang", "n_chars", "sample_score")


_PIPE_WEIGHTS = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1}


@register(
    "curation_pipeline",
    oracle=r"""
WITH q AS (
  SELECT doc_id, text, lang, n_chars
  FROM documents
  WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 20
    AND round((length(text) - length(regexp_replace(text, '[^\p{L}\p{N}_\s]', '', 'g')))
              / greatest(length(text), 1), 6) <= 0.2
), ded AS (
  SELECT doc_id, text, lang, n_chars
  FROM q
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
), sh_ev AS (
  SELECT DISTINCT unnest(
    CASE WHEN len(w) >= 5
         THEN list_distinct([array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)])
         ELSE [] END) AS gram
  FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        FROM documents WHERE doc_id % 20 = 0)
), tr AS (
  SELECT *, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM ded WHERE doc_id % 20 <> 0
), contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, unnest(
          CASE WHEN len(w) >= 5
               THEN list_distinct([array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)])
               ELSE [] END) AS gram
        FROM tr) t
  JOIN sh_ev ON t.gram = sh_ev.gram
), clean AS (
  SELECT doc_id, lang, n_chars FROM tr
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
), wt(lang, wgt) AS (VALUES ('en', 0.4), ('de', 0.2), ('es', 0.2), ('fr', 0.1), ('zh', 0.1)),
n AS (SELECT lang, count(*) AS n FROM clean GROUP BY lang),
t AS (SELECT min(n.n / wt.wgt) AS total FROM n JOIN wt ON wt.lang = n.lang),
thr AS (
  -- the n/w = total identity branch mirrors mix_by_column's keep-whole
  -- test for the BINDING stratum: IEEE (w*(n/w))/n can land 1 ulp below
  -- 1.0, and without the branch the oracle would drop a doc whose md5
  -- position is exactly the truncated threshold while the engine keeps
  -- the stratum whole
  SELECT n.lang,
         CASE WHEN n.n / wt.wgt = t.total THEN 'g'
              WHEN least(1.0, (wt.wgt * t.total) / n.n) >= 1.0 THEN 'g'
              ELSE printf('%08x', CAST(floor(least(1.0, (wt.wgt * t.total) / n.n) * 4294967296) AS BIGINT))
         END AS thr
  FROM n JOIN wt ON wt.lang = n.lang CROSS JOIN t
), mixed AS (
  SELECT c.doc_id, c.lang, c.n_chars
  FROM clean c JOIN thr ON thr.lang = c.lang
  WHERE substr(md5(CAST(c.doc_id AS VARCHAR) || 'pipe-mix'), 1, 8) < thr.thr
), split AS (
  SELECT doc_id, lang, n_chars,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'pipe-split'), 1, 8) < 'e6666666' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'pipe-split'), 1, 8) < 'f3333333' THEN 'val'
              ELSE 'test' END AS split
  FROM mixed
)
SELECT split, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM split GROUP BY split, lang
""",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The E-family FLAGSHIP: the full corpus-curation pipeline as ONE
    composed plan — quality filter -> exact content dedup -> benchmark
    decontamination -> language mixing -> train/val/test split -> per-
    (split, lang) accounting. Every stage is the registry operator it
    reuses; the single SQL oracle verifies the COMPOSITION, not just the
    parts (stage-boundary bugs like filter-after-dedup vs before show up
    only here).

    Scale: quality filter is a codegen'd projection at the scan; dedup
    one min_by agg on md5(text) (SortAggregate pair - string min_by has
    an immutable buffer); decontam a broadcast anti-join; mix/split pure
    hash predicates. The dedup subtree evaluates twice (both sides of
    the anti-join derive from it with different pruning); persist() it
    at deployment - the registry keeps the pure DAG the oracle mirrors."""
    docs = _t(spark, sf_dir, "documents")
    q = text.quality_features(docs).where(
        (F.col("n_tokens") >= 20) & (F.col("punct_ratio") <= 0.2)
    )
    q = q.select("doc_id", "text", "lang", "n_chars").withColumn(
        "__th", F.md5("text")
    )
    ded = dedup.exact_dedup(q, ["__th"], "doc_id")
    train = ded.where(F.col("doc_id") % 20 != 0)
    eval_set = docs.where(F.col("doc_id") % 20 == 0)
    clean = decontam.decontaminate(train, eval_set, n=5)
    mixed = sampling.mix_by_column(
        clean, "lang", _PIPE_WEIGHTS, key="doc_id", salt="pipe-mix"
    )
    split = sampling.hash_split(
        mixed, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="pipe-split"
    )
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@register(
    "neardup_clusters",
    oracle=f"""
WITH RECURSIVE {_NGRAM_PAIRS_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges GROUP BY src
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY id
""",
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the exact 3-gram
    Jaccard pair graph — every paired doc labeled with its cluster's min
    doc_id (min-label propagation; the oracle proves the fixpoint via a
    recursive transitive-closure CTE)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_dup_pairs(docs, threshold=0.3, max_shingle_df=_NGRAM_MAX_DF)
    out = dedup.connected_components(pairs)
    return out.select(F.col("id").alias("doc_id"), "cluster_id")


@register(
    "neardup_keep_canonical",
    oracle=f"""
WITH RECURSIVE {_NGRAM_PAIRS_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges GROUP BY src
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
clusters AS (SELECT id, min(comp) AS cluster_id FROM reach GROUP BY id)
SELECT d.lang, count(*) AS kept
FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id
WHERE c.cluster_id IS NULL OR c.cluster_id = d.doc_id
GROUP BY d.lang
""",
)
def neardup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup DECISION: keep each near-dup cluster's min-id
    member plus all unpaired docs, counted per language. The cluster
    assignment broadcasts; the corpus never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_dup_pairs(docs, threshold=0.3, max_shingle_df=_NGRAM_MAX_DF)
    kept = dedup.keep_canonical(docs, pairs)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("kept"))


@register(
    "doc_sequence_packing",
    oracle=r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS tok,
         substr(md5(CAST(doc_id AS VARCHAR) || 'pack'), 1, 8) AS pos
  FROM documents
), s AS (
  SELECT doc_id, substr(pos, 1, 1) AS pack_bucket,
         CAST(coalesce(sum(tok) OVER (
           PARTITION BY substr(pos, 1, 1) ORDER BY pos, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
  FROM d
)
SELECT doc_id, pack_bucket,
       CAST(floor(start / 512.0) AS BIGINT) AS pack_id,
       start % 512 AS pack_offset
FROM s
""",
)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 512-token windows across 16
    hash-bucketed streams — deterministic training-export layout; the
    running-sum window runs per bucket, so parallelism = buckets and
    there is no global sort."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.pack_documents(docs, 512)
    return out.select("doc_id", "pack_bucket", "pack_id", "pack_offset")


@register(
    "text_bpe_token_counts",
    oracle=r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS ws_tokens,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_extract_all(text,
              '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
       END AS bpe_tokens
FROM documents
""",
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts under both tokenizations: whitespace and the
    GPT-2-style pre-tokenizer split (the budgeting unit for packing) —
    both pure JVM regex, validated piece-for-piece against RE2."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("ws_tokens"),
        text.bpe_like_token_count(F.col("text")).alias("bpe_tokens"),
    )


@register(
    "tfidf_top_terms",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS dl,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, score, rank FROM ranked WHERE rank <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/ranking: top-3 characteristic terms per document by tf·idf —
    keyword extraction / topic proxy over the corpus. Two hash aggs +
    one term join + a per-doc window; no global sort."""
    docs = _t(spark, sf_dir, "documents")
    out = text.tfidf_topk_terms(docs, 3)
    return out.select("doc_id", "term", "tf", "df", "score", "rank")


@register(
    "bm25_query_scores",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS dl,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM tok WHERE term IN ('spark', 'query', 'stream') GROUP BY 1, 2, 3
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT count(*) AS n,
         avg(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\s+')) END) AS avgdl
  FROM documents
)
SELECT tf.doc_id,
       round(sum(
         ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
         * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl))
       ), 6) AS score
FROM tf JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY tf.doc_id
""",
)
def bm25_query_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/ranking: Okapi BM25 of every document against a fixed query-term
    set. The isin filter lands before the first shuffle; the df side is
    ≤|Q| rows and broadcast."""
    docs = _t(spark, sf_dir, "documents")
    return text.bm25_scores(docs, ["spark", "query", "stream"])


# -- time-series joins (as-of, interval) -----------------------------------


@register(
    "asof_click_before_purchase",
    oracle="""
SELECT p.event_id, p.user_id, p.value AS purchase_value, c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value
                FROM events WHERE event_type = 'click'
                GROUP BY user_id, ts) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks the user's most recent click value
    at purchase time (left-outer; inclusive). Union + per-user ordered
    window — never an inequality BroadcastNestedLoop. The oracle is
    DuckDB's native ASOF LEFT JOIN.

    Both sides pre-dedup clicks to (user_id, ts, max value): every
    engine's as-of (Spark's window-carry here, DuckDB's ASOF there)
    picks ARBITRARILY among right rows tied on timestamp, so the
    deterministic-output convention needs at most one right row per
    (by, ts) — one map-side-combinable hash agg."""
    from prom_etl_db_spark.operators import joins

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = joins.asof_join(purchases, clicks, on="ts", by=["user_id"])
    return out.select("event_id", "user_id", "purchase_value", "click_value")


@register(
    "interval_click_attribution",
    oracle="""
WITH s AS (
  SELECT event_id AS signup_id, user_id, ts AS s_start,
         ts + INTERVAL 3 DAY AS s_end
  FROM events WHERE event_type = 'signup'
), c AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
)
SELECT s.signup_id, count(*) AS n_clicks,
       round(sum(c.value), 4) AS click_value_sum
FROM s JOIN c ON c.user_id = s.user_id
             AND c.ts >= s.s_start AND c.ts < s.s_end
GROUP BY s.signup_id
""",
)
def interval_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: clicks attributed to the 3-day window after
    each signup by the same user, then counted per signup. Intervals
    replicate onto day chunks and the containment predicate filters after
    an equi-join — no nested-loop join at any size."""
    from prom_etl_db_spark.operators import joins

    ev = _events(spark, sf_dir)
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = joins.interval_join(
        clicks, signups, point_ts="ts", by=["user_id"], chunk_seconds=86_400
    )
    return pairs.groupBy("signup_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum("value"), 4).alias("click_value_sum"),
    )


@register("cardinality_sketches")  # no SQL oracle: sketch internals are
# engine-specific (HLL++/GK); unit tests bound the error vs exact instead
def cardinality_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-based scale path: HLL++ distinct-user cardinality and
    GK approximate quantiles per metric — what A33 discovery and
    quantile_by switch to when per-group exact state stops fitting
    (both are mergeable fixed-size sketches: map-side partial combine,
    one tiny shuffle, no sort)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.percentile_approx("value", 0.9, 1000).alias("approx_q90"),
        )
        .orderBy("event_type")
    )


from prom_etl_db_spark.functions import sketches as _sketches  # noqa: E402


@register(
    "hll_cardinality",
    oracle=_sketches.hll_oracle_sql("events", "event_type", "user_id", p=12),
)
def hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic HyperLogLog per event_type over an md5-derived hash —
    the ORACLE-CHECKED twin of `cardinality_sketches`: every register
    (index, rank, harmonic sum) and the bias-corrected estimate are
    recomputed by the DuckDB dual, upgrading sketching from a rows-only
    check to a value-hash match. Integer rank algebra (no float log2)
    and exact dyadic harmonic sums make the match deterministic; see
    functions/sketches.py for the scale/mergeability story."""
    ev = _events(spark, sf_dir)
    return _sketches.hll_cardinality(ev, "event_type", "user_id", p=12)


@register(
    "quantile_histogram_sketch",
    oracle=_sketches.quantile_histogram_oracle_sql(
        "events", "event_type", "value", q=0.9, bins=128, lo=0.0, hi=500.0
    ),
)
def quantile_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram q90 per event_type — the oracle-checked twin
    of `cardinality_sketches`' GK `percentile_approx`: fixed 128-bucket
    count vectors (mergeable by addition, map-side combinable) with an
    interpolated read-off the DuckDB dual replays exactly. Estimate is
    within one bucket width of the true quantile by construction; the
    unit tests assert that bound against the exact percentile."""
    ev = _events(spark, sf_dir)
    return _sketches.quantile_histogram(
        ev, "event_type", "value", q=0.9, bins=128, lo=0.0, hi=500.0
    )


@register(
    "countmin_user_counts",
    oracle=_sketches.countmin_oracle_sql(
        "events", "user_id", "SELECT DISTINCT user_id FROM events",
        depth=4, width=1024,
    ),
)
def countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch per-user event-count estimates, probed for every
    distinct user — the heavy-hitters member of the sketch family
    (depth 4 × width 1024 counters, merge-by-addition). Pure integer
    md5 arithmetic, so the DuckDB dual replays cells and minima exactly;
    the unit tests pin the one-sided overestimate property and the
    ε·N error bound."""
    ev = _events(spark, sf_dir)
    probes = ev.select("user_id").distinct()
    return _sketches.countmin_estimates(
        ev, "user_id", probes, depth=4, width=1024
    )


@register(
    "bloom_purchaser_membership",
    oracle=_sketches.bloom_oracle_sql(
        "SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'",
        "SELECT DISTINCT user_id FROM events",
        "user_id",
        n_bits=16384,
        n_hashes=5,
    ),
)
def bloom_purchaser_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership: every distinct user probed against the
    filter built over purchase-event users. No false negatives by
    construction; the (deterministic md5) false-positive set itself
    hash-matches the DuckDB dual — the pre-filter a 100 TB decontam
    or join-pruning pass would broadcast instead of the full key set."""
    ev = _events(spark, sf_dir)
    members = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    probes = ev.select("user_id").distinct()
    return _sketches.bloom_membership(
        members, probes, "user_id", n_bits=16384, n_hashes=5
    )


from prom_etl_db_spark.functions import quality as _quality  # noqa: E402


@register(
    "dq_events_expectations",
    oracle="""
SELECT 'value_null' AS check, count(*) FILTER (WHERE value IS NULL) AS n_violations,
       count(*) AS n_total, count(*) FILTER (WHERE value IS NULL) = 0 AS pass
FROM events
UNION ALL
SELECT 'value_nan', count(*) FILTER (WHERE isnan(value)), count(*),
       count(*) FILTER (WHERE isnan(value)) = 0 FROM events
UNION ALL
SELECT 'value_out_of_range', count(*) FILTER (WHERE value < 0 OR value > 1000),
       count(*), count(*) FILTER (WHERE value < 0 OR value > 1000) = 0 FROM events
UNION ALL
SELECT 'ts_out_of_window',
       count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-01'
                           OR ts >= TIMESTAMP '2024-02-01'),
       count(*),
       count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-01'
                           OR ts >= TIMESTAMP '2024-02-01') = 0 FROM events
UNION ALL
SELECT 'user_id_negative', count(*) FILTER (WHERE user_id < 0), count(*),
       count(*) FILTER (WHERE user_id < 0) = 0 FROM events
UNION ALL
SELECT 'event_id_unique', count(*) - count(DISTINCT event_id), count(*),
       count(*) - count(DISTINCT event_id) = 0 FROM events
""",
)
def dq_events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over the ingest table — the
    semantic validation layer the reference's blind-insert collector
    lacks (its only defense is MySQL rejecting NaN; SURVEY §2 A12 covers
    malformed SHAPES, this covers bad VALUES). All row-level rules run
    in ONE aggregation pass; the uniqueness rule is one hash agg."""
    ev = _events(spark, sf_dir)
    from datetime import datetime as _dt

    return _quality.expectations(
        ev,
        [
            ("value_null", F.col("value").isNull()),
            ("value_nan", F.isnan("value")),
            ("value_out_of_range", (F.col("value") < 0) | (F.col("value") > 1000)),
            (
                "ts_out_of_window",
                (F.col("ts") < F.lit(_dt(2024, 1, 1)))
                | (F.col("ts") >= F.lit(_dt(2024, 2, 1))),
            ),
            ("user_id_negative", F.col("user_id") < 0),
        ],
        unique_keys=[("event_id_unique", ["event_id"])],
    )


@register(
    "events_value_psi",
    oracle=_quality.psi_oracle_sql(
        "events", "event_type", "value",
        "ts < TIMESTAMP '2024-01-16'",
        bins=20, lo=0.0, hi=500.0,
    ),
)
def events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift gate: population stability index of the value
    distribution per event_type, first half of January (reference slice)
    vs second half (comparison). Fixed equi-width bins + add-half
    smoothing keep it deterministic and SQL-replayable; ≈0 here because
    the fixture is stationary — the unit tests plant a real shift and
    assert PSI > 0.25 catches it."""
    from datetime import datetime as _dt

    ev = _events(spark, sf_dir)
    return _quality.psi_drift(
        ev, "event_type", "value",
        F.col("ts") < F.lit(_dt(2024, 1, 16)),
        bins=20, lo=0.0, hi=500.0,
    )


# -- PromQL string evaluation (parser → combinators) -----------------------


@register(
    "promql_parsed_flagship",
    oracle="""
WITH resampled AS (
  SELECT k, bucket, value FROM (
    SELECT json_extract_string(props, '$.k') AS k, user_id,
           date_trunc('minute', ts) AS bucket, value,
           row_number() OVER (
             PARTITION BY json_extract_string(props, '$.k'), user_id,
                          date_trunc('minute', ts)
             ORDER BY ts DESC, value DESC) AS rn
    FROM events
    WHERE event_type = 'purchase'
      AND ts >= TIMESTAMP '2024-01-30 00:00:00'
      AND ts < TIMESTAMP '2024-01-31 00:00:00'
  ) WHERE rn = 1
), flagged AS (
  SELECT k, bucket, CASE WHEN value != 20.0 THEN 1.0 ELSE 0.0 END AS v
  FROM resampled
), stepmax AS (
  SELECT k, bucket, max(v) AS v FROM flagged GROUP BY k, bucket
), sot AS (
  SELECT k, sum(v) AS v FROM stepmax GROUP BY k
)
SELECT k, round(v * 60 / 3600, 6) AS value FROM sot
""",
)
def promql_parsed_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship QUERY STRING (migrate.sql:105 shape),
    parsed and evaluated end-to-end: subquery in stream mode (per-series
    last-per-step, then bool flag, then max without, then sum_over_time,
    regroup, scalar arithmetic). Same operator spine as
    flagship_gpu_utilization but entered as PromQL text."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    out = eval_promql(
        _event_samples(spark, sf_dir, keys=("k", "user_id")),
        'sum(sum_over_time(max without(user_id)(purchase != bool 20)[24h:1m]))'
        " by (k) * 60 / 3600",
        NOW,
    )
    return out.select(
        F.element_at("labels", "k").alias("k"),
        F.round("value", 6).alias("value"),
    )


@register(
    "promql_parsed_selector_agg",
    oracle="""
WITH resampled AS (
  SELECT k, bucket, value FROM (
    SELECT json_extract_string(props, '$.k') AS k,
           date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (
             PARTITION BY json_extract_string(props, '$.k'),
                          date_trunc('hour', ts)
             ORDER BY ts DESC, value DESC) AS rn
    FROM events
    WHERE event_type = 'click'
      AND json_extract_string(props, '$.k') NOT LIKE '1%'
      AND ts >= TIMESTAMP '2023-12-31 00:00:00'
      AND ts < TIMESTAMP '2024-01-31 00:00:00'
  ) WHERE rn = 1
)
SELECT k, round(sum(value), 4) AS value FROM resampled GROUP BY k
""",
)
def promql_parsed_selector_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parsed regex-matcher selector through an hourly subquery grid:
    ``sum by (k) (sum_over_time(click{k!~"1.*"}[31d:1h]))`` — the
    matcher's anchored regex drops every k starting with 1, the step grid
    takes each hour's last sample per series."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    out = eval_promql(
        _event_samples(spark, sf_dir, keys=("k",)),
        'sum(sum_over_time(click{k!~"1.*"}[31d:1h])) by (k)',
        NOW,
    )
    return out.select(
        F.element_at("labels", "k").alias("k"),
        F.round("value", 4).alias("value"),
    )


@register(
    "promql_parsed_scalar_share",
    oracle="""
WITH resampled AS (
  SELECT k, bucket, value FROM (
    SELECT json_extract_string(props, '$.k') AS k,
           date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (
             PARTITION BY json_extract_string(props, '$.k'),
                          date_trunc('hour', ts)
             ORDER BY ts DESC, value DESC) AS rn
    FROM events
    WHERE event_type = 'click'
      AND ts >= TIMESTAMP '2023-12-31 00:00:00'
      AND ts < TIMESTAMP '2024-01-31 00:00:00'
  ) WHERE rn = 1
), per_k AS (
  SELECT k, sum(value) AS s FROM resampled GROUP BY k
)
SELECT k, round(100.0 * s / (SELECT sum(s) FROM per_k), 6) AS pct_of_total
FROM per_k
""",
)
def promql_parsed_scalar_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total via the parser's LAZY ``scalar()``: every per-k sum
    divided by the global sum —
    ``100 * sum by (k)(sum_over_time(click[31d:1h]))
    / scalar(sum(sum_over_time(click[31d:1h])))``.
    The scalar is a 1-row aggregate frame broadcast onto the vector (a
    BroadcastNestedLoopJoin of one row), NEVER a driver collect — the
    shape Prometheus users write for normalization, expressed as a plan
    Catalyst can see end to end."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    out = eval_promql(
        _event_samples(spark, sf_dir, keys=("k",)),
        "100 * sum by (k) (sum_over_time(click[31d:1h]))"
        " / scalar(sum(sum_over_time(click[31d:1h])))",
        NOW,
    )
    return out.select(
        F.element_at("labels", "k").alias("k"),
        F.round("value", 6).alias("pct_of_total"),
    )


@register(
    "promql_first_last_ts",
    oracle="""
WITH resampled AS (
  SELECT k, bucket, value FROM (
    SELECT json_extract_string(props, '$.k') AS k,
           date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (
             PARTITION BY json_extract_string(props, '$.k'),
                          date_trunc('hour', ts)
             ORDER BY ts DESC, value DESC) AS rn
    FROM events
    WHERE event_type = 'purchase'
      AND ts >= TIMESTAMP '2023-12-31 00:00:00'
      AND ts < TIMESTAMP '2024-01-31 00:00:00'
  ) WHERE rn = 1
), b AS (
  SELECT k, min(bucket) AS first_b, max(bucket) AS last_b
  FROM resampled GROUP BY k
)
SELECT b.k,
       CAST(epoch(b.first_b) AS DOUBLE) AS ts_first,
       CAST(epoch(b.last_b) AS DOUBLE) AS ts_last,
       round(fv.value, 4) AS first_value
FROM b JOIN resampled fv ON fv.k = b.k AND fv.bucket = b.first_b
""",
)
def promql_first_last_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_over_time / ts_of_first_over_time / ts_of_last_over_time
    (PromQL 3.x experimental family) through the parser, per-k over an
    hourly subquery grid: when each series first and last reported, and
    what the first report was. Each leg is one hash aggregation over the
    shared step grid; the k-keyed join is co-partitioned (one shuffle
    partitioning reused three times). ts_of_first/last need no argmax
    struct — plain min/max on the single-primitive bucket time."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    samples = _event_samples(spark, sf_dir, keys=("k",))
    legs = {
        "ts_first": "ts_of_first_over_time(purchase[31d:1h])",
        "ts_last": "ts_of_last_over_time(purchase[31d:1h])",
        "first_value": "first_over_time(purchase[31d:1h])",
    }
    out = None
    for alias, q in legs.items():
        leg = eval_promql(samples, q, NOW).select(
            F.element_at("labels", "k").alias("k"),
            F.col("value").alias(alias),
        )
        out = leg if out is None else out.join(leg, "k")
    return out.select(
        "k", "ts_first", "ts_last",
        F.round("first_value", 4).alias("first_value"),
    )


@register(
    "promql_parsed_histogram_fraction",
    oracle="""
WITH b AS (
  SELECT event_type AS name, t.le AS le, CAST(count(*) AS DOUBLE) AS cum
  FROM events,
       (SELECT unnest([25.0, 50.0, 100.0, 200.0, CAST('inf' AS DOUBLE)]) AS le) t
  WHERE value <= t.le
  GROUP BY 1, 2
), probes AS (
  SELECT b.name, b.le, b.cum, x.x
  FROM b, (SELECT unnest([50.0, 150.0]) AS x) x
), w AS (
  SELECT name, x, le, cum,
         lag(cum) OVER (PARTITION BY name, x ORDER BY le) AS prev_cum,
         lag(le) OVER (PARTITION BY name, x ORDER BY le) AS prev_le,
         max(cum) OVER (PARTITION BY name, x) AS total
  FROM probes
), c AS (
  SELECT name, x, total,
         CASE WHEN isinf(le) THEN coalesce(prev_cum, 0)
              ELSE coalesce(prev_cum, 0)
                   + (cum - coalesce(prev_cum, 0))
                     * (x - coalesce(prev_le, 0)) / (le - coalesce(prev_le, 0))
         END AS ic
  FROM w
  WHERE coalesce(prev_le, CAST('-inf' AS DOUBLE)) < x AND x <= le
)
SELECT name,
       round((max(CASE WHEN x = 150.0 THEN ic END)
              - max(CASE WHEN x = 50.0 THEN ic END)) / max(total) * pi(), 6)
         AS scaled_frac
FROM c GROUP BY name
""",
)
def promql_parsed_histogram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-3 parser additions exercised FROM TEXT:
    ``histogram_fraction(50, 150, req_bucket) * pi()`` — classic-bucket
    fraction interpolation plus the pi() scalar, parsed and evaluated
    end-to-end over bucket series synthesized from events (each series'
    cumulative count carried as an instant sample)."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    ev = _events(spark, sf_dir)
    samples = _cumulative_le_buckets(ev).select(
        F.lit("req_bucket").alias("metric_name"),
        F.create_map(
            F.lit("name"), F.col("name"),
            F.lit("le"), F.col("le").cast("string"),
        ).alias("labels"),
        "value",
        F.lit(NOW).alias("timestamp"),
    )
    out = eval_promql(
        samples, "histogram_fraction(50, 150, req_bucket) * pi()", NOW
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.round("value", 6).alias("scaled_frac"),
    )


@register(
    "config_executed_range",
    oracle="""
WITH resampled AS (
  SELECT k, bucket, value FROM (
    SELECT json_extract_string(props, '$.k') AS k,
           date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (
             PARTITION BY json_extract_string(props, '$.k'),
                          date_trunc('hour', ts)
             ORDER BY ts DESC, value DESC) AS rn
    FROM events
    WHERE event_type = 'click'
      AND ts >= TIMESTAMP '2024-01-30 00:00:00'
      AND ts <= TIMESTAMP '2024-01-31 00:00:00'
  ) WHERE rn = 1
)
SELECT k, CAST(bucket AS TIMESTAMP) AS timestamp,
       round(value, 4) AS value,
       CAST(bucket AS DATE) AS collected_date
FROM resampled
""",
)
def config_executed_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A reference-shaped config row (PromQL text + T1 time expressions +
    step) executed natively end-to-end: time resolution, range-mode
    stream evaluation, MetricRecord projection with A13 day truncation —
    the full §3.1 lifecycle in dry-run (no write)."""
    from prom_etl_db_spark.config import QueryConfig
    from prom_etl_db_spark.executor import execute_config_query

    cfg = QueryConfig(
        query_id="cfg_range",
        name="hourly click matrix",
        query="sum(click) by (k)",
        time_range_type="range",
        time_range_start="-1d",
        time_range_end="now",
        time_range_step="1h",
    )
    samples = _event_samples(spark, sf_dir, keys=("k",))
    records = execute_config_query(spark, samples, cfg, now=NOW)
    return records.select(
        F.element_at("labels", "k").alias("k"),
        F.col("timestamp"),
        F.round("value", 4).alias("value"),
        F.col("collected_date"),
    )


@register(
    "promql_changes_resets",
    oracle="""
WITH s AS (
  SELECT event_type AS name, json_extract_string(props, '$.k') AS k, value,
         lag(value) OVER (
           PARTITION BY event_type, json_extract_string(props, '$.k')
           ORDER BY ts, event_id) AS prev
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    AND ts <  TIMESTAMP '2024-01-20 00:00:00'
)
SELECT name, k,
       CAST(sum(CASE WHEN prev IS NOT NULL AND value != prev THEN 1 ELSE 0 END)
            AS DOUBLE) AS n_changes,
       CAST(sum(CASE WHEN prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END)
            AS DOUBLE) AS n_resets
FROM s GROUP BY name, k
""",
)
def promql_changes_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """changes(x[10d]) and resets(x[10d]) per series — consecutive-sample
    lag comparisons, one ordered window + one hash aggregation."""
    samples = _event_samples(spark, sf_dir, keys=("name", "k"))
    both = promql.changes_and_resets(
        samples,
        frame_start=datetime(2024, 1, 10),
        frame_end=datetime(2024, 1, 20),
        tiebreakers=["event_id"],
    )
    return both.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        "n_changes",
        "n_resets",
    )


@register(
    "promql_raw_over_time",
    oracle="""
SELECT event_type AS name,
       round(sum(value), 4) AS sot,
       CAST(count(*) AS DOUBLE) AS cot,
       round(max(value), 4) AS mot
FROM events
WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
  AND ts <  TIMESTAMP '2024-01-31 00:00:00'
GROUP BY event_type
""",
)
def promql_raw_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/count/max_over_time over a RAW range vector (``x[6d]``, no
    step) — every raw sample in the frame aggregates, the PromQL
    range-selector form (vs the subquery form's step grid). Evaluated
    from query text end to end."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    samples = _event_samples(spark, sf_dir, keys=("name",))
    at = datetime(2024, 1, 31)

    def run(q, alias):
        # one series per metric here (labels = {name}), so each eval is a
        # 1-row vector — crossJoin composes the three aggregates
        return eval_promql(samples, q, at).select(F.col("value").alias(alias))

    out = None
    for metric in ("click", "signup", "error", "view", "purchase"):
        df = (
            run(f"sum_over_time({metric}[6d])", "sot")
            .crossJoin(run(f"count_over_time({metric}[6d])", "cot"))
            .crossJoin(run(f"max_over_time({metric}[6d])", "mot"))
            .select(
                F.lit(metric).alias("name"),
                F.round("sot", 4).alias("sot"),
                F.col("cot"),
                F.round("mot", 4).alias("mot"),
            )
        )
        out = df if out is None else out.unionByName(df)
    return out


@register(
    "promql_parsed_numeric_escapes",
    oracle="""
SELECT json_extract_string(props, '$.k') AS k,
       CAST(count(*) AS DOUBLE) AS n_samples
FROM events
WHERE event_type = 'click'
  AND regexp_matches(json_extract_string(props, '$.k'), '^(?:1[0-9])$')
  AND ts >= TIMESTAMP '2024-01-25 00:00:00'
  AND ts <  TIMESTAMP '2024-01-31 00:00:00'
GROUP BY 1
""",
)
def promql_parsed_numeric_escapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Go strconv.Unquote escape forms end to end through the string
    parser (r4, ADVICE item 2): the metric name spelled in numeric
    escapes — ``"\\x63\\u006Ci\\143k"`` is hex c, BMP code point l
    (mixed-case hex digits), literal i, octal c, literal k = "click" —
    inside a nameless ``__name__`` matcher, plus a BACKQUOTED RAW
    STRING regex matcher (``k=~`1\\d```, backslash surviving
    unescaped) with Prometheus's full anchoring. A wrong digit base,
    width rule, or raw-string escape pass selects a different series
    set and breaks the count."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    samples = _event_samples(spark, sf_dir, keys=("k",))
    out = eval_promql(
        samples,
        r'sum by (k) (count_over_time('
        '{__name__="\\x63\\u006Ci\\143k", k=~`1\\d`}[6d]))',
        datetime(2024, 1, 31),
    )
    return out.select(
        F.element_at("labels", "k").alias("k"),
        F.col("value").alias("n_samples"),
    )


@register(
    "promql_irate_idelta",
    oracle="""
WITH s AS (
  SELECT event_type AS name, json_extract_string(props, '$.k') AS k,
         value, ts,
         row_number() OVER (
           PARTITION BY event_type, json_extract_string(props, '$.k')
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    AND ts <  TIMESTAMP '2024-01-20 00:00:00'
), p AS (
  SELECT name, k,
         max(CASE WHEN rn = 1 THEN value END) AS v1,
         max(CASE WHEN rn = 2 THEN value END) AS v0,
         max(CASE WHEN rn = 1 THEN epoch(ts) END) AS t1,
         max(CASE WHEN rn = 2 THEN epoch(ts) END) AS t0
  FROM s WHERE rn <= 2 GROUP BY name, k HAVING count(*) = 2
)
SELECT name, k,
       round(v1 - v0, 4) AS idelta,
       round(CASE WHEN v1 >= v0 THEN v1 - v0 ELSE v1 END / (t1 - t0), 6)
         AS irate
FROM p WHERE t1 > t0
""",
)
def promql_irate_idelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """irate/idelta over a 10d frame: each series' LAST TWO samples —
    the instant variants (one ordered window, then max_by/min_by on the
    primitive rank, staying hash-aggregated)."""
    samples = _event_samples(spark, sf_dir, keys=("name", "k"))
    both = promql.idelta_and_irate(
        samples,
        frame_start=datetime(2024, 1, 10),
        frame_end=datetime(2024, 1, 20),
        tiebreakers=["event_id"],
    )
    return both.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.round("idelta", 4).alias("idelta"),
        F.round("irate", 6).alias("irate"),
    )


@register(
    "promql_smoothing",
    oracle="""
WITH RECURSIVE samples AS (
  SELECT event_type AS name, json_extract_string(props, '$.k') AS k,
         value, ts, event_id
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    AND ts <  TIMESTAMP '2024-01-30 00:00:00'
), dedup AS (
  SELECT name, k, value, ts FROM (
    SELECT *, row_number() OVER (
        PARTITION BY name, k, ts ORDER BY event_id DESC) AS rn
    FROM samples) WHERE rn = 1
), idx AS (
  SELECT name, k, value,
         row_number() OVER (PARTITION BY name, k ORDER BY ts) AS i,
         count(*) OVER (PARTITION BY name, k) AS n
  FROM dedup
), rec(name, k, i, n, s, b) AS (
  -- seed AFTER x1: s = x1, b = x2 - x1 (series with <2 points drop out)
  SELECT a.name, a.k, 1, a.n, a.value, nxt.value - a.value
  FROM idx a JOIN idx nxt
    ON nxt.name = a.name AND nxt.k IS NOT DISTINCT FROM a.k AND nxt.i = 2
  WHERE a.i = 1
  UNION ALL
  -- (1 - 0.4) / (1 - 0.2) spelled as subtractions: the IEEE doubles the
  -- Python recurrence computes, NOT the decimal literals 0.6 / 0.8
  SELECT r.name, r.k, r.i + 1, r.n,
         0.4 * x.value + (1 - 0.4) * (r.s + r.b),
         0.2 * ((0.4 * x.value + (1 - 0.4) * (r.s + r.b)) - r.s)
           + (1 - 0.2) * r.b
  FROM rec r JOIN idx x
    ON x.name = r.name AND x.k IS NOT DISTINCT FROM r.k AND x.i = r.i + 1
  WHERE r.i < r.n
)
SELECT name, k, round(s, 4) AS smoothed
FROM rec WHERE i = n
""",
)
def promql_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """double_exponential_smoothing(x[20d], 0.4, 0.2) per (name, k)
    series — the sequential-recurrence custom operator via applyInPandas
    (parallelism = series cardinality). The oracle replays the exact Holt
    recurrence as a recursive CTE (one level per sample, all series
    advancing together), with the smoothing complements spelled as
    (1 − sf)/(1 − tf) so both engines iterate the same IEEE doubles —
    upgraded from a rows-only check."""
    out = promql.double_exponential_smoothing(
        _event_samples(spark, sf_dir, keys=("name", "k")),
        0.4,
        0.2,
        frame_start=datetime(2024, 1, 10),
        frame_end=datetime(2024, 1, 30),
        tiebreakers=["event_id"],
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.round("value", 4).alias("smoothed"),
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: three-way join with selective filters on every
    side, grouped revenue, top-10. The customer dim broadcasts; the
    orders-lineitem join shuffles on the order key; both date predicates
    push into the parquet scans — the plan a 100 TB run needs."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < datetime(1996, 1, 1)
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > datetime(1996, 1, 1)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "doc_classifier_scores",
    oracle=r"""
SELECT doc_id,
       round(coalesce(list_sum(list_transform(
         list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> ''),
         t -> ((CAST(('0x' || substr(md5(t || 'bow'), 1, 8)) AS BIGINT) % 1024) % 7 - 3)
              / 10.0
       )), 0.0), 6) + 0.0 AS bow_score
FROM documents
""",
)
def doc_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 model-scoring shape: fastText-style linear score over the
    hashed bag-of-words (fixed pseudo-weights; trained weights slot in
    via weight_fn). Pure Column fold - scoring rides the scan."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.hashed_bow_score(F.col("text")).alias("bow_score")
    )


@register(
    "doc_chunking",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n
  FROM documents
), starts AS (
  SELECT doc_id, w, n,
         CAST(i.range AS INT) AS chunk_id,
         CAST(i.range * 24 AS INT) AS chunk_start
  FROM t JOIN range(1000) i ON i.range * 24 < n
)
SELECT doc_id, chunk_id, chunk_start,
       CAST(len(w[chunk_start + 1 : chunk_start + 32]) AS INT) AS n_chunk_tokens,
       array_to_string(w[chunk_start + 1 : chunk_start + 32], ' ') AS chunk_text
FROM starts
WHERE chunk_start = 0 OR chunk_start + 8 < n
""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-ext: sliding token-window chunking (32-token chunks, 8-token
    overlap) - the context-window prep before embedding. Tokenize once,
    sequence+posexplode the starts: a narrow expansion, zero shuffles."""
    docs = _t(spark, sf_dir, "documents")
    return text.chunk_documents(docs, 32, overlap_tokens=8)


@register(
    "tpch_q5_local_revenue",
    oracle="""
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def tpch_q5_local_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the six-way star join (region->nation->customer->
    orders->lineitem->supplier) with the local-supplier correlation
    (supplier nation = customer nation) and a one-year date slice.
    region/nation/customer/supplier broadcast in dimension order; the
    only data-proportional shuffle is orders-lineitem on the order key;
    the date range pushes into the orders scan."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= datetime(1995, 1, 1))
        & (F.col("o_orderdate") < datetime(1996, 1, 1))
    )
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )




# --- sequence packing (r6) ---------------------------------------------------

_PACK_CAP = 64


@register(
    "doc_pack_firstfit",
    oracle=rf"""
WITH RECURSIVE d AS (
  SELECT CAST(doc_id % 8 AS BIGINT) AS shard, doc_id,
    CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT shard, rn, doc_id, n_tokens,
    CAST(0 AS BIGINT) AS bin_idx, 0 AS offset_in_bin,
    least(n_tokens, {_PACK_CAP}) AS eff,
    least(n_tokens, {_PACK_CAP}) AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT nd.shard, nd.rn, nd.doc_id, nd.n_tokens,
    CASE WHEN w.fill + least(nd.n_tokens, {_PACK_CAP}) <= {_PACK_CAP}
         THEN w.bin_idx ELSE w.bin_idx + 1 END,
    CASE WHEN w.fill + least(nd.n_tokens, {_PACK_CAP}) <= {_PACK_CAP}
         THEN w.fill ELSE 0 END,
    least(nd.n_tokens, {_PACK_CAP}),
    CASE WHEN w.fill + least(nd.n_tokens, {_PACK_CAP}) <= {_PACK_CAP}
         THEN w.fill + least(nd.n_tokens, {_PACK_CAP})
         ELSE least(nd.n_tokens, {_PACK_CAP}) END
  FROM walk w JOIN d nd ON nd.shard = w.shard AND nd.rn = w.rn + 1
)
SELECT shard, doc_id, n_tokens, bin_idx,
  CAST(offset_in_bin AS INT) AS offset_in_bin,
  CAST(eff AS INT) AS eff_tokens,
  n_tokens > {_PACK_CAP} AS truncated
FROM walk
""",
)
def doc_pack_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 LLM pipeline, FIRST-FIT sequence packing (r6): greedy
    sequential first-fit of WHOLE documents into fixed-64-token
    training bins — the no-document-splitting discipline (T5 packing)
    that complements the existing concat-and-chunk layout
    (`doc_sequence_packing`, which splits documents across windows;
    first-fit never does, trading tail waste for attention-boundary
    hygiene). Capacity 64 sits inside the fixture's
    10–99 token range, so both branches (multi-doc bins AND oversize
    truncation) occur naturally. The recurrence is sequential within a
    shard; Spark runs one applyInPandas packer per shard (shards
    parallelize — the per-worker dataloader shape) and the oracle
    replays the recurrence row-by-row with a recursive CTE (the
    Gorilla/LTTB pattern): every bin id, offset and truncation flag is
    hash-checked. See functions/packing.py."""
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        (F.col("doc_id") % 8).alias("shard"),
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("int").alias("n_tokens"),
    )
    return packing.pack_sequences(sized, capacity=_PACK_CAP)
