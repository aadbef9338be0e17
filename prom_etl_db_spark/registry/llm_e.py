"""SURVEY.md §2.E — LLM-data-pipeline extensions (dedup families,
similarity search, multimodal codecs, text analysis, sampling)."""

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
    sampling,
    similarity,
    text,
)
from prom_etl_db_spark.functions import sketches as _sketches  # noqa: F401
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


# =========================================================================
# E — LLM-data-pipeline extensions
# =========================================================================


@register(
    "dedup_exact",
    oracle="""
SELECT lang, source, min(doc_id) AS doc_id FROM documents GROUP BY lang, source
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: exact dedup on (lang, source) keeping the lowest doc_id —
    deterministic survivor via min_by, single hash aggregation."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.exact_dedup(
        docs.select("doc_id", "lang", "source"), ["lang", "source"], "doc_id"
    )
    return out.select("lang", "source", "doc_id")


# 3-gram Jaccard ≥ 0.3 pairs as a reusable CTE chain (shared by the pair
# query and the cluster/canonical queries built on top of it). The
# hot-shingle df-cap (document frequency > _NGRAM_MAX_DF drops the shingle
# from the join; set sizes stay FULL, so Jaccard only underestimates)
# mirrors dedup.ngram_jaccard_dup_pairs(max_shingle_df=...) exactly — at
# fixture scale no shingle reaches the cap (max df is 25 at sf0.1), so the
# oracle also proves the capped path is result-identical where no bucket
# is hot.
_NGRAM_MAX_DF = 100
_NGRAM_PAIRS_CTES = rf"""
sh AS (
  SELECT doc_id AS id,
         list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS shingles
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents)
  WHERE len(w) >= 3
), tok_all AS (
  SELECT id, unnest(shingles) AS shingle FROM sh
), tok AS (
  SELECT id, shingle FROM tok_all
  QUALIFY count(*) OVER (PARTITION BY shingle) <= {_NGRAM_MAX_DF}
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
), sizes AS (
  SELECT id, len(shingles) AS n_sh FROM sh
), pairs AS (
  SELECT i.id_a, i.id_b,
         CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) AS jaccard
  FROM inter i JOIN sizes sa ON sa.id = i.id_a JOIN sizes sb ON sb.id = i.id_b
  WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) >= 0.3
)"""


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH {_NGRAM_PAIRS_CTES}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM pairs
""",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (exact variant): all document pairs with 3-gram Jaccard ≥ 0.3,
    computed via shingle equi-join (never a crossJoin)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_dup_pairs(docs, threshold=0.3, max_shingle_df=_NGRAM_MAX_DF)


@register("minhash_lsh_pairs")  # no SQL oracle: crc32-minhash isn't DuckDB-expressible
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (scale variant): MinHash+LSH banding candidates verified by exact
    Jaccard. Rows-only driver check; unit tests cross-validate against
    ngram_jaccard_pairs ground truth."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_dup_pairs(
        docs, shingle_n=3, num_hashes=32, bands=16, threshold=0.3
    )


@register(
    "minhash_signatures",
    oracle=r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS shingles
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents)
  WHERE len(w) >= 3
), g AS (
  SELECT doc_id, unnest(shingles) AS gram FROM sh
)
SELECT doc_id, CAST(b.range AS BIGINT) AS h_idx,
       min(substr(md5(gram || '#' || CAST(b.range AS VARCHAR)), 1, 16)) AS minhash16
FROM g CROSS JOIN range(16) b
GROUP BY doc_id, b.range
""",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (MinHash, deterministic): the 16-value md5-permutation signature
    per document, value-exact against the DuckDB dual — the same trick
    that made SimHash bit-exact in r2, upgrading MinHash from rows-only.
    The banding/verify pipeline (minhash_lsh_pairs) consumes signatures of
    exactly this shape; hashing family is the only difference."""
    docs = _t(spark, sf_dir, "documents")
    sh = docs.where(dedup.has_min_words(F.col("text"), 3)).select(
        "doc_id", dedup.word_shingles(F.col("text"), 3).alias("sh")
    )
    return sh.select(
        "doc_id",
        F.posexplode(dedup.minhash_signature_md5(F.col("sh"), 16)).alias(
            "h_idx", "minhash16"
        ),
    ).withColumn("h_idx", F.col("h_idx").cast("bigint"))


@register(
    "minhash_band_pairs",
    oracle=r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS shingles
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents)
  WHERE len(w) >= 3
), g AS (
  SELECT doc_id, unnest(shingles) AS gram FROM sh
), sig AS (
  SELECT doc_id, CAST(b.range AS BIGINT) AS h_idx,
         min(substr(md5(gram || '#' || CAST(b.range AS VARCHAR)), 1, 16)) AS mh
  FROM g CROSS JOIN range(16) b
  GROUP BY doc_id, b.range
), bandkeys AS (
  SELECT doc_id, h_idx // 4 AS band, string_agg(mh, ',' ORDER BY h_idx) AS band_key
  FROM sig GROUP BY doc_id, h_idx // 4
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandkeys a JOIN bandkeys b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), pairs AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))) AS j
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.3
""",
)
def minhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (MinHash+LSH, end-to-end deterministic): the complete
    band-join-verify pipeline over the md5 hash family, hash-matched
    against a DuckDB dual that replays every stage (signatures → band
    keys → candidate join → exact-Jaccard verify). Complements
    `minhash_signatures` (stage-level check) and `minhash_lsh_pairs`
    (production xxhash64 family, rows-only): together the MinHash
    operator is now fully gate-verified."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_band_dup_pairs_md5(
        docs, shingle_n=3, num_hashes=16, bands=4, threshold=0.3
    )


@register(
    "simhash_signatures",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS h
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS t
        FROM documents)
), votes AS (
  SELECT doc_id, b.range AS j,
         sum(CASE WHEN (h >> CAST(b.range AS UBIGINT)) & 1 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM tok CROSS JOIN range(64) b
  GROUP BY doc_id, b.range
), sig AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0
                  THEN CAST(1 AS HUGEINT) << CAST(j AS INT)
                  ELSE CAST(0 AS HUGEINT) END) AS total
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN coalesce(sig.total, 0) >= CAST(1 AS HUGEINT) << 63
                 THEN coalesce(sig.total, 0) - (CAST(1 AS HUGEINT) << 64)
                 ELSE coalesce(sig.total, 0) END AS BIGINT) AS simhash
FROM documents d LEFT JOIN sig ON sig.doc_id = d.doc_id
""",
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (SimHash): 64-bit signatures via Arrow-batched pandas UDF. The
    md5-derived token bits make even the UDF path oracle-checkable: the
    DuckDB dual recomputes every bit vote with UBIGINT shifts and folds
    the sign bits back through two's complement - the signature
    hash-matches bit for bit (upgraded from a rows-only check)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_signature(docs)


@register(
    "similarity_topk",
    oracle="""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         list_sum([qv[i]::DOUBLE * cv[i]::DOUBLE for i in range(1, len(qv)+1)])
           / (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE for i in range(1, len(qv)+1)]))
              * sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE for i in range(1, len(cv)+1)])))
           AS sim
  FROM q, c WHERE q.query_id != c.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim, rank
FROM ranked WHERE rank <= 5
""",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: exact top-5 cosine neighbors for the first 10 vectors —
    broadcast query set, JVM-side fold for the dot product."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_bruteforce(
        emb, emb.where(F.col("vec_id") < 10), k=5
    )


@register(
    "similarity_topk_ivf",
    oracle="""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
), cent AS (
  SELECT vec_id AS cid, vec AS cvec FROM v ORDER BY vec_id LIMIT 16
), vc AS (
  SELECT v.vec_id, c.cid,
         list_sum(list_transform(range(1,65), j -> v.vec[j]*c.cvec[j]))
         / (sqrt(list_sum(list_transform(range(1,65), j -> v.vec[j]*v.vec[j])))
            * sqrt(list_sum(list_transform(range(1,65), j -> c.cvec[j]*c.cvec[j])))) AS cos
  FROM v CROSS JOIN cent c
), assign AS (
  SELECT vec_id AS neighbor_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
    FROM vc
  ) WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
    FROM vc WHERE vec_id < 10
  ) WHERE rn <= 4
), scored AS (
  SELECT p.query_id, a.neighbor_id,
         list_sum(list_transform(range(1,65), j -> q.vec[j]*n.vec[j]))
         / (sqrt(list_sum(list_transform(range(1,65), j -> q.vec[j]*q.vec[j])))
            * sqrt(list_sum(list_transform(range(1,65), j -> n.vec[j]*n.vec[j])))) AS cos_sim
  FROM probes p
  JOIN assign a ON a.cid = p.cid
  JOIN v q ON q.vec_id = p.query_id
  JOIN v n ON n.vec_id = a.neighbor_id
  WHERE a.neighbor_id <> p.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
""",
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 scale path: IVF-bucketed ANN (16 centroids, nprobe=4). The
    centroids are DETERMINISTIC (the 16 lowest-id corpus vectors — see
    cosine_topk_ivf's seeding contract), which makes the whole
    probe-and-rank pipeline SQL-expressible: the DuckDB dual replays
    assignment (argmax cosine, ties to the lower centroid id — the same
    order the stable argsort produces), the 4-bucket probe, and the
    per-query top-5, upgrading this from a rows-only check to a value-
    hash match."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_ivf(
        emb, emb.where(F.col("vec_id") < 10), k=5, num_centroids=16, nprobe=4
    )


@register(
    "text_token_stats",
    oracle=r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS n_tokens,
       length(text) AS n_chars
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: whitespace token counting."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "text_quality",
    oracle=r"""
WITH t AS (
  SELECT doc_id, text,
         len(string_split_regex(trim(lower(text)), '\s+')) AS n_toks,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\p{L}\p{N}_\s]', '', 'g')) AS n_punct,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             w -> list_contains(['the','and','of','to','a','in','is','that','with','for'], w)))
           AS n_stop
  FROM documents
)
SELECT doc_id,
       round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct_ratio,
       round(CAST(n_stop AS DOUBLE) / greatest(n_toks, 1), 6) AS stopword_ratio,
       round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
             / greatest(n_toks, 1), 6) AS mean_word_len
FROM t
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: punctuation/stopword/word-length quality signals."""
    docs = _t(spark, sf_dir, "documents")
    out = text.quality_features(docs)
    return out.select("doc_id", "punct_ratio", "stopword_ratio", "mean_word_len")


@register(
    "text_language_id",
    oracle=r"""
WITH scored AS (
  SELECT doc_id, lang,
    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        w -> list_contains(['the','and','of','to','a','in','is','that','with','for'], w))) AS s_en,
    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        w -> list_contains(['der','die','das','und','ist','von','mit','ein','nicht','für'], w))) AS s_de,
    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        w -> list_contains(['le','la','les','et','est','de','un','une','pour','dans'], w))) AS s_fr,
    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        w -> list_contains(['el','la','los','y','es','de','un','una','por','con'], w))) AS s_es,
    len(lower(text)) - len(replace(replace(replace(replace(replace(replace(replace(
        replace(replace(replace(lower(text),
        '的',''),'是',''),'在',''),'和',''),'了',''),'有',''),'我',''),'不',''),'这',''),'中','')) AS s_zh
  FROM documents
), guessed AS (
  SELECT doc_id, lang,
    CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
         WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
         WHEN s_es >= s_zh THEN 'es'
         ELSE 'zh' END AS guess_lang
  FROM scored
)
SELECT lang, guess_lang, count(*) AS n FROM guessed GROUP BY lang, guess_lang
""",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: stopword-heuristic language ID, confusion counts vs fixture
    ground truth (ties resolve to STOPWORDS declaration order)."""
    docs = _t(spark, sf_dir, "documents")
    guessed = docs.select(
        "lang", text.language_id(F.col("text")).alias("guess_lang")
    )
    return guessed.groupBy("lang", "guess_lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           [CAST(unicode(text[i]) AS BIGINT) for i in range(1, len(text)+1)]),
         (h, c) -> (h * 31 + c) % 1000000007) AS fp
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: rolling polynomial hash (h·31+cp mod 1e9+7) — exact int64 fold,
    bit-identical across engines."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))


@register(
    "text_repetition_signals",
    oracle=r"""
WITH base AS (
  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
), bi AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 2
              THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
              ELSE [] END AS grams
  FROM base
), tri AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]
              ELSE [] END AS grams
  FROM base
), topbi AS (
  SELECT doc_id, max(c) AS top_n FROM (
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT doc_id, unnest(grams) AS g FROM bi) GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.w) AS INT) AS n_words,
       CAST(len(list_distinct(b.w)) AS INT) AS n_distinct_words,
       CAST(len(bi.grams) AS INT) AS n_bigrams,
       CAST(coalesce(t.top_n, 0) AS INT) AS top_bigram_n,
       CAST(len(tr.grams) AS INT) AS n_trigrams,
       CAST(len(list_distinct(tr.grams)) AS INT) AS n_distinct_trigrams,
       CAST(len(list_filter(string_split(b.text, chr(10)), x -> trim(x) <> '')) AS INT) AS n_lines,
       CAST(CASE WHEN len(b.w) > 0
                 THEN floor((1000000.0 * (len(b.w) - len(list_distinct(b.w)))) / len(b.w))
                 ELSE 0 END AS BIGINT) AS dup_word_ppm,
       CAST(CASE WHEN len(bi.grams) > 0
                 THEN floor((1000000.0 * coalesce(t.top_n, 0)) / len(bi.grams))
                 ELSE 0 END AS BIGINT) AS top_bigram_ppm,
       CAST(CASE WHEN len(tr.grams) > 0
                 THEN floor((1000000.0 * (len(tr.grams) - len(list_distinct(tr.grams)))) / len(tr.grams))
                 ELSE 0 END AS BIGINT) AS dup_trigram_ppm
FROM base b
JOIN bi ON bi.doc_id = b.doc_id
JOIN tri tr ON tr.doc_id = b.doc_id
LEFT JOIN topbi t ON t.doc_id = b.doc_id
""",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 (Gopher-style repetition): duplicate-word/trigram and top-bigram
    statistics per document, computed entirely in-row (array folds — zero
    shuffles; the DuckDB oracle recomputes top-bigram multiplicity the
    opposite way, via unnest+groupBy, making the check non-circular).
    Fractions ship as floor-ppm integers: floor on bit-identical IEEE
    doubles is engine-portable where round-half ties are not."""
    docs = _t(spark, sf_dir, "documents")
    rep = text.repetition_features(docs)

    def ppm(num: F.Column, den: F.Column) -> F.Column:
        return F.when(
            den > 0, F.floor((F.lit(1000000.0) * num) / den)
        ).otherwise(F.lit(0).cast("long"))

    return rep.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "n_bigrams",
        "top_bigram_n",
        "n_trigrams",
        "n_distinct_trigrams",
        "n_lines",
        ppm(F.col("n_words") - F.col("n_distinct_words"), F.col("n_words")).alias(
            "dup_word_ppm"
        ),
        ppm(F.col("top_bigram_n"), F.col("n_bigrams")).alias("top_bigram_ppm"),
        ppm(
            F.col("n_trigrams") - F.col("n_distinct_trigrams"), F.col("n_trigrams")
        ).alias("dup_trigram_ppm"),
    )


@register(
    "pii_redaction",
    oracle=r"""
WITH seeded AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' tel +1 555-000-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '\+\d[\d\s().-]{6,}\d')) AS INT) AS n_phone,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+\d[\d\s().-]{6,}\d', '<PHONE>', 'g')) AS redacted_md5
FROM seeded
""",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 (PII scrub): emails/IPv4s/phones counted then redacted with
    Java-regex/RE2-common patterns. The fixture has no PII, so the query
    seeds deterministic synthetic PII per doc_id residue class on BOTH
    engines; the oracle hash covers counts AND the md5 of the redacted
    text, i.e. the byte-exact replacement behavior."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    did.cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" tel +1 555-000-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (did % 256).cast("string"),
                    F.lit("."),
                    ((did * 3) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = text.redact_pii(seeded)
    return red.select(
        "doc_id",
        F.col("n_email"),
        F.col("n_ipv4"),
        F.col("n_phone"),
        F.md5(F.col("text_redacted")).alias("redacted_md5"),
    )


# Decontamination fixture split: every 20th doc plays the benchmark/eval
# set; the rest are the training corpus. 5-grams (not the papers' 13) fit
# the fixture's ~54-word documents.
_DECON_CTES = r"""
base AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 5
              THEN list_distinct([array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)])
              ELSE [] END AS grams
  FROM base
), ev AS (
  SELECT DISTINCT unnest(grams) AS gram FROM sh WHERE doc_id % 20 = 0
), tr AS (
  SELECT doc_id, grams FROM sh WHERE doc_id % 20 <> 0
), hits AS (
  SELECT t.doc_id, count(*) AS n_hits
  FROM (SELECT doc_id, unnest(grams) AS gram FROM tr) t
  JOIN ev ON t.gram = ev.gram
  GROUP BY t.doc_id
)"""


@register(
    "decontam_ngram_overlap",
    oracle=f"""
WITH {_DECON_CTES}
SELECT tr.doc_id, CAST(len(tr.grams) AS INT) AS n_ngrams,
       coalesce(h.n_hits, 0) AS n_hits,
       round(CASE WHEN len(tr.grams) > 0
                  THEN CAST(coalesce(h.n_hits, 0) AS DOUBLE) / len(tr.grams)
                  ELSE 0.0 END, 6) AS hit_frac,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM tr LEFT JOIN hits h ON h.doc_id = tr.doc_id
""",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination stats: per training doc, how many of its
    distinct 5-grams appear in the (broadcast) eval split. Map-side
    broadcast join on the gram; one doc-id-keyed count shuffle."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 20 != 0)
    eval_set = docs.where(F.col("doc_id") % 20 == 0)
    return decontam.ngram_overlap(train, eval_set, n=5)


@register(
    "decontam_bloom_prefilter",
    oracle=f"""
WITH {_DECON_CTES.split(', hits AS')[0]}
, trg AS (SELECT doc_id, unnest(grams) AS gram FROM tr)
, uniq AS (SELECT DISTINCT gram FROM trg)
, set_bits AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5('bloom-' || CAST(i.range AS VARCHAR) || '-'
                              || ev.gram), 1, 8)) AS BIGINT) % 65536 AS pos
  FROM ev CROSS JOIN range(5) i
), probe AS (
  SELECT u.gram,
         CAST(('0x' || substr(md5('bloom-' || CAST(i.range AS VARCHAR) || '-'
                              || u.gram), 1, 8)) AS BIGINT) % 65536 AS pos
  FROM uniq u CROSS JOIN range(5) i
), maybe AS (
  SELECT p.gram, count(sb.pos) = 5 AS maybe
  FROM probe p LEFT JOIN set_bits sb ON sb.pos = p.pos
  GROUP BY p.gram
), truth AS (
  SELECT u.gram, ev.gram IS NOT NULL AS hit
  FROM uniq u LEFT JOIN ev ON ev.gram = u.gram
)
SELECT t.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN m.maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
       CAST(sum(CASE WHEN th.hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
FROM trg t
JOIN maybe m ON m.gram = t.gram
JOIN truth th ON th.gram = t.gram
GROUP BY t.doc_id
""",
)
def decontam_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination's 100 TB shape: instead of broadcasting the full
    eval GRAM SET, broadcast a fixed-size Bloom filter of it (n_bits
    positions regardless of benchmark size), count each train doc's
    maybe-hits, and exact-verify only the unique maybe grams. Per doc:
    (n_grams, n_maybe, n_hits) — n_maybe ≥ n_hits always (no false
    negatives), and because the md5 positions are deterministic even the
    false-positive margin hash-matches the DuckDB dual. Composes
    `bloom_membership` into the `decontam_ngram_overlap` pipeline."""
    docs = _t(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 20 == 0)
    tr = docs.where(F.col("doc_id") % 20 != 0)
    ev_grams = ev.select(
        F.explode(dedup.word_shingles(F.col("text"), 5)).alias("gram")
    ).distinct()
    trg = tr.select(
        "doc_id", F.explode(dedup.word_shingles(F.col("text"), 5)).alias("gram")
    )
    uniq = trg.select("gram").distinct()
    maybe = _sketches.bloom_membership(
        ev_grams, uniq, "gram", n_bits=65536, n_hashes=5
    ).withColumnRenamed("in_bloom", "maybe")
    truth = uniq.join(
        F.broadcast(ev_grams.withColumn("__t", F.lit(1))), "gram", "left"
    ).select("gram", F.col("__t").isNotNull().alias("hit"))
    return (
        trg.join(maybe, "gram")
        .join(truth, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("maybe"), 1).otherwise(0)).cast("bigint").alias("n_maybe"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("bigint").alias("n_hits"),
        )
    )


@register(
    "decontam_clean_corpus",
    oracle=f"""
WITH {_DECON_CTES}
SELECT tr.doc_id, d.n_chars
FROM tr JOIN documents d ON d.doc_id = tr.doc_id
LEFT JOIN hits h ON h.doc_id = tr.doc_id
WHERE coalesce(h.n_hits, 0) = 0
""",
)
def decontam_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter form: training docs surviving a zero-tolerance
    decontamination pass (left-anti join against the contaminated-id
    sliver — AQE broadcasts it)."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 20 != 0)
    eval_set = docs.where(F.col("doc_id") % 20 == 0)
    return decontam.decontaminate(train, eval_set, n=5).select("doc_id", "n_chars")


