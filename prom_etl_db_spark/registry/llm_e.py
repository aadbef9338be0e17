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


@register(
    "multimodal_decode",
    oracle="""
SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
       octet_length(encode(text)) % 640 AS width,
       octet_length(encode(text)) % 480 AS height
FROM documents
""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: binary media plumbing — payload → mapInPandas feature extraction
    (deterministic fake decode; codec stubbed, Spark plumbing real)."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.as_media(docs)
    feats = multimodal.decode_features(media)
    return feats.select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


@register(
    "media_frame_counts",
    oracle="""
SELECT doc_id AS media_id,
       least(8, greatest(1, octet_length(encode(text)) // 64)) AS n_frames
FROM documents
""",
)
def media_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: frame sampling fan-out (≤8 fixed-stride slices per payload)."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.as_media(docs, kind="video")
    frames = multimodal.sample_frames(media, every_n_bytes=64, max_frames=8)
    return frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))


@register(
    "multimodal_bmp_pixels",
    oracle="""
SELECT doc_id AS media_id,
       CAST(doc_id % 16 + 1 AS INT) AS width,
       CAST(doc_id % 8 + 1 AS INT) AS height,
       CAST(doc_id % 256 AS DOUBLE) AS mean_r,
       CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
       CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
FROM documents
""",
)
def multimodal_bmp_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL pixel decode): per document, synthesize a valid 24-bit
    BMP from closed-form id functions, then fully decode it — headers,
    padded bottom-up pixel rows, per-channel means over every pixel — in
    mapInPandas. The oracle recomputes the closed forms, so the driver
    hash-checks the encode→decode roundtrip byte-for-byte."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.bmp_roundtrip_features(docs)


@register(
    "multimodal_png_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((doc_id + 3 * x + 5 * y) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((doc_id * 7 + x) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((doc_id * 13 + y) % 256 AS DOUBLE)), 6) AS mean_b
FROM px GROUP BY doc_id
""",
)
def multimodal_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL PNG decode, stdlib only — closes r2's last stub): per
    document, encode a real 8-bit truecolor PNG of a closed-form gradient
    with row filters cycling through all five PNG filter types, then
    fully decode it back (zlib inflate + Sub/Up/Average/Paeth
    reconstruction) in mapInPandas. The oracle recomputes the gradient
    means per pixel, so the driver hash-checks the entire compress→
    inflate→defilter algebra; a single wrong Paeth branch shifts a
    channel mean and breaks the hash."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.png_roundtrip_features(docs)


@register(
    "audio_g711_expansion",
    oracle="""
WITH s AS (
  SELECT d.doc_id, d.doc_id % 64 + 16 AS n, i.range AS i
  FROM documents d CROSS JOIN range(80) i
  WHERE i.range < d.doc_id % 64 + 16
), enc AS (
  SELECT doc_id, n,
         (doc_id + 7 * i) % 256 AS bu,
         (doc_id * 3 + 11 * i) % 256 AS ba
  FROM s
), expanded AS (
  -- the CCITT reference formulas verbatim (G.711):
  -- ulaw: u = ~b & 255; t = (((u&15)<<3)+132) << ((u>>4)&7);
  --       sign bit of u picks 132-t vs t-132
  -- alaw: a = b ^ 85; seg switch on (a>>4)&7; sign bit of a POSITIVE
  SELECT doc_id, n,
    CASE WHEN ((255 - bu) & 128) != 0
         THEN 132 - ((((255 - bu) & 15) * 8 + 132)
                     * (1 << (((255 - bu) >> 4) & 7)))
         ELSE (((255 - bu) & 15) * 8 + 132)
              * (1 << (((255 - bu) >> 4) & 7)) - 132
    END AS vu,
    (CASE WHEN (xor(ba, 85) & 128) != 0 THEN 1 ELSE -1 END) *
    (CASE ((xor(ba, 85) >> 4) & 7)
       WHEN 0 THEN (xor(ba, 85) & 15) * 16 + 8
       WHEN 1 THEN (xor(ba, 85) & 15) * 16 + 264
       ELSE ((xor(ba, 85) & 15) * 16 + 264)
            * (1 << (((xor(ba, 85) >> 4) & 7) - 1))
     END) AS va
  FROM enc
)
SELECT doc_id AS media_id,
       CAST(min(n) AS INT) AS n_samples,
       round(sqrt(avg(CAST(vu AS DOUBLE) * vu)), 4) AS ulaw_rms,
       round(sqrt(avg(CAST(va AS DOUBLE) * va)), 4) AS alaw_rms,
       round(avg(CAST(vu AS DOUBLE)), 4) AS ulaw_mean,
       round(avg(CAST(va AS DOUBLE)), 4) AS alaw_mean
FROM expanded GROUP BY doc_id
""",
)
def audio_g711_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, telephony formats (r4): per document a µ-law AND an
    A-law 8-bit WAV (ITU-T G.711, format codes 7/6) are written from
    closed-form encoded bytes and fully decoded back — RIFF walk,
    format-code dispatch, CCITT table expansion to 16-bit linear. The
    expansion is pure integer bit algebra, so the oracle recomputes it
    in SQL verbatim and the driver hash-checks every table entry the
    fixture touches (all 256 per law across the corpus); known vectors
    (µ-law 0x80 → +32124, A-law 0xAA → +32256) pin the endpoints in
    unit tests."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.g711_expansion_features(docs)


@register(
    "audio_mpeg_decode",
    oracle="""
WITH grid AS (
  SELECT d.doc_id, f.range AS f, sb.range AS sb
  FROM documents d
  CROSS JOIN range(3) f CROSS JOIN range(32) sb
  WHERE f.range < 1 + d.doc_id % 3
), p AS (
  SELECT doc_id, f, sb,
         CASE WHEN (doc_id + f + sb) % 4 = 0 THEN 0
              ELSE 2 + (doc_id + 3*f + sb) % 9 END AS alloc,
         (doc_id*7 + f*11 + sb*5) % 63 AS sfi
  FROM grid
), q AS (
  SELECT doc_id, f, sb, alloc + 1 AS nb, sfi, s.range AS s,
         (doc_id + 7*f + 3*sb + 5*s.range) % ((1 << (alloc + 1)) - 1) AS code
  FROM p CROSS JOIN range(12) s WHERE alloc > 0
), v AS (
  SELECT doc_id, f, sb, nb, sfi, s, code,
         2.0 * pow(2.0, -(sfi/3.0))
         * ((1.0 / (1.0 - pow(2.0, -CAST(nb AS DOUBLE))))
            * ((code + 1) * pow(2.0, CAST(1 - nb AS DOUBLE)) - 1.0)) AS val
  FROM q
)
SELECT doc_id AS media_id, CAST(f AS INT) AS frame,
       CAST(sb AS INT) AS subband, CAST(nb AS INT) AS nb,
       CAST(sfi AS INT) AS sf_idx,
       CAST(sum(code) AS BIGINT) AS code_sum,
       round(min(CASE WHEN s = 0 THEN val END), 6) AS v0,
       round(max(abs(val)), 6) AS speak
FROM v GROUP BY doc_id, f, sb, nb, sfi
""",
)
def audio_mpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, MPEG-1 Layer I (ISO/IEC 11172-3 — r5, the VERDICT 'MP3
    story' decision): per document, REAL Layer I frames (448 kbps,
    32 kHz, mono, CRC-protected) are assembled from closed-form field
    derivations and fully decoded back from raw bytes — 12-bit sync +
    header arithmetic, CRC-16 over header+allocation, the 4-bit
    bit-allocation walk, 6-bit scalefactor indices (Table B.1 is the
    closed form 2*2^(-idx/3)), MSB-first sample codes, and §2.4.3.3
    requantization s'' = (2^nb/(2^nb-1))*((C+1)*2^(1-nb) - 1) — all of
    which is spec FORMULA arithmetic, recomputed verbatim by this SQL
    oracle, so the driver hash-checks the whole bitstream round-trip
    per (frame, active subband): the exact integer code sum plus two
    order-free floats (s=0 value, 12-sample peak — float SUMS are
    deliberately unhashed, see mpeg1_subband_features on why pairwise
    vs sequential summation breaks a .00005 boundary at corpus scale).
    The one non-closed-form step — the 512
    Table-B.3 synthesis-window coefficients, printed numbers with no
    generating formula and no copy offline — is a documented pluggable
    hook (`mpeg_audio.set_synthesis_window`), and Layer II/III stay
    env-stubbed for the same numeric-table reason (DIVERGENCES.md)."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.mpeg1_subband_features(docs)


@register(
    "video_mjpeg_frame_sampling",
    oracle="""
WITH pick AS (
  SELECT d.doc_id, d.doc_id % 5 + 2 AS nf, j.range AS j,
         (j.range * (d.doc_id % 5 + 1)) // 2 AS fi
  FROM documents d CROSS JOIN range(3) j
), comp AS (
  SELECT p.doc_id, p.nf, p.j, p.fi,
         CAST((p.doc_id * 3 + 5 * b.range + 11 * p.fi) % 256 AS DOUBLE) AS y,
         CAST((p.doc_id * 11 + 4 * b.range + 3 * p.fi) % 256 AS DOUBLE) AS cb,
         CAST((p.doc_id * 13 + 2 * b.range + 5 * p.fi) % 256 AS DOUBLE) AS cr
  FROM pick p CROSS JOIN range(2) b
), rgb AS (
  SELECT doc_id, nf, j, fi,
         least(255, greatest(0, floor(
           y + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
         least(255, greatest(0, floor(
           y - CAST(0.344136 AS DOUBLE) * (cb - 128)
             - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
         least(255, greatest(0, floor(
           y + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM comp
)
SELECT doc_id AS media_id,
       CAST(min(nf) AS INT) AS n_frames,
       CAST(j AS INT) AS frame_pos,
       CAST(min(fi) AS INT) AS frame_index,
       round(avg(r), 6) AS mean_r,
       round(avg(g), 6) AS mean_g,
       round(avg(b), 6) AS mean_b
FROM rgb GROUP BY doc_id, j
""",
)
def video_mjpeg_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 video, REAL container + REAL lossy codec (r4): per document an
    MJPEG AVI (RIFF hdrl/movi/idx1, one baseline JPEG per frame) is
    encoded from closed forms, uniformly frame-sampled at 3 positions,
    and each sampled frame fully decoded (RIFF walk → 00dc chunks →
    Huffman/dequant/IDCT/YCbCr). Flat quantization + per-block-constant
    frames keep the lossy decode bit-exact, so one oracle hash-checks
    container parsing, the floor(j·(F−1)/(k−1)) sampling grid, and the
    JPEG pipeline together. The GIF twin (`video_frame_sampling`) covers
    the lossless-codec container; this covers the lossy one."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.video_mjpeg_frame_features(docs)


@register(
    "multimodal_png_palette_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h,
         CASE d.doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 4
                           WHEN 2 THEN 16 ELSE 64 END AS nc
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
), idx AS (
  SELECT doc_id, w, h, (doc_id + 3 * x + 5 * y) % nc AS i FROM px
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((3 * i) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((5 * i) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((7 * i) % 256 AS DOUBLE)), 6) AS mean_b
FROM idx GROUP BY doc_id
""",
)
def multimodal_png_palette_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (indexed-color PNG, r4 — VERDICT task #7): per document a real
    PLTE PNG at bit depth 1/2/4/8 (cycling by id) of a closed-form index
    grid is encoded, then fully decoded back — inflate, defilter,
    MSB-first sub-byte unpack, palette map — in mapInPandas. The oracle
    recomputes the palette-mapped channel means, hash-checking the
    packed-bit algebra at every legal palette depth."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.png_palette_roundtrip_features(docs)


@register(
    "multimodal_png_interlaced_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((doc_id + 3 * x + 5 * y) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((doc_id * 7 + x) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((doc_id * 13 + y) % 256 AS DOUBLE)), 6) AS mean_b
FROM px GROUP BY doc_id
""",
)
def multimodal_png_interlaced_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (Adam7 PNG, r4 — VERDICT task #7): the straight-PNG gradient
    written INTERLACED (seven independently-filtered pass sub-images in
    one deflate stream) and decoded through the pass-scatter path. The
    oracle is the same closed-form means as `multimodal_png_pixels`; a
    wrong pass grid, pass ordering, or per-pass filter reset scrambles
    pixel positions and breaks the hash."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.png_interlaced_roundtrip_features(docs)


@register(
    "multimodal_png16_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 8 + 1 AS w, d.doc_id % 6 + 1 AS h
  FROM documents d CROSS JOIN range(8) x CROSS JOIN range(6) y
  WHERE x.range < d.doc_id % 8 + 1 AND y.range < d.doc_id % 6 + 1
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((doc_id * 257 + 1000 * x + 2000 * y) % 65536
                      AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((doc_id * 4097 + 300 * x) % 65536 AS DOUBLE)), 6)
         AS mean_g,
       round(avg(CAST((doc_id * 9973 + 777 * y) % 65536 AS DOUBLE)), 6)
         AS mean_b
FROM px GROUP BY doc_id
""",
)
def multimodal_png16_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (16-bit PNG, r4 — the decoder's LAST refusal branch closed):
    full-range 16-bit truecolor gradients encoded big-endian with all
    five filter types cycling on the doubled (bpp=6) byte stride, then
    fully decoded back. The oracle recomputes the 16-bit closed forms;
    a byte-order slip or a filter operating on samples instead of bytes
    shifts a channel mean and breaks the hash."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.png16_roundtrip_features(docs)


@register(
    "multimodal_jpeg_pixels",
    oracle="""
WITH blk AS (
  SELECT d.doc_id, bx.range AS bx, by.range AS by,
         d.doc_id % 3 + 1 AS wb, d.doc_id % 2 + 1 AS hb
  FROM documents d CROSS JOIN range(3) bx CROSS JOIN range(2) by
  WHERE bx.range < d.doc_id % 3 + 1 AND by.range < d.doc_id % 2 + 1
), comp AS (
  SELECT doc_id, wb, hb,
         CAST((doc_id * 3 + 5 * bx + 7 * by) % 256 AS DOUBLE) AS y,
         CAST((doc_id * 11 + 4 * bx + 6 * by) % 256 AS DOUBLE) AS cb,
         CAST((doc_id * 13 + 2 * bx + 3 * by) % 256 AS DOUBLE) AS cr
  FROM blk
), rgb AS (
  -- the decoder's JFIF floats with floor(x+0.5) rounding, verbatim
  SELECT doc_id, wb, hb,
         least(255, greatest(0, floor(
           y + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
         least(255, greatest(0, floor(
           y - CAST(0.344136 AS DOUBLE) * (cb - 128)
             - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
         least(255, greatest(0, floor(
           y + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM comp
)
SELECT doc_id AS media_id,
       CAST(min(wb) * 8 AS INT) AS width,
       CAST(min(hb) * 8 AS INT) AS height,
       round(avg(r), 6) AS mean_r,
       round(avg(g), 6) AS mean_g,
       round(avg(b), 6) AS mean_b
FROM rgb GROUP BY doc_id
""",
)
def multimodal_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL baseline-JPEG decode, stdlib+numpy — closes r3's lossy
    stub, VERDICT task #3): per document, encode a valid baseline JPEG
    of closed-form per-block-constant Y/Cb/Cr with flat quantization and
    restart markers every 2 MCUs, then fully decode it back — Huffman
    entropy decode off the file's own DHT, restart resync + DC predictor
    resets, dequantize, un-zigzag, IDCT, YCbCr→RGB — in mapInPandas.
    Blockwise-constant input + all-ones tables make the lossy pipeline
    bit-exact, so the oracle recomputes the expected RGB means in SQL
    and the driver hash-checks the whole entropy-coding algebra. The
    decoder also passes two known-vector tests against hand-assembled
    from-the-spec JPEGs (tests/test_multimodal.py) — a flat-DQT vector
    for the Huffman/bit-order/IDCT path and a zigzag-ramp-DQT vector
    that pins the dequantization ORDER (the r5 fix) — checking interop
    rather than mere self-consistency."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.jpeg_roundtrip_features(docs)


@register(
    "multimodal_gif_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h,
         (d.doc_id + 3 * x.range + 5 * y.range) % 64 AS idx
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((3 * idx) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((5 * idx) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((7 * idx) % 256 AS DOUBLE)), 6) AS mean_b
FROM px GROUP BY doc_id
""",
)
def multimodal_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL GIF decode, stdlib only): per document, encode a valid
    GIF89a of a closed-form 64-color palette image, then fully decode it
    back — sub-block reassembly, variable-width LSB-first LZW (clear/EOI,
    KwK case, giflib width sync), palette mapping — in mapInPandas. The
    oracle recomputes the palette-mapped channel means per pixel, so the
    driver hash-checks the whole compress→decompress roundtrip; the
    decoder also passes a known-vector test against the canonical
    hand-assembled 1×1 GIF, proving interop rather than mere
    self-consistency."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.gif_roundtrip_features(docs)


@register(
    "multimodal_resize_roundtrip",
    oracle="""
WITH hmean AS (
  SELECT h, round(30.0 * avg(CAST(floor(i.range * 8.0 / hs.h) AS DOUBLE)), 6) AS mean_v
  FROM (SELECT range + 1 AS h FROM range(4)) hs
  JOIN range(4) i ON i.range < hs.h
  GROUP BY h
)
SELECT d.doc_id AS media_id, CAST(2 AS INT) AS width,
       CAST(d.doc_id % 4 + 1 AS INT) AS height, hmean.mean_v AS mean_px
FROM documents d JOIN hmean ON hmean.h = d.doc_id % 4 + 1
""",
)
def multimodal_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 transform: encode -> nearest-neighbor resize -> decode over a
    gradient BMP, with the resized mean's closed form recomputed by the
    oracle - the pixel-selection arithmetic is what's being gated."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.bmp_resize_roundtrip_features(docs)


@register(
    "multimodal_wav_samples",
    oracle="""
SELECT doc_id AS media_id,
       CAST(1 AS INT) AS channels,
       CAST(8000 AS INT) AS sample_rate,
       CAST((doc_id % 50 + 1) * 100 AS INT) AS n_samples,
       round(CAST((doc_id % 50 + 1) * 100 AS DOUBLE) / 8000, 6) AS duration_s,
       round(CAST(doc_id % 1000 AS DOUBLE), 6) AS rms
FROM documents
""",
)
def multimodal_wav_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL sample decode): a valid PCM-16 WAV per document
    (alternating ±amplitude → RMS exactly |amplitude|), decoded
    sample-by-sample through the RIFF chunk walk."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.wav_roundtrip_features(docs)


@register(
    "video_frame_sampling",
    oracle="""
WITH f AS (
  SELECT d.doc_id, j.range AS frame_pos,
         d.doc_id % 6 + 2 AS nf,
         d.doc_id % 8 + 2 AS w, d.doc_id % 4 + 2 AS h,
         (j.range * (d.doc_id % 6 + 1)) // 2 AS fi
  FROM documents d CROSS JOIN range(3) j
), px AS (
  SELECT f.doc_id, f.frame_pos, f.nf, f.fi,
         (f.doc_id + 7 * f.fi + 3 * x.range + 5 * y.range) % 64 AS idx
  FROM f CROSS JOIN range(9) x CROSS JOIN range(5) y
  WHERE x.range < f.w AND y.range < f.h
)
SELECT doc_id AS media_id,
       CAST(min(nf) AS INT) AS n_frames,
       CAST(frame_pos AS INT) AS frame_pos,
       CAST(min(fi) AS INT) AS frame_index,
       round(avg(CAST((3 * idx) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((5 * idx) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((7 * idx) % 256 AS DOUBLE)), 6) AS mean_b
FROM px GROUP BY doc_id, frame_pos
""",
)
def video_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 video path (the brief's "frame-sample" op, containerized as
    animated GIF — real multi-frame plumbing, no ffmpeg): per document a
    2-7 frame animation is ENCODED (per-frame LZW + graphic-control
    extensions + NETSCAPE loop block), uniformly sampled at 3 positions
    (frame index floor(j·(F−1)/(k−1)) — endpoints included), and each
    sampled frame fully DECODED to channel means. Both the sampling
    arithmetic and the means are closed forms, so one oracle hash-checks
    frame selection and the multi-frame codec together. mapInPandas,
    bounded per-clip work, zero shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.video_frame_sample_features(docs)


@register(
    "audio_signal_features",
    oracle="""
SELECT doc_id AS media_id,
       CAST(CASE WHEN doc_id % 1000 = 0 THEN 0.0 ELSE 1.0 END AS DOUBLE)
         AS zcr,
       CAST(doc_id % 1000 AS DOUBLE) AS peak_amplitude,
       CAST(CASE WHEN doc_id % 1000 = 0 THEN 0.0 ELSE 4000.0 END AS DOUBLE)
         AS spectral_centroid_hz,
       CAST(0.0 AS DOUBLE) AS spectral_bandwidth_hz
FROM documents
""",
)
def audio_signal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio ANALYSIS (beyond decode): zero-crossing rate, peak, and
    FFT spectral centroid/bandwidth per clip — the per-clip scalars an
    audio curation pipeline filters and stratifies on. The fixture's
    alternating ±amplitude square wave is the pure-Nyquist signal, so a
    genuine numpy-rfft pipeline is gated against CLOSED FORMS: zcr 1,
    every gram of spectral mass at fs/2 = 4000 Hz, bandwidth 0 (silent
    clips: all zeros). Arrow-batched mapInPandas; at 100 TB each clip is
    one bounded rfft in its own batch — embarrassingly parallel, no
    shuffle at all."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.wav_signal_features(docs)


@register(
    "embedding_neardup_pairs",
    oracle="""
WITH scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                   for i in range(1, len(a.embedding)+1)])
         / (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                           for i in range(1, len(a.embedding)+1)]))
            * sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                             for i in range(1, len(b.embedding)+1)]))) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(sim, 6) AS cos_sim FROM scored WHERE sim >= 0.4
""",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (embedding near-dup, exact): all pairs with cosine ≥ 0.4 —
    broadcast small side, JVM-side fold; the correctness baseline for the
    LSH scale path below."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup_pairs(emb, threshold=0.4)


@register("embedding_neardup_lsh")  # approximate (sign-LSH) → rows-only check
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (embedding near-dup, scale path): random-hyperplane LSH banding +
    exact-cosine verify; candidate shuffle carries (id, band, key) only.
    bands/bits AUTO-SIZE from the corpus count (lsh_auto_size): bits grows
    with log2(corpus) so random-pair candidate volume stays near-linear,
    bands then sized for 95% recall at the threshold — at fixture scale
    this resolves to bits=8, bands=118 (p_band = (1-acos(0.4)/pi)^8 ~
    0.025), matching the hand-sized round-1 values; at 100x the corpus it
    grows bits instead of going quadratic. Unit tests cross-validate
    recall against the exact variant."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup_lsh(emb, threshold=0.4)


@register(
    "embedding_signlsh_codes",
    oracle=similarity.signlsh_oracle_sql("embeddings", "vec_id", "embedding"),
)
def embedding_signlsh_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket codes over md5-derived hyperplanes — the
    deterministic verification surface for `embedding_neardup_lsh`'s
    estimator: the DuckDB dual re-derives every plane component from the
    same md5 map and folds the dots in the same element order, so all 16
    sign bits hash-match. One narrow zero-shuffle projection."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.signlsh_codes(emb, "vec_id", "embedding", bits=16, dim=64)


_KMEANS_CTE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
), c0 AS (
  SELECT row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR) || 'kmeans-init'), vec_id
         ) - 1 AS cluster,
         list_transform(vec, x -> round(x, 6)) AS centroid
  FROM v
  ORDER BY md5(CAST(vec_id AS VARCHAR) || 'kmeans-init'), vec_id
  LIMIT 8
), a0 AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c0.cluster,
           row_number() OVER (PARTITION BY v.vec_id
               ORDER BY list_distance(v.vec, c0.centroid), c0.cluster) AS rn
    FROM v CROSS JOIN c0)
  WHERE rn = 1
), c1 AS (
  SELECT cluster, list(m ORDER BY i) AS centroid FROM (
    SELECT a0.cluster, t.i, round(avg(v.vec[t.i]), 6) AS m
    FROM a0 JOIN v USING (vec_id) CROSS JOIN (SELECT range + 1 AS i FROM range(64)) t
    GROUP BY a0.cluster, t.i)
  GROUP BY cluster
), a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c1.cluster,
           row_number() OVER (PARTITION BY v.vec_id
               ORDER BY list_distance(v.vec, c1.centroid), c1.cluster) AS rn
    FROM v CROSS JOIN c1)
  WHERE rn = 1
)
"""


@register(
    "embedding_kmeans_assign",
    oracle=_KMEANS_CTE
    + """
SELECT vec_id, cluster, count(*) OVER (PARTITION BY cluster) AS cluster_size
FROM a1
""",
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E3: distributed Lloyd's k-means over the embedding corpus (k=8,
    2 fixed rounds, hash-seeded init). Driver holds only the k x d centroid
    matrix; assignment is one BLAS matmul per Arrow batch; the update is a
    (cluster, dim) hash agg. Fixed iterations + 6-dp centroid rounding
    make the full iteration SQL-expressible - a hash-match oracle for an
    iterative algorithm."""
    from pyspark.sql.window import Window

    emb = _t(spark, sf_dir, "embeddings")
    out = clustering.kmeans(emb, 8, n_iter=2)
    return out.select(
        "vec_id",
        "cluster",
        F.count(F.lit(1)).over(Window.partitionBy("cluster")).alias("cluster_size"),
    )


@register(
    "semantic_neardup_pairs",
    oracle=_KMEANS_CTE
    + """
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
       round(list_cosine_similarity(av.vec, bv.vec), 6) AS cos_sim
FROM a1 a JOIN a1 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
JOIN v av ON av.vec_id = a.vec_id
JOIN v bv ON bv.vec_id = b.vec_id
WHERE round(list_cosine_similarity(av.vec, bv.vec), 6) >= 0.4
""",
)
def semantic_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (SemDeDup, arXiv:2303.09540): semantic near-dup pairs via
    cluster-then-compare - the equi-join on the k-means cluster bounds
    candidates to sum(|cluster|^2) instead of n^2 (choose k ~ sqrt(n) at
    scale); exact cosine verifies within the bucket. Recall vs the exact
    all-pairs baseline is bounded by clustering quality - pairs split
    across clusters are the SemDeDup trade."""
    emb = _t(spark, sf_dir, "embeddings")
    return clustering.semantic_neardup_pairs(emb, 0.4, k=8, n_iter=2)


@register(
    "metric_name_discovery",
    oracle="""
SELECT event_type AS metric_name,
       count(DISTINCT user_id) AS n_series,
       count(*) AS n_samples
FROM events GROUP BY event_type
""",
)
def metric_name_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A33: metric-name discovery (`/root/reference/internal/prometheus/
    client.go:310-326` label-values for __name__) over stored samples:
    distinct names with series/sample cardinality. At scale the exact
    distinct is one shuffle; swap count_distinct for
    approx_count_distinct when cardinality estimates suffice."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(F.col("event_type").alias("metric_name")).agg(
        F.count_distinct(F.col("user_id")).alias("n_series"),
        F.count(F.lit(1)).alias("n_samples"),
    )


@register(
    "promql_rate",
    oracle="""
WITH s AS (
  SELECT event_type AS name, json_extract_string(props, '$.k') AS k, value, ts, event_id
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
), d AS (
  SELECT name, k, value,
         value - lag(value) OVER (PARTITION BY name, k ORDER BY ts, event_id) AS delta
  FROM s
)
SELECT name, k,
       round(sum(CASE WHEN delta IS NULL THEN 0
                      WHEN delta < 0 THEN value ELSE delta END)
             / 864000.0, 6) AS value
FROM d GROUP BY name, k
""",
)
def promql_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate(x[10d]) with counter-reset correction — per-second increase per
    series. (Beyond the reference's delegated subset: the most-used PromQL
    function, natively over stored samples. Non-extrapolated — see
    ``promql.increase`` docstring for the documented divergence.)"""
    out = promql.rate(
        _event_samples(spark, sf_dir, keys=("name", "k")),
        frame_start=datetime(2024, 1, 10),
        frame_end=datetime(2024, 1, 20),
        tiebreakers=["event_id"],
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.round("value", 6).alias("value"),
    )


@register(
    "promql_avg_over_time",
    oracle="""
WITH resampled AS (
  SELECT event_type AS name, json_extract_string(props, '$.k') AS k,
         date_trunc('hour', ts) AS bucket, value,
         row_number() OVER (
           PARTITION BY event_type, json_extract_string(props, '$.k'),
                        date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT name, k,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       count(*) AS n_buckets
FROM resampled WHERE rn = 1 GROUP BY name, k
""",
)
def promql_avg_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg_over_time over the 1h step grid (same resample spine as B5 with
    a different frame aggregate). The hash-compared columns are the exact
    decimal sum and bucket count (avg = sum/n): a rounded double average
    can land on an exact round-half boundary where Spark (HALF_UP on the
    decimal repr) and DuckDB (exact binary) round apart — e.g. the fixture
    produces a group averaging exactly 39.69875. Exact pieces, exact hash;
    the avg itself is unit-tested in test_promql.py."""
    samples = _event_samples(spark, sf_dir, keys=("name", "k"))
    stepped = promql.resample(samples, "1 hour", tiebreakers=["event_id"])
    out = promql.agg_over_time(
        stepped,
        F.struct(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        ),
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.col("value.s").alias("sum_value"),
        F.col("value.n").alias("n_buckets"),
    )


@register(
    "promql_topk",
    oracle="""
WITH instant AS (
  SELECT event_type AS name, json_extract_string(props,'$.k') AS k,
         user_id, value, ts,
         row_number() OVER (
           PARTITION BY event_type, json_extract_string(props,'$.k'), user_id
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE ts <= TIMESTAMP '2024-01-30 12:00:00'
    AND ts > TIMESTAMP '2024-01-30 00:00:00'
)
SELECT name, k, user_id, value FROM instant WHERE rn = 1
ORDER BY value DESC, k, name, CAST(user_id AS VARCHAR) LIMIT 5
""",
)
def promql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topk(5, x): highest-valued series of the instant vector at eval
    time. TakeOrderedAndProject — partial per-partition top-k, never a
    global sort. (Beyond the reference's delegated subset.)"""
    samples = _event_samples(spark, sf_dir)
    sel = promql.instant_selector(
        samples,
        None,
        datetime(2024, 1, 30, 12, 0, 0),
        staleness="12 hours",
        tiebreakers=["event_id"],
    )
    top = promql.topk(sel, 5)
    return top.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.element_at("labels", "user_id").cast("long").alias("user_id"),
        F.col("value"),
    )


@register(
    "promql_sliding_sum",
    oracle="""
WITH stepped AS (
  SELECT name, bucket, value FROM (
    SELECT event_type AS name, date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (
             PARTITION BY event_type, date_trunc('hour', ts)
             ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
)
SELECT name, bucket AS bucket_start,
       round(sum(value) OVER (
         PARTITION BY name ORDER BY epoch(bucket)
         RANGE BETWEEN 21599 PRECEDING AND CURRENT ROW), 4) AS value
FROM stepped
""",
)
def promql_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum_over_time(x[6h:1h]) evaluated at EVERY step — the sliding
    subquery variant (one RANGE window per series, single pass, no
    self-join)."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    stepped = promql.resample(samples, "1 hour", tiebreakers=["event_id"])
    out = promql.sliding_over_time(stepped, F.sum("value"), "6h")
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.col("bucket_start"),
        F.round("value", 4).alias("value"),
    )


@register(
    "promql_vector_ratio",
    oracle="""
WITH p AS (
  SELECT json_extract_string(props,'$.k') AS k, sum(value) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), c AS (
  SELECT json_extract_string(props,'$.k') AS k, sum(value) AS v
  FROM events WHERE event_type = 'click' GROUP BY 1
)
SELECT p.k AS k, round(p.v / c.v, 6) AS ratio
FROM p JOIN c ON p.k IS NOT DISTINCT FROM c.k
""",
)
def promql_vector_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector / vector with on(k) matching: per-k purchase value over
    per-k click value — ``sum by (k)(purchase) / on(k) sum by (k)(click)``.
    One equi-join on the projected entries key."""
    samples = _event_samples(spark, sf_dir, keys=("name", "k"))
    purchases = promql.sum_by(
        samples.where(F.col("metric_name") == "purchase"), ["k"]
    )
    clicks = promql.sum_by(samples.where(F.col("metric_name") == "click"), ["k"])
    out = promql.vector_binop(purchases, clicks, "/", on=["k"])
    return out.select(
        F.element_at("labels", "k").alias("k"),
        F.round("value", 6).alias("ratio"),
    )


# -- extended PromQL function surface (beyond the reference's delegated
# subset; each natively evaluated over stored samples) ---------------------


@register(
    "promql_stddev_by",
    oracle="""
SELECT event_type AS name, round(stddev_pop(value), 4) AS sd_value
FROM events GROUP BY event_type
""",
)
def promql_stddev_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev by (name) — population stddev, PromQL semantics."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    out = promql.stddev_by(samples, ["name"])
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.round("value", 4).alias("sd_value"),
    )


@register(
    "promql_quantile_by",
    oracle="""
SELECT event_type AS name, round(quantile_cont(value, 0.9), 4) AS q90
FROM events GROUP BY event_type
""",
)
def promql_quantile_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile(0.9, x) by (name) — exact linear-interpolated quantile
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``)."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    out = promql.quantile_by(samples, 0.9, ["name"])
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.round("value", 4).alias("q90"),
    )


@register(
    "promql_count_values",
    oracle="""
SELECT event_type AS name,
       CAST(CAST(floor(value / 50) * 50 AS BIGINT) AS VARCHAR) AS vbucket,
       CAST(count(*) AS DOUBLE) AS cnt
FROM events GROUP BY 1, 2
""",
)
def promql_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_values("vbucket", floor(x/50)*50): sample count per distinct
    (bucketed) value, the value becoming a label."""
    samples = _event_samples(spark, sf_dir, keys=("name",)).withColumn(
        "value", (F.floor(F.col("value") / 50) * 50).cast("double")
    )
    out = promql.count_values(samples, "vbucket")
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "vbucket").alias("vbucket"),
        F.col("value").alias("cnt"),
    )


@register(
    "promql_over_time_stats",
    oracle="""
WITH resampled AS (
  SELECT event_type AS name, date_trunc('hour', ts) AS bucket, value,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT name,
       round(arg_max(value, bucket), 4) AS last_value,
       round(stddev_pop(value), 4) AS sd_value,
       round(quantile_cont(value, 0.9), 4) AS q90_value
FROM resampled WHERE rn = 1 GROUP BY name
""",
)
def promql_over_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last/stddev/quantile_over_time in ONE frame aggregation over the 1h
    step grid (struct agg — single shuffle for all three)."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    stepped = promql.resample(samples, "1 hour", tiebreakers=["event_id"])
    out = promql.agg_over_time(
        stepped,
        F.struct(
            F.max_by("value", "bucket_start").alias("last"),
            F.stddev_pop("value").alias("sd"),
            F.percentile("value", 0.9).alias("q90"),
        ),
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.round("value.last", 4).alias("last_value"),
        F.round("value.sd", 4).alias("sd_value"),
        F.round("value.q90", 4).alias("q90_value"),
    )


@register(
    "promql_rate_range",
    oracle="""
WITH samples AS (
  SELECT event_type AS name, value, ts, event_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-24 12:00:00'
    AND ts <  TIMESTAMP '2024-01-30 00:00:00'
), grid AS (
  SELECT TIMESTAMP '2024-01-25 00:00:00' + range * INTERVAL 6 HOUR AS t
  FROM range(0, 21)
), joined AS (
  SELECT s.name, g.t, s.value, s.ts, s.event_id
  FROM samples s JOIN grid g
    ON s.ts >= g.t - INTERVAL 12 HOUR AND s.ts < g.t
), contrib AS (
  SELECT name, t, value,
         value - lag(value) OVER (
           PARTITION BY name, t ORDER BY ts, event_id) AS d
  FROM joined
)
SELECT name, t AS bucket_start,
       round(sum(CASE WHEN d IS NULL THEN 0
                      WHEN d < 0 THEN value ELSE d END) / 43200, 6)
         AS rate_value
FROM contrib
GROUP BY name, t
HAVING count(d) >= 1
""",
)
def promql_rate_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY rate: rate(m[12h]) at every 6h grid step over five
    days - the Grafana pattern. Each sample explodes onto <= frame/step
    grid instants; one ordered window per (series, step) applies the
    reset correction; one hash agg. The oracle replays the same sliding
    windows via a time-range join."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    out = promql.rate_range(
        samples,
        frame="12h",
        step="6h",
        start=datetime(2024, 1, 25),
        end=datetime(2024, 1, 30),
        tiebreakers=["event_id"],
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        F.round("value", 6).alias("rate_value"),
    )


@register(
    "promql_sliding_window_aggs",
    oracle="""
WITH samples AS (
  SELECT event_type AS name, value, ts FROM events
  WHERE ts >= TIMESTAMP '2024-01-24 12:00:00'
    AND ts <  TIMESTAMP '2024-01-30 00:00:00'
), grid AS (
  SELECT TIMESTAMP '2024-01-25 00:00:00' + range * INTERVAL 6 HOUR AS t
  FROM range(0, 21)
), joined AS (
  SELECT s.name, g.t, s.value
  FROM samples s JOIN grid g
    ON s.ts >= g.t - INTERVAL 12 HOUR AND s.ts < g.t
)
SELECT name, t AS bucket_start,
       round(sum(value), 4) AS sliding_sum,
       CAST(count(*) AS BIGINT) AS sliding_count,
       round(sum(value) / count(*), 6) AS sliding_avg,
       round(greatest(sum(value * value) / count(*)
                      - (sum(value) / count(*)) * (sum(value) / count(*)), 0.0),
             4) AS sliding_stdvar
FROM joined GROUP BY name, t
""",
)
def promql_sliding_window_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY sum/count/avg/stdvar_over_time: the sliding 12h
    window evaluated at every 6h grid step — the moving-window pattern
    the tumbling stream mode can't express (executor-wired for
    `sum_over_time(m[12h])` config rows in range mode). ONE
    agg="stats" pass materializes the shared (Σv, Σv², n) state and all
    four outputs project from it — no per-agg re-aggregation, no joins.
    The oracle replays the sliding windows via a time-range join."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    out = promql.agg_over_time_range(
        samples,
        frame="12h",
        step="6h",
        start=datetime(2024, 1, 25),
        end=datetime(2024, 1, 30),
        agg="stats",
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        F.round(F.col("value.vsum"), 4).alias("sliding_sum"),
        F.col("value.vcount").alias("sliding_count"),
        F.round(F.col("value.vsum") / F.col("value.vcount"), 6).alias(
            "sliding_avg"
        ),
        F.round(F.col("value.vstdvar"), 4).alias("sliding_stdvar"),
    )


@register(
    "promql_sliding_extremes",
    oracle="""
WITH samples AS (
  SELECT event_type AS name, value, ts, event_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-24 12:00:00'
    AND ts <  TIMESTAMP '2024-01-30 00:00:00'
), grid AS (
  SELECT TIMESTAMP '2024-01-25 00:00:00' + range * INTERVAL 6 HOUR AS t
  FROM range(0, 21)
), joined AS (
  SELECT s.name, g.t, s.value, s.ts, s.event_id
  FROM samples s JOIN grid g
    ON s.ts >= g.t - INTERVAL 12 HOUR AND s.ts < g.t
), lastv AS (
  SELECT name, t, value AS vlast FROM (
    SELECT name, t, value,
           row_number() OVER (
             PARTITION BY name, t ORDER BY ts DESC, event_id DESC) AS rn
    FROM joined) WHERE rn = 1
), firstv AS (
  SELECT name, t, value AS vfirst FROM (
    SELECT name, t, value,
           row_number() OVER (
             PARTITION BY name, t ORDER BY ts ASC, event_id ASC) AS rn
    FROM joined) WHERE rn = 1
)
SELECT j.name, j.t AS bucket_start,
       max(j.value) AS vmax, min(j.value) AS vmin,
       any_value(l.vlast) AS vlast, any_value(f.vfirst) AS vfirst
FROM joined j
JOIN lastv l ON l.name = j.name AND l.t = j.t
JOIN firstv f ON f.name = j.name AND f.t = j.t
GROUP BY j.name, j.t
""",
)
def promql_sliding_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY max/min_over_time via the SCALE strategy (two-phase
    bucket decomposition, forced here so the oracle validates it, not
    the explode fallback): per-(series, step-bucket) extremes, then a
    densified RANGE-window over bucket values — O(samples + output) at
    any frame/step ratio, the non-invertible-aggregate counterpart to
    the difference-array family. Executor-wired for
    `max_over_time(m[12h])` range configs."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    out = promql.extrema_over_time_range(
        samples,
        frame="12h",
        step="6h",
        start=datetime(2024, 1, 25),
        end=datetime(2024, 1, 30),
        method="buckets",
        tiebreakers=["event_id"],
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        "vmax",
        "vmin",
        "vlast",
        "vfirst",
    )


@register(
    "promql_sliding_quantile",
    oracle="""
WITH samples AS (
  SELECT event_type AS name, value, ts FROM events
  WHERE ts >= TIMESTAMP '2024-01-24 12:00:00'
    AND ts <  TIMESTAMP '2024-01-30 00:00:00'
), grid AS (
  SELECT TIMESTAMP '2024-01-25 00:00:00' + range * INTERVAL 6 HOUR AS t
  FROM range(0, 21)
), joined AS (
  SELECT s.name, g.t,
         least(63, greatest(0, CAST(floor((s.value - 0.0) / 7.8125) AS INT))) AS vbin
  FROM samples s JOIN grid g
    ON s.ts >= g.t - INTERVAL 12 HOUR AND s.ts < g.t
), counts AS (
  SELECT name, t, vbin, count(*) AS c FROM joined GROUP BY name, t, vbin
), cums AS (
  SELECT name, t, vbin, c,
         sum(c) OVER (PARTITION BY name, t ORDER BY vbin) AS cum,
         sum(c) OVER (PARTITION BY name, t) AS n
  FROM counts
), hit AS (
  SELECT name, t, vbin, c, cum, n,
         row_number() OVER (PARTITION BY name, t ORDER BY vbin) AS rn
  FROM cums WHERE cum >= ceil(0.9 * n)
)
SELECT name, t AS bucket_start,
       CAST(n AS BIGINT) AS n_values,
       round(0.0 + CAST(vbin AS DOUBLE) * 7.8125
             + 7.8125 * CAST(ceil(0.9 * n) - (cum - c) AS DOUBLE)
               / CAST(c AS DOUBLE), 6) AS q_estimate
FROM hit WHERE rn = 1
""",
)
def promql_sliding_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY sliding q90 via bucketed histograms — quantiles
    neither invert (no difference array) nor compose (no
    max-of-maxes), so the sliding family's third technique: reduce
    samples to (series, step-bucket, value-bin) counts once, then only
    BUCKET rows fan onto the grid. Within one bin width (500/64 ≈ 7.8)
    of the exact sliding quantile; deterministic, so the oracle
    hash-matches the estimate itself."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    out = promql.quantile_sketch_over_time_range(
        samples,
        frame="12h",
        step="6h",
        start=datetime(2024, 1, 25),
        end=datetime(2024, 1, 30),
        q=0.9,
        bins=64,
        lo=0.0,
        hi=500.0,
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        "n_values",
        "q_estimate",
    )


@register(
    "promql_sliding_changes",
    oracle="""
WITH samples AS (
  SELECT event_type AS name, value, ts, event_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-24 12:00:00'
    AND ts <  TIMESTAMP '2024-01-30 00:00:00'
), grid AS (
  SELECT TIMESTAMP '2024-01-25 00:00:00' + range * INTERVAL 6 HOUR AS t
  FROM range(0, 21)
), joined AS (
  SELECT s.name, g.t, s.value, s.ts, s.event_id
  FROM samples s JOIN grid g
    ON s.ts >= g.t - INTERVAL 12 HOUR AND s.ts < g.t
), paired AS (
  SELECT name, t, value,
         lag(value) OVER (PARTITION BY name, t ORDER BY ts, event_id) AS prev
  FROM joined
)
SELECT name, t AS bucket_start,
       CAST(sum(CASE WHEN prev IS NOT NULL AND value <> prev
                     THEN 1 ELSE 0 END) AS DOUBLE) AS n_changes,
       CAST(sum(CASE WHEN prev IS NOT NULL AND value < prev
                     THEN 1 ELSE 0 END) AS DOUBLE) AS n_resets
FROM paired GROUP BY name, t
HAVING count(prev) >= 1
""",
)
def promql_sliding_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY changes/resets: consecutive-pair counts over the
    sliding 12h window at every 6h step — the volatility/restart
    moving-window form. Pairs are difference-arrayable (a pair covers a
    contiguous grid run → ±1 events), so the wide-ratio cost is
    O(pairs + output) like the rest of the sliding family;
    executor-wired for `changes(m[12h])` range configs."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    kw = dict(
        frame="12h",
        step="6h",
        start=datetime(2024, 1, 25),
        end=datetime(2024, 1, 30),
        tiebreakers=["event_id"],
    )
    ch = promql.changes_range(samples, kind="changes", **kw).select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        F.col("value").alias("n_changes"),
    )
    rs = promql.changes_range(samples, kind="resets", **kw).select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        F.col("value").alias("n_resets"),
    )
    return ch.join(rs, ["name", "bucket_start"])


@register(
    "promql_sliding_deriv",
    oracle="""
WITH samples AS (
  SELECT event_type AS name, value,
         epoch(ts) - epoch(TIMESTAMP '2024-01-25 00:00:00') AS x, ts
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-24 12:00:00'
    AND ts <  TIMESTAMP '2024-01-30 00:00:00'
), grid AS (
  SELECT TIMESTAMP '2024-01-25 00:00:00' + range * INTERVAL 6 HOUR AS t
  FROM range(0, 21)
), joined AS (
  SELECT s.name, g.t, s.value, s.x,
         epoch(g.t) - epoch(TIMESTAMP '2024-01-25 00:00:00') AS gx
  FROM samples s JOIN grid g
    ON s.ts >= g.t - INTERVAL 12 HOUR AND s.ts < g.t
), moments AS (
  SELECT name, t, any_value(gx) AS gx, count(*) AS n,
         sum(x) AS sx, sum(value) AS sv,
         sum(x * value) AS sxv, sum(x * x) AS sxx
  FROM joined GROUP BY name, t
)
SELECT name, t AS bucket_start,
       round((n * sxv - sx * sv) / (n * sxx - sx * sx), 6) AS deriv,
       round(sv / n + ((n * sxv - sx * sv) / (n * sxx - sx * sx))
                      * (gx - sx / n + 600.0), 4) AS predicted_10m
FROM moments
WHERE n >= 2 AND n * sxx - sx * sx > 0
""",
)
def promql_sliding_deriv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY deriv + predict_linear(10m): the least-squares line
    over each sliding 12h window at every 6h step. The five regression
    moments are plain sums — difference-arrayable like the rest of the
    family — with the time coordinate CENTERED at range start (epoch
    seconds would lose the slope to subtractive cancellation). The
    oracle replays the identical centered-sums algebra."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    kw = dict(
        frame="12h",
        step="6h",
        start=datetime(2024, 1, 25),
        end=datetime(2024, 1, 30),
    )
    d = promql.regression_range(samples, predict_offset=None, **kw).select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        F.round("value", 6).alias("deriv"),
    )
    p = promql.regression_range(samples, predict_offset=600.0, **kw).select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        F.round("value", 4).alias("predicted_10m"),
    )
    return d.join(p, ["name", "bucket_start"])


@register(
    "promql_rate_range_wide",
    oracle="""
WITH samples AS (
  SELECT event_type AS name, value, ts, event_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
    AND ts <  TIMESTAMP '2024-01-27 00:00:00'
), grid AS (
  SELECT TIMESTAMP '2024-01-26 00:00:00' + range * INTERVAL 5 MINUTE AS t
  FROM range(0, 289)
), joined AS (
  SELECT s.name, g.t, s.value, s.ts, s.event_id
  FROM samples s JOIN grid g
    ON s.ts >= g.t - INTERVAL 24 HOUR AND s.ts < g.t
), contrib AS (
  SELECT name, t, value,
         value - lag(value) OVER (
           PARTITION BY name, t ORDER BY ts, event_id) AS d
  FROM joined
)
SELECT name, t AS bucket_start,
       round(sum(round(CASE WHEN d IS NULL THEN 0
                            WHEN d < 0 THEN value ELSE d END * 1000000))
             / 1000000.0 / 86400, 6) AS rate_value
FROM contrib
GROUP BY name, t
HAVING count(d) >= 1
""",
)
def promql_rate_range_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY rate at a WIDE frame/step ratio — rate(m[24h]) every
    5 minutes (ratio 288, the flagship's 24h/1m shape at 1/5 density).
    Auto-dispatches to the difference-array ``events`` strategy: pair
    contributions computed once per series, ± events at each pair's
    contiguous grid-run edges, per-series running sum, segment fill —
    intermediate volume O(pairs + output), NOT samples × 288. The oracle
    replays the naive sliding windows via a time-range join (DuckDB can
    afford the amplification at gate scale; the engine must not).
    quantize=1e-6 makes window sums exact integer multiples, so the
    running-sum strategy, the naive windows, and DuckDB agree bit-for-
    bit regardless of summation order (a raw double cumsum sat within
    1e-9 of a round-6 boundary at sf0.01 and flipped the hash)."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    out = promql.rate_range(
        samples,
        frame="24h",
        step="5m",
        start=datetime(2024, 1, 26),
        end=datetime(2024, 1, 27),
        tiebreakers=["event_id"],
        quantize=1e-6,
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        F.round("value", 6).alias("rate_value"),
    )


@register(
    "promql_delta_range",
    oracle="""
WITH samples AS (
  SELECT event_type AS name, value, ts, event_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
    AND ts <  TIMESTAMP '2024-01-28 00:00:00'
), grid AS (
  SELECT TIMESTAMP '2024-01-26 00:00:00' + range * INTERVAL 2 HOUR AS t
  FROM range(0, 25)
), joined AS (
  SELECT s.name, g.t, s.value, s.ts, s.event_id
  FROM samples s JOIN grid g
    ON s.ts >= g.t - INTERVAL 24 HOUR AND s.ts < g.t
), w AS (
  SELECT name, t, value,
         row_number() OVER (PARTITION BY name, t ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY name, t ORDER BY ts DESC, event_id DESC) AS rl,
         count(*) OVER (PARTITION BY name, t) AS n
  FROM joined
)
SELECT name, t AS bucket_start,
       round(max(CASE WHEN rl = 1 THEN value END)
             - max(CASE WHEN rf = 1 THEN value END), 6) AS delta_value
FROM w WHERE n >= 2 GROUP BY name, t
""",
)
def promql_delta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY delta: delta(m[24h]) every 2 hours over two days —
    gauge change per sliding window. Ratio 12 keeps the explode strategy,
    whose per-window last − first is ONE exact subtraction (max_by/min_by
    on the sample order) — the oracle computes the identical pair. The
    telescoping events strategy is unit-verified equal at wide ratios."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    out = promql.delta_range(
        samples,
        frame="24h",
        step="2h",
        start=datetime(2024, 1, 26),
        end=datetime(2024, 1, 28),
        tiebreakers=["event_id"],
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        "bucket_start",
        F.round("value", 6).alias("delta_value"),
    )


@register(
    "promql_limit_ops",
    oracle="""
WITH windowed AS (
  SELECT event_type AS name, json_extract_string(props, '$.k') AS k,
         value, ts,
         row_number() OVER (
           PARTITION BY event_type, json_extract_string(props, '$.k')
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE ts <= TIMESTAMP '2024-01-30 12:00:00'
    AND ts > TIMESTAMP '2024-01-30 06:00:00'
), vec AS (
  -- coalesce matches schema.series_key: a NULL label value renders as ''
  -- (plain || would NULL the whole key, dropping NULL-k series from the
  -- ratio and sorting them opposite the engine in limitk)
  SELECT name, k, value,
         'k' || chr(31) || coalesce(k, '') || chr(30)
             || 'name' || chr(31) || name AS skey
  FROM windowed WHERE rn = 1
), kept AS (
  SELECT name, k, value, 'limitk' AS op FROM vec
  ORDER BY skey LIMIT 7
), ratio AS (
  SELECT name, k, value, 'ratio' AS op FROM vec
  WHERE substr(md5(skey), 1, 8) < printf('%08x', CAST(floor(0.25 * 4294967296) AS BIGINT))
)
SELECT * FROM kept UNION ALL SELECT * FROM ratio
""",
)
def promql_limit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """limitk + limit_ratio (experimental PromQL, DOCUMENTED-deterministic
    semantics): k smallest canonical series keys / md5-position series
    sample. The oracle rebuilds the exact series-key string (sorted
    entries joined with the unit/record separators) so both the pick and
    the hash sampling are verified, not just row counts."""
    samples = _event_samples(spark, sf_dir, keys=("name", "k"))
    vec = promql.instant_selector(
        samples, None, datetime(2024, 1, 30, 12, 0, 0),
        staleness="6 hours", tiebreakers=["event_id"],
    )
    def shape(df, op):
        return df.select(
            F.element_at("labels", "name").alias("name"),
            F.element_at("labels", "k").alias("k"),
            "value",
            F.lit(op).alias("op"),
        )
    return shape(promql.limitk(vec, 7), "limitk").unionByName(
        shape(promql.limit_ratio(vec, 0.25), "ratio")
    )


@register(
    "promql_mad_over_time",
    oracle="""
WITH resampled AS (
  SELECT event_type AS name, date_trunc('hour', ts) AS bucket, value,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), stepped AS (
  SELECT name, bucket, value FROM resampled WHERE rn = 1
), med AS (
  SELECT name, median(value) AS m FROM stepped GROUP BY name
)
SELECT s.name, round(median(abs(s.value - med.m)), 4) AS mad_value
FROM stepped s JOIN med USING (name)
GROUP BY s.name
""",
)
def promql_mad_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mad_over_time (PromQL experimental): median absolute deviation of
    the step-aligned frame — the robust anomaly signal. Two hash aggs +
    a series-co-partitioned join (one shuffle partitioning reused)."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    stepped = promql.resample(samples, "1 hour", tiebreakers=["event_id"])
    out = promql.mad_over_time(stepped)
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.round("value", 4).alias("mad_value"),
    )


@register(
    "promql_label_replace",
    oracle="""
SELECT 'd' || substr(json_extract_string(props, '$.k'), 1, 1) AS k_dec,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1
""",
)
def promql_label_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_replace(x, "k_dec", "d$1", "k", "(\\d)\\d*") then
    sum by (k_dec) — regex-derived label, pure map expressions."""
    samples = _event_samples(spark, sf_dir, keys=("name", "k"))
    replaced = promql.label_replace(samples, "k_dec", "d$1", "k", r"(\d)\d*")
    out = promql.sum_by(replaced, ["k_dec"])
    return out.select(
        F.element_at("labels", "k_dec").alias("k_dec"),
        F.round("value", 4).alias("sum_value"),
    )


@register(
    "promql_label_join",
    oracle="""
SELECT event_type || '-' || json_extract_string(props, '$.k') AS nk,
       CAST(count(*) AS DOUBLE) AS cnt
FROM events GROUP BY 1
""",
)
def promql_label_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_join(x, "nk", "-", name, k) then count by (nk)."""
    samples = _event_samples(spark, sf_dir, keys=("name", "k"))
    joined = promql.label_join(samples, "nk", "-", ["name", "k"])
    out = promql.group_by_labels(
        joined, F.count(F.lit(1)).cast("double"), by=["nk"]
    )
    return out.select(
        F.element_at("labels", "nk").alias("nk"),
        F.col("value").alias("cnt"),
    )


@register(
    "promql_offset",
    oracle="""
SELECT event_type AS name, round(sum(value), 4) AS sum_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-19 00:00:00'
  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
GROUP BY event_type
""",
)
def promql_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum by (name) (x offset 1d) evaluated over [2024-01-20, 01-21):
    the offset shifts the read window one day back."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    shifted = promql.offset(samples, "1 DAY")
    windowed = shifted.where(
        (F.col("timestamp") >= F.lit(datetime(2024, 1, 20)))
        & (F.col("timestamp") < F.lit(datetime(2024, 1, 21)))
    )
    out = promql.sum_by(windowed, ["name"])
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.round("value", 4).alias("sum_value"),
    )


@register(
    "promql_delta",
    oracle="""
SELECT event_type AS name, json_extract_string(props, '$.k') AS k,
       round(arg_max(value, ts) - arg_min(value, ts), 4) AS value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
GROUP BY 1, 2
""",
)
def promql_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gauge delta(x[10d]): last minus first per series — max_by/min_by on
    the primitive timestamp, one HashAggregate (non-extrapolated; see
    ``promql.delta``)."""
    out = promql.delta(
        _event_samples(spark, sf_dir, keys=("name", "k")),
        frame_start=datetime(2024, 1, 10),
        frame_end=datetime(2024, 1, 20),
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.round("value", 4).alias("value"),
    )


@register(
    "promql_deriv",
    oracle="""
WITH s AS (
  SELECT event_type AS name, json_extract_string(props, '$.k') AS k,
         epoch(ts) - epoch(TIMESTAMP '2024-01-10 00:00:00') AS t, value
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    AND ts <  TIMESTAMP '2024-01-20 00:00:00'
)
SELECT name, k,
       round(covar_pop(t, value) / var_pop(t) * 3600, 4) AS slope_per_hour
FROM s GROUP BY name, k
HAVING count(*) >= 2 AND var_pop(t) > 0
""",
)
def promql_deriv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deriv(x[10d]): per-series least-squares slope (×3600 → per-hour,
    keeping the rounded magnitude meaningful). Four moments, one hash
    aggregation; times centered on the frame start for conditioning."""
    out = promql.deriv(
        _event_samples(spark, sf_dir, keys=("name", "k")),
        frame_start=datetime(2024, 1, 10),
        frame_end=datetime(2024, 1, 20),
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.round(F.col("value") * 3600, 4).alias("slope_per_hour"),
    )


@register(
    "promql_predict_linear",
    oracle="""
WITH s AS (
  SELECT event_type AS name, json_extract_string(props, '$.k') AS k,
         epoch(ts) - epoch(TIMESTAMP '2024-01-10 00:00:00') AS t, value
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    AND ts <  TIMESTAMP '2024-01-20 00:00:00'
)
SELECT name, k,
       round(avg(value) + covar_pop(t, value) / var_pop(t)
             * (864000.0 + 21600.0 - avg(t)), 4) AS predicted
FROM s GROUP BY name, k
HAVING count(*) >= 2 AND var_pop(t) > 0
""",
)
def promql_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """predict_linear(x[10d], 6h): extrapolate each series' least-squares
    line 6 hours past the frame end."""
    out = promql.predict_linear(
        _event_samples(spark, sf_dir, keys=("name", "k")),
        21600.0,
        frame_start=datetime(2024, 1, 10),
        frame_end=datetime(2024, 1, 20),
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.round("value", 4).alias("predicted"),
    )


HISTOGRAM_BOUNDS = [25.0, 50.0, 100.0, 200.0, float("inf")]


def _cumulative_le_buckets(ev: DataFrame) -> DataFrame:
    """Classic cumulative le-bucket counts per event_type from raw
    events: one row per (name, le ∈ HISTOGRAM_BOUNDS) counting values
    ≤ le. The ONE shared derivation for the histogram_quantile /
    histogram_fraction / parsed-fraction queries — bounds handling and
    the le format live here so the three can never desynchronize."""
    return (
        ev.select(
            F.col("event_type").alias("name"),
            F.explode(F.array(*[F.lit(b) for b in HISTOGRAM_BOUNDS])).alias("le"),
            "value",
        )
        .where(F.col("value") <= F.col("le"))
        .groupBy("name", "le")
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
    )


@register(
    "promql_histogram_quantile",
    oracle="""
WITH b AS (
  SELECT event_type AS name, t.le AS le, CAST(count(*) AS DOUBLE) AS cum
  FROM events,
       (SELECT unnest([25.0, 50.0, 100.0, 200.0, CAST('inf' AS DOUBLE)]) AS le) t
  WHERE value <= t.le
  GROUP BY 1, 2
), w AS (
  SELECT name, le, cum,
         lag(cum) OVER (PARTITION BY name ORDER BY le) AS prev_cum,
         lag(le) OVER (PARTITION BY name ORDER BY le) AS prev_le,
         0.9 * max(cum) OVER (PARTITION BY name) AS target
  FROM b
)
SELECT name,
       round(CASE WHEN isinf(le) THEN prev_le
             ELSE coalesce(prev_le, 0) + (le - coalesce(prev_le, 0))
                  * (target - coalesce(prev_cum, 0))
                  / (cum - coalesce(prev_cum, 0)) END, 4) AS q90
FROM w
WHERE cum >= target AND (prev_cum IS NULL OR prev_cum < target)
""",
)
def promql_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_quantile(0.9, x): classic cumulative le-bucket
    interpolation. The bucket series are built from raw events in-query
    (explode of the bound list + a cumulative count per (name, le)) so
    Spark and the oracle derive identical histograms, then the crossing
    bucket is found and interpolated per histogram."""
    ev = _events(spark, sf_dir)
    buckets = _cumulative_le_buckets(ev).select(
        F.create_map(
            F.lit("name"), F.col("name"),
            F.lit("le"), F.col("le").cast("string"),
        ).alias("labels"),
        "value",
    )
    out = promql.histogram_quantile(buckets, 0.9)
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.round("value", 4).alias("q90"),
    )


@register(
    "promql_histogram_fraction",
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
              - max(CASE WHEN x = 50.0 THEN ic END)) / max(total), 6) AS frac
FROM c GROUP BY name
""",
)
def promql_histogram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_fraction(50, 150, x): estimated fraction of observations
    in (50, 150] from the same in-query cumulative le-buckets the
    quantile query builds — interpolated cum at both probe bounds,
    differenced, divided by the total. The oracle replays the identical
    interpolation algebra."""
    ev = _events(spark, sf_dir)
    buckets = _cumulative_le_buckets(ev).select(
        F.create_map(
            F.lit("name"), F.col("name"),
            F.lit("le"), F.col("le").cast("string"),
        ).alias("labels"),
        "value",
    )
    out = promql.histogram_fraction(buckets, 50.0, 150.0)
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.round("value", 6).alias("frac"),
    )


@register(
    "promql_topk_over_time",
    oracle="""
WITH resampled AS (
  SELECT event_type AS name, json_extract_string(props, '$.k') AS k,
         date_trunc('hour', ts) AS bucket, value,
         row_number() OVER (
           PARTITION BY event_type, json_extract_string(props, '$.k'),
                        date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), daily AS (
  SELECT name, k, CAST(date_trunc('day', bucket) AS TIMESTAMP) AS bucket_start,
         sum(value) AS v
  FROM resampled WHERE rn = 1 GROUP BY 1, 2, 3
), ranked AS (
  SELECT name, k, bucket_start, v,
         row_number() OVER (
           PARTITION BY bucket_start ORDER BY v DESC, k, name) AS rnk
  FROM daily
)
SELECT name, k, bucket_start, round(v, 4) AS sum_value, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def promql_topk_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topk(3) PER DAY by summed hourly step values — which series
    dominated each day. The rank window sorts series-per-day AGGREGATES
    (cardinality-bounded), never raw samples. Tie-break on the series
    ENTRIES ARRAY (elementwise: label key, then value) — for these
    two-label series that is exactly the oracle's (k, name) tiebreak,
    including prefix-related values like '1' vs '10'."""
    samples = _event_samples(spark, sf_dir, keys=("name", "k"))
    stepped = promql.resample(samples, "1 hour", tiebreakers=["event_id"])
    out = promql.topk_over_time(stepped, 3)
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        "bucket_start",
        F.round("value", 4).alias("sum_value"),
        "rnk",
    )


@register(
    "promql_ts_of_extremes",
    oracle="""
WITH resampled AS (
  SELECT event_type AS name, date_trunc('hour', ts) AS bucket, value,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), s AS (SELECT name, bucket, value FROM resampled WHERE rn = 1),
mx AS (
  SELECT name, bucket,
         row_number() OVER (PARTITION BY name ORDER BY value DESC, bucket DESC) AS r
  FROM s
), mn AS (
  SELECT name, bucket,
         row_number() OVER (PARTITION BY name ORDER BY value ASC, bucket DESC) AS r
  FROM s
)
SELECT mx.name,
       CAST(epoch(mx.bucket) AS DOUBLE) AS ts_max,
       CAST(epoch(mn.bucket) AS DOUBLE) AS ts_min
FROM mx JOIN mn ON mn.name = mx.name AND mn.r = 1
WHERE mx.r = 1
""",
)
def promql_ts_of_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_of_max_over_time / ts_of_min_over_time (PromQL 3.x): WHEN each
    series hit its frame extreme, not just what it was — one struct agg
    carrying both argmax-by-(value, bucket) keys, single shuffle. Ties
    break to the latest bucket (deterministic where Prometheus is not)."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    stepped = promql.resample(samples, "1 hour", tiebreakers=["event_id"])
    from prom_etl_db_spark.schema import epoch_seconds as _es

    out = promql.agg_over_time(
        stepped,
        F.struct(
            _es(
                F.max_by(
                    "bucket_start",
                    F.struct(F.col("value"), F.col("bucket_start")),
                ).cast("timestamp")
            ).alias("tmax"),
            _es(
                F.max_by(
                    "bucket_start",
                    F.struct(-F.col("value"), F.col("bucket_start")),
                ).cast("timestamp")
            ).alias("tmin"),
        ),
    )
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.col("value.tmax").alias("ts_max"),
        F.col("value.tmin").alias("ts_min"),
    )


@register(
    "promql_clamp",
    oracle="""
SELECT event_type AS name,
       round(sum(least(greatest(value, 10.0), 100.0)), 4) AS clamped_sum
FROM events GROUP BY event_type
""",
)
def promql_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum by (name) (clamp(x, 10, 100)) — elementwise clamp, no extra
    shuffle."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    out = promql.sum_by(promql.clamp(samples, 10.0, 100.0), ["name"])
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.round("value", 4).alias("clamped_sum"),
    )


@register(
    "promql_absent",
    oracle="""
SELECT CAST(1.0 AS DOUBLE) AS value
WHERE (SELECT count(*) FROM events WHERE event_type = 'heartbeat') = 0
""",
)
def promql_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """absent(heartbeat): one {1.0} row because no such metric exists —
    a single global count aggregate, never a collect."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    missing = samples.where(F.col("metric_name") == "heartbeat")
    return promql.absent(missing).select("value")


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


