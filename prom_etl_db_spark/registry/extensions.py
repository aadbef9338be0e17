"""Round-3+ additions: sessionization/funnel, histogram_fraction, top-k
over time, paragraph & substring dedup, sketches, PQ/IVF, cube/CDC,
round-4/5 codecs and curation operators."""

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
from prom_etl_db_spark.registry.llm_e import (  # shared oracle CTEs
    _NGRAM_MAX_DF,
    _NGRAM_PAIRS_CTES,
)
from prom_etl_db_spark.registry.llm_media import _KMEANS_CTE  # shared oracle CTE


# =========================================================================
# Round-3 additions: batch sessionization / funnel, histogram_fraction,
# top-k over time, paragraph & substring dedup, Jaccard estimation, Zipf
# stats, perplexity-proxy buckets, int8 embedding quantization.
# =========================================================================


@register(
    "sessionize_events",
    oracle="""
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_no
  FROM s
)
SELECT user_id, session_no,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) AS TIMESTAMP) AS session_end,
       count(*) AS n_events,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1e6 AS duration_s
FROM g GROUP BY 1, 2
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (30-minute inactivity break) — the
    batch dual of the streaming session_window rollup. Two ordered
    windows + one hash agg, all partitioned by user_id."""
    ev = _t(spark, sf_dir, "events")
    return analytics.sessionize(ev, gap="30 minutes")


@register(
    "events_window_funnel",
    oracle="""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
u AS (SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('view', 'click', 'purchase')),
l2 AS (
  SELECT DISTINCT v.user_id FROM v
  JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
        AND c.ts <= v.ts + INTERVAL 7 DAY
), l3 AS (
  SELECT DISTINCT v.user_id FROM v
  JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
        AND c.ts <= v.ts + INTERVAL 7 DAY
  JOIN p ON p.user_id = v.user_id AND p.ts > c.ts
        AND p.ts <= v.ts + INTERVAL 7 DAY
)
SELECT u.user_id,
       CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
                 WHEN l2.user_id IS NOT NULL THEN 2
                 WHEN v1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS funnel_level
FROM u
LEFT JOIN l3 ON l3.user_id = u.user_id
LEFT JOIN l2 ON l2.user_id = u.user_id
LEFT JOIN (SELECT DISTINCT user_id FROM v) v1 ON v1.user_id = u.user_id
""",
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel(view -> click -> purchase, 7d): deepest strictly-
    ordered chain per user whose span fits the window. The engine runs a
    single-shuffle sorted-fold DP (latest-chain-start dominance — see
    analytics.funnel_levels); the oracle proves the exact same semantics
    via the naive EXISTS-chain join formulation."""
    ev = _t(spark, sf_dir, "events")
    return analytics.funnel_levels(
        ev, ["view", "click", "purchase"], window="7d"
    )


@register(
    "doc_paragraph_dedup",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), ch AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx,
         md5(array_to_string(w[(i-1)*20+1:(i-1)*20+20], ' ')) AS h,
         CAST(ceil(len(w) / 20.0) AS BIGINT) AS n_chunks
  FROM (SELECT doc_id, w,
               unnest(range(1, CAST(ceil(len(w) / 20.0) AS BIGINT) + 1)) AS i
        FROM tok WHERE len(w) > 0)
), win AS (
  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
  FROM ch
)
SELECT doc_id, max(n_chunks) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks
FROM win GROUP BY doc_id
""",
)
def doc_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granular exact dedup (RefinedWeb recipe; fixed 20-token
    chunks stand in for paragraphs): each distinct chunk keeps its first
    (doc_id, idx) occurrence; per-doc kept/total counts are the dedup
    mask a rewrite pass would apply."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.paragraph_dedup_stats(docs, chunk_tokens=20)


@register(
    "doc_paragraph_dedup_rewrite",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), ch AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx,
         array_to_string(w[(i-1)*20+1:(i-1)*20+20], ' ') AS chunk
  FROM (SELECT doc_id, w,
               unnest(range(1, CAST(ceil(len(w) / 20.0) AS BIGINT) + 1)) AS i
        FROM tok WHERE len(w) > 0)
), win AS (
  SELECT *, row_number() OVER (
    PARTITION BY md5(chunk) ORDER BY doc_id, idx) AS rn
  FROM ch
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                           ORDER BY idx), '') AS clean_text
FROM win GROUP BY doc_id
""",
)
def doc_paragraph_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rewrite half of paragraph dedup: documents reassembled from
    only their surviving chunks, in order — the actual corpus-cleaning
    output (stats tell you the cut; this IS the cut). Fully-duplicated
    docs come back empty rather than vanishing (dropping is policy)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.paragraph_dedup_rewrite(docs, chunk_tokens=20)


@register(
    "doc_exact_substring_dups",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t <> '') AS w
  FROM documents
), g AS (
  SELECT doc_id, md5(array_to_string(w[i:i+19], ' ')) AS h
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 18)) AS i
        FROM tok WHERE len(w) >= 20)
), c AS (
  SELECT h, count(*) AS c FROM g GROUP BY h
)
SELECT g.doc_id, count(*) AS n_spans,
       CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans
FROM g JOIN c USING (h) GROUP BY g.doc_id
""",
)
def doc_exact_substring_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication signal (Lee et al. suffix dedup at
    fixed 20-token granularity): sliding-window hashes with global
    occurrence counts; a span occurring anywhere else marks every
    occurrence. The per-doc dup fraction is the cut mask."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.duplicated_span_stats(docs, span_tokens=20)


@register(
    "doc_zipf_token_stats",
    oracle=r"""
WITH t AS (
  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> x <> '')) AS token
  FROM documents
), c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token)
SELECT token,
       CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank,
       cnt
FROM c ORDER BY cnt DESC, token LIMIT 20
""",
)
def doc_zipf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head (Zipf curve): top-20 tokens by frequency
    with rank — TakeOrderedAndProject global top-N, rank window over 20
    rows only."""
    docs = _t(spark, sf_dir, "documents")
    return text.zipf_token_stats(docs, top=20)


@register(
    "doc_ccnet_perplexity_buckets",
    oracle=r"""
WITH s AS (
  SELECT doc_id,
         round(coalesce(list_sum(list_transform(
           list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> ''),
           t -> ((CAST(('0x' || substr(md5(t || 'bow'), 1, 8)) AS BIGINT) % 1024) % 7 - 3)
                / 10.0
         )), 0.0), 6) + 0.0 AS bow_score
  FROM documents
), q AS (
  SELECT quantile_cont(bow_score, 0.333333) AS t1,
         quantile_cont(bow_score, 0.666667) AS t2
  FROM s
)
SELECT CASE WHEN bow_score <= t1 THEN 'head'
            WHEN bow_score <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       round(avg(bow_score), 4) + 0.0 AS avg_score
FROM s, q GROUP BY 1
""",
)
def doc_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing: score every doc with the (proxy)
    language-model score, cut the corpus at its own terciles, and label
    head/middle/tail — the partition CCNet feeds to different training
    mixes. Terciles are computed over the ROUNDED scores so the
    threshold comparison is engine-exact; the 1-row quantile frame
    broadcast-crossJoins (the scalar-subquery shape)."""
    docs = _t(spark, sf_dir, "documents")
    scores = docs.select(
        "doc_id", text.hashed_bow_score(F.col("text")).alias("bow_score")
    )
    q = scores.agg(
        F.percentile("bow_score", 0.333333).alias("t1"),
        F.percentile("bow_score", 0.666667).alias("t2"),
    )
    labeled = scores.crossJoin(F.broadcast(q)).select(
        "bow_score",
        F.when(F.col("bow_score") <= F.col("t1"), "head")
        .when(F.col("bow_score") <= F.col("t2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    return labeled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.avg("bow_score"), 4) + 0.0).alias("avg_score"),
    )


@register(
    "doc_minhash_jaccard_est",
    oracle=f"""
WITH {_NGRAM_PAIRS_CTES},
sig AS (
  SELECT g.doc_id, b.range AS j,
         min(substr(md5(g.gram || '#' || CAST(b.range AS VARCHAR)), 1, 16)) AS mh
  FROM (SELECT id AS doc_id, unnest(shingles) AS gram FROM sh) g
  CROSS JOIN range(16) b
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b, round(p.jaccard, 6) AS jaccard,
       CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS DOUBLE) / 16.0
         AS jacc_est
FROM pairs p
JOIN sig sa ON sa.doc_id = p.id_a
JOIN sig sb ON sb.doc_id = p.id_b AND sb.j = sa.j
GROUP BY p.id_a, p.id_b, p.jaccard
""",
)
def doc_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-estimate vs exact Jaccard, side by side, for every true
    near-dup pair: the signature-match fraction (md5 family, k=16) next
    to the exact shingle Jaccard — the estimator-quality audit a dedup
    rollout runs before trusting LSH at full scale. Signatures join by
    id; only (id, 16-byte) pairs shuffle."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_dup_pairs(
        docs, threshold=0.3, max_shingle_df=_NGRAM_MAX_DF
    )
    sigs = docs.where(dedup.has_min_words(F.col("text"), 3)).select(
        "doc_id",
        dedup.minhash_signature_md5(
            dedup.word_shingles(F.col("text"), 3), 16
        ).alias("sig"),
    )
    est = (
        pairs.join(
            sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa")),
            "id_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round("jaccard", 6).alias("jaccard"),
            (
                F.size(
                    F.filter(
                        F.zip_with(
                            F.col("sa"), F.col("sb"), lambda a, b: a == b
                        ),
                        lambda x: x,
                    )
                ).cast("double")
                / 16.0
            ).alias("jacc_est"),
        )
    )
    return est


@register(
    "embedding_sq8_codes",
    oracle="""
WITH u AS (
  SELECT vec_id, i, CAST(e AS DOUBLE) AS e
  FROM (SELECT vec_id, unnest(embedding) AS e,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
), d AS (SELECT i, min(e) AS mn, max(e) AS mx FROM u GROUP BY i),
codes AS (
  SELECT u.vec_id,
         CASE WHEN d.mx > d.mn
              THEN CAST(round((u.e - d.mn) / (d.mx - d.mn) * 255) AS INT)
              ELSE 0 END AS code
  FROM u JOIN d USING (i)
)
SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
       CAST(min(code) AS INT) AS code_min, CAST(max(code) AS INT) AS code_max
FROM codes GROUP BY vec_id
""",
)
def embedding_sq8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding table (per-dimension
    min/max, code = round(255·normalized)) — the 4× memory lever under
    billion-vector ANN. The d×2 stats collect is broadcast-class; the
    encode is one Column transform. Projected to per-vector code
    sum/min/max so the oracle hash-checks every element through the
    aggregates."""
    emb = _t(spark, sf_dir, "embeddings")
    codes = similarity.quantize_int8(emb)
    return codes.select(
        F.col("id").alias("vec_id"),
        F.aggregate(
            "codes", F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("code_sum"),
        F.array_min("codes").cast("int").alias("code_min"),
        F.array_max("codes").cast("int").alias("code_max"),
    )


def _pq_subspace_cte(j: int, *, ds: int = 32, k: int = 4) -> str:
    """One subspace of the PQ oracle: the ``_KMEANS_CTE`` loop (hash init,
    one update round, 6-dp rounding, ties to lowest cluster) over the
    32-dim slice starting at offset j·32, salted per subspace exactly like
    ``clustering.pq_train``."""
    o = j * ds
    salt = f"kmeans-init-pq{j}"
    return f"""v{j} AS (
  SELECT vec_id,
         list_transform(list_slice(embedding, {o + 1}, {o + ds}),
                        x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
), c0_{j} AS (
  SELECT row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR) || '{salt}'), vec_id
         ) - 1 AS cluster,
         list_transform(vec, x -> round(x, 6)) AS centroid
  FROM v{j}
  ORDER BY md5(CAST(vec_id AS VARCHAR) || '{salt}'), vec_id
  LIMIT {k}
), a0_{j} AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (PARTITION BY v.vec_id
               ORDER BY list_distance(v.vec, c.centroid), c.cluster) AS rn
    FROM v{j} v CROSS JOIN c0_{j} c)
  WHERE rn = 1
), c1_{j} AS (
  SELECT cluster, list(m ORDER BY i) AS centroid FROM (
    SELECT a.cluster, t.i, round(avg(v.vec[t.i]), 6) AS m
    FROM a0_{j} a JOIN v{j} v USING (vec_id)
    CROSS JOIN (SELECT range + 1 AS i FROM range({ds})) t
    GROUP BY a.cluster, t.i)
  GROUP BY cluster
), a1_{j} AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (PARTITION BY v.vec_id
               ORDER BY list_distance(v.vec, c.centroid), c.cluster) AS rn
    FROM v{j} v CROSS JOIN c1_{j} c)
  WHERE rn = 1
)"""


_PQ_CODES_CTE = "WITH " + ",\n".join(_pq_subspace_cte(j) for j in range(2))


@register(
    "embedding_pq_codes",
    oracle=_PQ_CODES_CTE
    + """
SELECT vec_id, a1_0.cluster AS code0, a1_1.cluster AS code1
FROM a1_0 JOIN a1_1 USING (vec_id)
""",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 (product quantization, Jégou et al. TPAMI 2011 — the FAISS
    IVF-PQ compression standard): two 32-dim subspaces, a deterministic
    4-way codebook each (per-subspace-salted hash init, 2 fixed Lloyd
    rounds, 6-dp rounding), every vector encoded as 2 small codes in ONE
    Arrow-batched pass with both centroid matrices closure-captured. The
    oracle replays both per-subspace k-means loops over list slices —
    a hash-match check of the full train+encode path."""
    emb = _t(spark, sf_dir, "embeddings")
    codes = clustering.pq_codes(emb, m=2, k=4, n_iter=2)
    return codes.select(
        F.col("id").alias("vec_id"),
        F.col("codes")[0].cast("long").alias("code0"),
        F.col("codes")[1].cast("long").alias("code1"),
    )


@register(
    "similarity_topk_pq",
    oracle=_PQ_CODES_CTE
    + """,
codes AS (
  SELECT vec_id, a1_0.cluster AS code0, a1_1.cluster AS code1
  FROM a1_0 JOIN a1_1 USING (vec_id)
), q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 10
), t0 AS (
  SELECT q.query_id, c.cluster,
         round(list_sum(list_transform(range(1, 33),
             i -> (q.qv[i] - c.centroid[i]) * (q.qv[i] - c.centroid[i]))), 6) AS t
  FROM q CROSS JOIN c1_0 c
), t1 AS (
  SELECT q.query_id, c.cluster,
         round(list_sum(list_transform(range(1, 33),
             i -> (q.qv[i + 32] - c.centroid[i]) * (q.qv[i + 32] - c.centroid[i]))), 6) AS t
  FROM q CROSS JOIN c1_1 c
), scored AS (
  SELECT t0.query_id, c.vec_id AS neighbor_id, t0.t + t1.t AS adc_dist
  FROM codes c
  JOIN t0 ON t0.cluster = c.code0
  JOIN t1 ON t1.cluster = c.code1 AND t1.query_id = t0.query_id
  WHERE c.vec_id <> t0.query_id
), ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
             ORDER BY adc_dist, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, adc_dist, rank
FROM ranked WHERE rank <= 5
""",
)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 (asymmetric distance computation over PQ codes): top-5 nearest
    corpus vectors per query (vec_id < 10) scored from CODES ONLY — each
    query's m×k squared-L2 lookup table is computed driver-side (table
    entries folded left-to-right then rounded to 6 dp, so both engines
    hold bit-identical doubles) and shipped as a literal; the scan is a
    pure-Column table-lookup fold, no Python and no full vectors in the
    hot path. This is the memory-bound half of IVF-PQ — compose with the
    inverted-list partition pruning of ``cosine_topk_ivf_index`` for the
    100 TB path. adc_dist is the sum of two identically-rounded doubles,
    exact in both engines (no re-round: re-rounding the sum would compare
    round(t0+t1, 6) against a raw double and mismatch at the 9-dp canon)."""
    emb = _t(spark, sf_dir, "embeddings")
    return clustering.pq_adc_topk(
        emb, emb.where(F.col("vec_id") < 10), m=2, k=4, n_iter=2, topk=5
    )


@register(
    "promql_absent_range",
    oracle="""
WITH grid AS (
  SELECT TIMESTAMP '2024-01-29 00:00:00' + range * INTERVAL 30 MINUTE AS t
  FROM range(0, 49)
), present AS (
  SELECT DISTINCT g.t
  FROM events e JOIN grid g
    ON e.ts >= g.t - INTERVAL 15 MINUTE AND e.ts < g.t
  WHERE e.event_type = 'purchase' AND e.value > 450
)
SELECT g.t AS bucket_start, CAST(1 AS DOUBLE) AS value
FROM grid g LEFT JOIN present p ON p.t = g.t
WHERE p.t IS NULL
""",
)
def promql_absent_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY absent_over_time(selector[15m]) every 30 minutes —
    the alerting primitive ("did this metric go silent?") as a sliding
    range query, via ``promql.absent_over_time_range`` (presence is a
    distinct-instant set over the rare matching samples; the tiny grid
    anti-joins against it — O(steps) output; the executor fast-path
    exposes the same operator to PromQL strings). Exact dual of
    present_over_time under the engine-wide half-open [t−frame, t)
    convention (DIVERGENCES.md)."""
    samples = _event_samples(spark, sf_dir, keys=("name",)).where(
        (F.col("metric_name") == "purchase") & (F.col("value") > 450)
    )
    out = promql.absent_over_time_range(
        samples,
        frame="15m",
        step="30m",
        start=datetime(2024, 1, 29),
        end=datetime(2024, 1, 30),
    )
    return out.select(
        F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
        "value",
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter-windowed three-way
    fact join with a broadcast dim — the date slice and the returnflag
    equality both push to their scans, customer and nation broadcast, and
    the top-20 is a TakeOrderedAndProject over the grouped revenue (no
    global sort). The deterministic c_custkey tiebreaker makes the LIMIT
    oracle-safe."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(datetime(1996, 1, 1)))
        & (F.col("o_orderdate") < F.lit(datetime(1996, 4, 1)))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        # per-item cents rounded THEN summed as integers: the sum is
        # order-free and exact, so both engines land on the identical
        # double after /100 — a raw double sum rounded to 2 dp flipped
        # at a .005 boundary between engines (canon-safety checklist)
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                        0,
                    ).cast("long")
                )
                / 100.0
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "corpus_temperature_mix",
    oracle="""
WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
p AS (SELECT lang, n, round(pow(n, 0.7), 9) AS p FROM n),
s AS (SELECT list_sum(list(p ORDER BY lang)) AS s FROM p),
wt AS (SELECT lang, n, round(p / s.s, 9) AS w FROM p CROSS JOIN s),
t AS (SELECT min(n / w) AS total FROM wt),
thr AS (
  -- identity branch for the BINDING stratum (n/w = total), mirroring
  -- mix_by_column: (w*(n/w))/n can round 1 ulp below 1.0 and silently
  -- drop the threshold-edge doc the engine keeps
  SELECT lang,
         CASE WHEN n / w = t.total THEN 'g'
              WHEN least(1.0, (w * t.total) / n) >= 1.0 THEN 'g'
              ELSE printf('%08x', CAST(floor(least(1.0, (w * t.total) / n)
                                             * 4294967296) AS BIGINT))
         END AS thr
  FROM wt CROSS JOIN t
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || 'tmix'), 1, 8) < thr.thr
""",
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling (alpha = 0.7, the XLM-R / mT5 multilingual
    recipe): target language shares proportional to n^alpha — flatter
    than natural frequency, so low-resource languages keep more weight —
    then the same deterministic md5-threshold mixing as
    ``corpus_mix_by_lang``. Cross-engine float discipline: per-language
    pow() results and the derived shares are rounded to 9 dp on BOTH
    engines (libm pow differs in the last ulp between engines), and the
    share normalizer is summed in sorted-language order (DuckDB
    list_sum over an ORDER BY list; Python over sorted keys) so every
    derived threshold is bit-identical. The count pass is skippable at
    100 TB via catalog counts, and the filter is one codegen'd CASE —
    no shuffle, no sample(), no UDF."""
    docs = _t(spark, sf_dir, "documents")
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    p = {lang: round(counts[lang] ** 0.7, 9) for lang in counts}
    s = sum(p[lang] for lang in sorted(p))
    weights = {lang: round(p[lang] / s, 9) for lang in counts}
    mixed = sampling.mix_by_column(
        docs, "lang", weights, "doc_id", salt="tmix", counts=counts
    )
    return mixed.select("doc_id", "lang")


@register(
    "promql_histquant_range",
    oracle="""
WITH grid AS (
  SELECT TIMESTAMP '2024-01-29 00:00:00' + range * INTERVAL 1 HOUR AS t
  FROM range(0, 25)
), b AS (
  SELECT e.event_type AS name, g.t, l.le, CAST(count(*) AS DOUBLE) AS cum
  FROM events e
  JOIN grid g ON e.ts >= g.t - INTERVAL 6 HOUR AND e.ts < g.t
  CROSS JOIN (SELECT unnest([25.0, 50.0, 100.0, 200.0,
                             CAST('inf' AS DOUBLE)]) AS le) l
  WHERE e.value <= l.le
  GROUP BY 1, 2, 3
), w AS (
  SELECT name, t, le, cum,
         lag(cum) OVER (PARTITION BY name, t ORDER BY le) AS prev_cum,
         lag(le) OVER (PARTITION BY name, t ORDER BY le) AS prev_le,
         max(cum) OVER (PARTITION BY name, t) * 0.9 AS target
  FROM b
)
SELECT name, t AS bucket_start,
       round(CASE WHEN isinf(le) THEN prev_le
             ELSE coalesce(prev_le, 0) + (le - coalesce(prev_le, 0))
                  * (target - coalesce(prev_cum, 0))
                  / (cum - coalesce(prev_cum, 0)) END, 4) AS q90
FROM w
WHERE cum >= target AND (prev_cum IS NULL OR prev_cum < target)
""",
)
def promql_histquant_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-QUERY histogram_quantile(0.9, increase(bucket[6h])) at every
    1h step — the single most-used PromQL idiom, as a sliding range
    query. Composition of existing operators: each event fans out to its
    covering cumulative le-buckets (a bounded ≤|bounds| explode), the
    windowed bucket counts ride the per-sample difference-array strategy
    of ``agg_over_time_range`` (O(samples + output) at any frame/step
    ratio — increase of a perfect counter ≡ the window count, and the
    1/frame rate factor cancels inside the quantile), and
    ``histogram_quantile`` runs per grid instant by carrying the instant
    in the label map. The oracle replays the naive sliding windows plus
    the same crossing interpolation."""
    bounds = [25.0, 50.0, 100.0, 200.0, float("inf")]
    ev = _events(spark, sf_dir)
    samples = ev.select(
        F.col("event_type").alias("metric_name"),
        F.explode(
            F.filter(
                F.array(*[F.lit(b) for b in bounds]),
                lambda b: F.col("value") <= b,
            )
        ).alias("__le"),
        F.col("value"),
        F.col("ts").alias("timestamp"),
    ).select(
        "metric_name",
        F.create_map(
            F.lit("name"), F.col("metric_name"),
            F.lit("le"), F.col("__le").cast("string"),
        ).alias("labels"),
        "value",
        "timestamp",
    )
    counts = promql.agg_over_time_range(
        samples,
        agg="count",
        method="events",
        frame="6h",
        step="1h",
        start=datetime(2024, 1, 29),
        end=datetime(2024, 1, 30),
    )
    buckets = counts.select(
        F.map_concat(
            "labels",
            F.create_map(
                F.lit("t"),
                F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss"),
            ),
        ).alias("labels"),
        "value",
    )
    hq = promql.histogram_quantile(buckets, 0.9)
    return hq.select(
        F.element_at("labels", "name").alias("name"),
        F.to_timestamp(F.element_at("labels", "t")).alias("bucket_start"),
        F.round("value", 4).alias("q90"),
    )


@register(
    "similarity_topk_ivfpq",
    oracle=_PQ_CODES_CTE
    + """,
codes AS (
  SELECT vec_id, a1_0.cluster AS code0, a1_1.cluster AS code1
  FROM a1_0 JOIN a1_1 USING (vec_id)
), v AS (
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
), q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 10
), t0 AS (
  SELECT q.query_id, c.cluster,
         round(list_sum(list_transform(range(1, 33),
             i -> (q.qv[i] - c.centroid[i]) * (q.qv[i] - c.centroid[i]))), 6) AS t
  FROM q CROSS JOIN c1_0 c
), t1 AS (
  SELECT q.query_id, c.cluster,
         round(list_sum(list_transform(range(1, 33),
             i -> (q.qv[i + 32] - c.centroid[i]) * (q.qv[i + 32] - c.centroid[i]))), 6) AS t
  FROM q CROSS JOIN c1_1 c
), scored AS (
  SELECT p.query_id, a.neighbor_id, t0.t + t1.t AS adc_dist
  FROM probes p
  JOIN assign a ON a.cid = p.cid
  JOIN codes c ON c.vec_id = a.neighbor_id
  JOIN t0 ON t0.query_id = p.query_id AND t0.cluster = c.code0
  JOIN t1 ON t1.query_id = p.query_id AND t1.cluster = c.code1
  WHERE a.neighbor_id <> p.query_id
), ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
             ORDER BY adc_dist, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, adc_dist, rank
FROM ranked WHERE rank <= 5
""",
)
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 (IVF-PQ, the composed billion-vector serving path): inverted-
    file routing bounds WHICH vectors are scanned (nprobe/num_centroids
    of the corpus), PQ codes bound the BYTES per scanned vector (m small
    ints), ADC scores without touching full precision. One corpus pass
    computes centroid assignment + codes together; queries route
    driver-side and broadcast their probed lists with their m×k tables.
    The oracle replays the ENTIRE composition — both subspace k-means
    loops, the cosine routing with its (cos desc, cid asc) ties, the
    probed-list candidate join, and the table-lookup scoring — so the
    driver hash-checks routing and scoring as one pipeline."""
    emb = _t(spark, sf_dir, "embeddings")
    return clustering.pq_adc_topk_ivf(
        emb,
        emb.where(F.col("vec_id") < 10),
        num_centroids=16,
        nprobe=4,
        m=2,
        k=4,
        n_iter=2,
        topk=5,
    )


@register(
    "events_cohort_retention",
    oracle="""
WITH firstday AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT f.cohort_day,
       datediff('day', f.cohort_day, a.day) AS day_offset,
       count(DISTINCT a.user_id) AS active_users
FROM active a JOIN firstday f USING (user_id)
GROUP BY f.cohort_day, datediff('day', f.cohort_day, a.day)
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the training-data-pipeline twin of
    product analytics' classic: users grouped by first-seen day, activity
    counted per (cohort_day, day_offset). Two hash aggregations (first-day
    per user; distinct user-days) and ONE shuffle join on user_id; output
    is bounded by days² regardless of corpus size, so the matrix is
    broadcast-class even at 100 TB of events. No window functions — min()
    + distinct are both partial-aggregable map-side."""
    ev = _t(spark, sf_dir, "events")
    firstday = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    active = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        active.join(firstday, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


