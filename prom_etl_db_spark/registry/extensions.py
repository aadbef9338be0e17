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
    _KMEANS_CTE,
    _NGRAM_MAX_DF,
    _NGRAM_PAIRS_CTES,
)


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




@register(
    "doc_suffix_array_repeats",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         list_append(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != ''),
                     chr(2) || CAST(doc_id AS VARCHAR)) AS t
  FROM documents WHERE doc_id % 23 = 3
), offs AS (
  SELECT doc_id, t,
         COALESCE(SUM(len(t)) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM toks
), stream AS (
  SELECT off + g.x AS gpos, doc_id, g.x AS pos, t[g.x + 1] AS token
  FROM offs, unnest(range(0, len(t))) AS g(x)
), corpus AS (
  SELECT list(token ORDER BY gpos) AS all_toks FROM stream
), sa AS (
  SELECT s.gpos, s.doc_id, s.pos, c.all_toks[s.gpos + 1 : ] AS suffix
  FROM stream s, corpus c
), ranked AS (
  SELECT gpos, doc_id, pos, suffix,
         row_number() OVER (ORDER BY suffix) - 1 AS sa_rank,
         lag(suffix) OVER (ORDER BY suffix) AS prev_suffix
  FROM sa
), lcps AS (
  SELECT sa_rank, gpos, doc_id, pos,
    CASE WHEN prev_suffix IS NULL THEN 0
         ELSE COALESCE(NULLIF(list_position(
                list_transform(range(1, least(len(suffix), len(prev_suffix)) + 1),
                               i -> suffix[i] IS DISTINCT FROM prev_suffix[i]),
                true), 0) - 1,
              least(len(suffix), len(prev_suffix)))
    END AS lcp_prev
  FROM ranked
)
SELECT CAST(sa_rank AS BIGINT) AS sa_rank, CAST(gpos AS BIGINT) AS gpos,
       doc_id, CAST(pos AS INT) AS pos, CAST(lcp_prev AS BIGINT) AS lcp_prev
FROM lcps
""",
)
def doc_suffix_array_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-ext (r5): DISTRIBUTED SUFFIX ARRAY + LCP over the corpus token
    stream — the real arbitrary-length repeated-substring machinery of
    Lee et al. 2022, upgrading `duplicated_span_stats`' fixed-L
    approximation (the DIVERGENCES.md row). Prefix doubling
    (Karp-Miller-Rosenberg): ⌈log2 n⌉ rounds of equi-join + global
    dense rank (distinct keys → RDD range-partitioned sortBy →
    zipWithIndex — the documented RDD exception for global ordinal
    assignment; no single-partition window anywhere); LCP by binary
    lifting over the kept rank tables (the distributed substitute for
    Kasai's sequential scan); unique per-document sentinel tokens fence
    cross-document phantom matches. The oracle is the DEFINITION, not
    the algorithm: DuckDB materializes every suffix as a token list,
    sorts lexicographically (list order = token order on both engines,
    shorter-prefix-first), and scans for the first mismatch — so the
    driver hash pins every SA entry and every exact LCP value the
    doubling ladder + lifting produce. Gate slice doc_id % 23 = 3
    (~1.3k positions) keeps the ⌈log2 n⌉ iterative rounds inside the
    gate budget; the operator itself takes any corpus
    (`functions/suffix.py` — 100 TB posture in the module docstring).
    Any repeat of any length ℓ surfaces as an SA-adjacent pair with
    lcp_prev ≥ ℓ."""
    from prom_etl_db_spark.functions.suffix import suffix_array_with_lcp

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 23 == 3)
    return suffix_array_with_lcp(docs)


@register(
    "doc_substring_dedup_rewrite",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         list_append(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != ''),
                     chr(2) || CAST(doc_id AS VARCHAR)) AS t
  FROM documents WHERE doc_id % 23 = 3
), offs AS (
  SELECT doc_id, t,
         COALESCE(SUM(len(t)) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM toks
), stream AS (
  SELECT off + g.x AS gpos, doc_id, g.x AS pos, t[g.x + 1] AS token
  FROM offs, unnest(range(0, len(t))) AS g(x)
), corpus AS (
  SELECT list(token ORDER BY gpos) AS all_toks FROM stream
), sa AS (
  SELECT s.gpos, c.all_toks[s.gpos + 1 : ] AS suffix
  FROM stream s, corpus c
), ranked AS (
  SELECT gpos, suffix,
         row_number() OVER (ORDER BY suffix) - 1 AS sa_rank,
         lag(suffix) OVER (ORDER BY suffix) AS prev_suffix
  FROM sa
), lcps AS (
  SELECT gpos,
    CASE WHEN prev_suffix IS NULL THEN 0
         ELSE COALESCE(NULLIF(list_position(
                list_transform(range(1, least(len(suffix), len(prev_suffix)) + 1),
                               i -> suffix[i] IS DISTINCT FROM prev_suffix[i]),
                true), 0) - 1,
              least(len(suffix), len(prev_suffix)))
    END AS lcp_prev
  FROM ranked
), marked AS (
  SELECT DISTINCT m.gpos + g.x AS gpos
  FROM lcps m, unnest(range(0, m.lcp_prev)) AS g(x)
  WHERE m.lcp_prev >= 2
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(m.gpos) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN m.gpos IS NULL THEN s.token END,
                           ' ' ORDER BY s.pos), '') AS kept_text
FROM stream s LEFT JOIN marked m USING (gpos)
WHERE NOT starts_with(s.token, chr(2))
GROUP BY s.doc_id
""",
)
def doc_substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-ext (r5): exact-substring dedup WITH REMOVAL — the operation
    Lee et al. 2022 actually perform — on top of the real suffix array
    (`doc_suffix_array_repeats` is the SA/LCP itself). Every repeated
    span of >= 2 tokens loses all but one kept occurrence (the SA-first
    suffix of each >= L-sharing run; which occurrence survives is an
    implementation choice in the paper too), and each document is
    rewritten without the marked tokens. Marking is one explode +
    DISTINCT over span positions — no windows, embarrassingly parallel
    on top of the SA. The oracle replays the identical marking rule on
    the definitional DuckDB suffix sort and string_agg's the survivors,
    so the driver hash pins the rewritten TEXT of every document plus
    the removal accounting. Same gate slice as the SA query
    (doc_id % 23 = 3)."""
    from prom_etl_db_spark.functions.suffix import substring_dedup_rewrite

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 23 == 3)
    return substring_dedup_rewrite(docs, min_len=2)


@register(
    "audio_flac_decode",
    oracle="""
WITH sig AS (
  SELECT d.doc_id, i.range AS i,
         ((d.doc_id * 7 + 3 * i.range * i.range + 11 * i.range) % 4001)
           - 2000 AS s
  FROM documents d CROSS JOIN range(500) i
  WHERE i.range < 300 + d.doc_id % 200
)
SELECT doc_id AS media_id,
       CAST(300 + doc_id % 200 AS INT) AS n_samples,
       CAST(2 * (300 + doc_id % 200) AS INT) AS n_bytes_raw,
       CAST(sum(s) AS BIGINT) AS ssum,
       CAST(min(s) AS BIGINT) AS smin,
       CAST(max(s) AS BIGINT) AS smax
FROM sig GROUP BY doc_id
""",
)
def audio_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, FLAC — from-scratch LOSSLESS codec (r5): unlike MP3,
    every part of FLAC is formula-defined (fixed polynomial predictors,
    Rice coding with zigzag fold, UTF-8-style coded numbers, CRC-8/16
    with stated polynomials — no numeric tables anywhere), so the full
    static decode path is implemented offline from the spec
    (`functions/flac.py`: STREAMINFO, frame sync + header codes,
    CONSTANT/VERBATIM/FIXED/LPC subframes, wasted bits, 4/5-bit Rice
    partitions with raw escapes, left/right/mid-side decorrelation,
    both CRCs verified). The gate encodes a closed-form integer signal
    per document into real FIXED-order-2 + Rice frames and decodes it
    back; losslessness makes the decoded samples EQUAL the closed form,
    so this SQL oracle recomputes exact integer sums/extrema and one
    hash pins the whole predictor + entropy path bit-for-bit (the G.711
    / MPEG-1-Layer-I verification pattern)."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.flac_roundtrip_features(docs)


@register(
    "neardup_edit_verified",
    oracle=r"""
WITH sh AS (
  SELECT doc_id, text,
         list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS shingles
  FROM (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents)
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
)
SELECT c.id_a, c.id_b,
       CAST(levenshtein(sa.text, sb.text) AS INT) AS edit_dist,
       CAST(greatest(length(sa.text), length(sb.text)) AS INT) AS max_len,
       round(CAST(levenshtein(sa.text, sb.text) AS DOUBLE)
             / greatest(length(sa.text), length(sb.text)), 6) AS edit_ratio
FROM cand c
JOIN sh sa ON sa.doc_id = c.id_a
JOIN sh sb ON sb.doc_id = c.id_b
WHERE levenshtein(sa.text, sb.text)
      <= 0.6 * greatest(length(sa.text), length(sb.text))
""",
)
def neardup_edit_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (r5): candidate-generate / EXACT-VERIFY near-dup with a
    stricter verifier — md5 MinHash banding (the `minhash_band_pairs`
    construction, stage-for-stage SQL-replayable) generates candidates;
    verification is character-level Levenshtein via the JVM built-in,
    which unlike set-Jaccard is order- and multiplicity-sensitive. Both
    engines implement the identical classic DP, so edit_dist is
    INTEGER-exact across the oracle — no rounding convention needed on
    the distance itself. At 100 TB the banding bounds candidate volume
    exactly as the MinHash pipeline; the O(len^2) verify runs only on
    candidates, never all-pairs."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.edit_verified_dup_pairs(
        docs, shingle_n=3, num_hashes=16, bands=4, max_edit_ratio=0.6
    )


@register(
    "audio_au_aiff_decode",
    oracle="""
WITH s AS (
  SELECT d.doc_id, d.doc_id % 64 + 16 AS n, i.range AS i
  FROM documents d CROSS JOIN range(80) i
  WHERE i.range < d.doc_id % 64 + 16
), vals AS (
  SELECT doc_id, n, i,
    -- AU u-law bytes expand through the CCITT formula verbatim
    CASE WHEN ((255 - ((doc_id + 7 * i) % 256)) & 128) != 0
         THEN 132 - ((((255 - ((doc_id + 7 * i) % 256)) & 15) * 8 + 132)
                     * (1 << (((255 - ((doc_id + 7 * i) % 256)) >> 4) & 7)))
         ELSE (((255 - ((doc_id + 7 * i) % 256)) & 15) * 8 + 132)
              * (1 << (((255 - ((doc_id + 7 * i) % 256)) >> 4) & 7)) - 132
    END AS vu,
    -- AIFF PCM closed form (int16 cast wraps nothing: |v| <= 30000)
    ((doc_id * 13 + 17 * i * i) % 60001) - 30000 AS vp
  FROM s
)
SELECT doc_id AS media_id,
       CAST(min(n) AS INT) AS au_n,
       CAST(sum(vu) AS BIGINT) AS au_sum,
       CAST(sum(vu * vu) AS BIGINT) AS au_sumsq,
       CAST(min(n) AS INT) AS aiff_n,
       CAST(sum(vp) AS BIGINT) AS aiff_sum,
       CAST(sum(vp * vp) AS BIGINT) AS aiff_sumsq,
       CAST(8000 + (doc_id % 7) * 1225 AS INT) AS aiff_rate
FROM vals GROUP BY doc_id
""",
)
def audio_au_aiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio containers (r5): AU (Sun/NeXT — six-word big-endian
    header, u-law payload expanded through the same CCITT tables as the
    G.711 WAV path) and AIFF (FORM/COMM/SSND with the sample rate as an
    80-bit IEEE EXTENDED float — 15-bit biased exponent + explicit-
    integer-bit 64-bit mantissa, a formula-defined construct round-
    tripped exactly for every fixture rate including non-powers like
    9225 Hz) complete the classic PCM container family beside WAV and
    FLAC. Per document both files are written from closed forms and
    fully decoded back; every hashed column is decode-derived exact
    integer arithmetic, recomputed verbatim by this oracle."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.au_aiff_roundtrip_features(docs)


@register(
    "curation_pipeline_v2",
    oracle=r"""
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN repeat(
                'the words of that land have been with them and they stay true. ',
                CAST(4 + doc_id % 4 AS INT))
              ELSE text END AS text
  FROM documents WHERE doc_id % 23 = 3
), toks AS (
  SELECT doc_id,
         list_append(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != ''),
                     chr(2) || CAST(doc_id AS VARCHAR)) AS t
  FROM src
), offs AS (
  SELECT doc_id, t,
         COALESCE(SUM(len(t)) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM toks
), stream AS (
  SELECT off + g.x AS gpos, doc_id, g.x AS pos, t[g.x + 1] AS token
  FROM offs, unnest(range(0, len(t))) AS g(x)
), corpus AS (
  SELECT list(token ORDER BY gpos) AS all_toks FROM stream
), sa AS (
  SELECT s.gpos, c.all_toks[s.gpos + 1 : ] AS suffix
  FROM stream s, corpus c
), ranked AS (
  SELECT gpos, suffix,
         lag(suffix) OVER (ORDER BY suffix) AS prev_suffix
  FROM sa
), lcps AS (
  SELECT gpos,
    CASE WHEN prev_suffix IS NULL THEN 0
         ELSE COALESCE(NULLIF(list_position(
                list_transform(range(1, least(len(suffix), len(prev_suffix)) + 1),
                               i -> suffix[i] IS DISTINCT FROM prev_suffix[i]),
                true), 0) - 1,
              least(len(suffix), len(prev_suffix)))
    END AS lcp_prev
  FROM ranked
), marked AS (
  SELECT DISTINCT m.gpos + g.x AS gpos
  FROM lcps m, unnest(range(0, m.lcp_prev)) AS g(x)
  WHERE m.lcp_prev >= 2
), kept AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(m.gpos) AS BIGINT) AS n_removed,
         COALESCE(string_agg(CASE WHEN m.gpos IS NULL THEN s.token END,
                             ' ' ORDER BY s.pos), '') AS kept_text
  FROM stream s LEFT JOIN marked m USING (gpos)
  WHERE NOT starts_with(s.token, chr(2))
  GROUP BY s.doc_id
), gw AS (
  SELECT doc_id, n_tokens, n_removed, kept_text,
         list_filter(regexp_split_to_array(lower(kept_text), '\s+'),
                     x -> x != '') AS words
  FROM kept
), gopher AS (
  SELECT doc_id, n_tokens, n_removed, kept_text,
         len(words) AS n_words,
         len(list_intersect(list_distinct(words),
             ['the','be','to','of','and','that','have','with'])) AS stop_hits,
         (len(words) BETWEEN 50 AND 100000)
           AND len(list_intersect(list_distinct(words),
               ['the','be','to','of','and','that','have','with'])) >= 2
           AS gopher_sketch_pass
  FROM gw
), dtoks AS (
  SELECT doc_id, doc_id % 2 = 0 AS is_target,
         list_filter(regexp_split_to_array(lower(kept_text), '\s+'),
                     x -> x != '') AS tk
  FROM kept
), grams AS (
  SELECT doc_id, is_target, unnest(
    list_concat(tk,
      list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]))) AS g
  FROM dtoks
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
), dsir AS (
  SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_feats,
         round(sum(d.c * lr.lr), 4) AS dsir_logw
  FROM per_doc d JOIN lr USING (b) GROUP BY d.doc_id
)
SELECT g.doc_id, g.n_tokens, g.n_removed,
       CAST(g.n_words AS INT) AS n_words,
       CAST(g.stop_hits AS INT) AS stop_hits,
       g.gopher_sketch_pass,
       CAST(COALESCE(d.n_feats, 0) AS BIGINT) AS n_feats,
       d.dsir_logw
FROM gopher g LEFT JOIN dsir d USING (doc_id)
""",
)
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 COMPOSED curation flagship: the new operators chained
    end-to-end over a constructed bimodal corpus (the doc_gopher_split
    English stratum on even doc_ids, raw fixture text on odd; slice
    doc_id % 23 = 3 to bound the suffix-array rounds) —

      1. `suffix.substring_dedup_rewrite` (L=2): the Lee-et-al removal
         pass dedups the repeated English sentence down to one kept
         occurrence and prunes fixture-text repeats;
      2. Gopher-style audit on the REWRITTEN text (word count + the
         stopword rule — emitted as `gopher_sketch_pass`; dedup drops
         the English pages under the 50-word floor, so the composition
         itself demonstrates why rule order matters in real pipelines);
      3. `sampling.dsir_logweights` scored on the rewritten text with
         the English stratum as the DSIR target — quality-targeted
         selection over deduped documents.

    One oracle replays the whole chain (SA sort + marking + rewrite →
    word/stopword algebra → the md5-bucket DSIR model) so the driver
    hash pins the COMPOSITION, not just the stages; docs whose rewrite
    keeps no features survive via the left join with n_feats = 0
    (DSIR's documented omission contract made whole at the pipeline
    level). Measured at sf0.01: the ten IDENTICAL English pages
    collapse to ONE surviving copy (cross-document exact-substring
    dedup working exactly as Lee et al. intend — nine docs empty out
    entirely, the SA-first survivor keeps the 13-token sentence, scores
    six stopword hits and the slice's only POSITIVE DSIR weight), while
    every raw-text doc keeps a unique remainder and scores negative."""
    from prom_etl_db_spark.functions.suffix import substring_dedup_rewrite

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 23 == 3)
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
    rw = substring_dedup_rewrite(bimodal, min_len=2)
    words = F.filter(
        F.split(F.lower(F.col("kept_text")), r"\s+"), lambda x: x != ""
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in text.GOPHER_STOPWORDS]),
        )
    )
    audited = rw.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        "kept_text",
        F.size(words).alias("n_words"),
        stop_hits.alias("stop_hits"),
        (F.size(words).between(50, 100_000) & (stop_hits >= 2)).alias(
            "gopher_sketch_pass"
        ),
    )
    dsir = sampling.dsir_logweights(
        rw, target=F.col("doc_id") % 2 == 0, text_col="kept_text"
    ).select(
        F.col("doc_id"), F.col("n_feats"), F.col("dsir_logw")
    )
    return (
        audited.join(dsir, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_removed",
            "n_words",
            "stop_hits",
            "gopher_sketch_pass",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            "dsir_logw",
        )
    )


# =========================================================================
# Round 5: skew-mitigation joins under the driver oracle. Both queries
# are VALUE-IDENTICAL to the plain equi-join by construction — that
# identity is exactly what the oracle (a plain SQL join) certifies; the
# techniques exist for the plan, not the values (operators/skew.py).
# =========================================================================


@register(
    "events_salted_type_join",
    oracle="""
WITH dim AS (
  SELECT event_type, avg(value) AS type_avg FROM events GROUP BY event_type
)
SELECT e.event_type, count(*) AS n,
       round(sum(abs(e.value - d.type_avg)), 4) AS total_absdev
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
""",
)
def events_salted_type_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skew.py): events joined to a per-type
    aggregate on the 5-value ``event_type`` key — the low-cardinality
    shape where a plain shuffle join can use at most 5 reducers no matter
    the cluster size. ``salted_join`` widens the key space ×16 with a
    deterministic (retry-safe) xxhash64 salt on ``event_id`` and
    replicates the 5-row dim per salt; the result is row-identical to the
    plain join, which is precisely what this oracle checks. The dim here
    is broadcast-sized (so Catalyst plans BHJ at sf0.01); the operator
    targets the case where it is not — see tests/test_skew_layout.py for
    the plan gate asserting the salt rides the join condition."""
    from prom_etl_db_spark.operators.skew import salted_join

    ev = _events(spark, sf_dir)
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    joined = salted_join(
        ev, dim, ["event_type"], salts=16, salt_src=["event_id"]
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.abs(F.col("value") - F.col("type_avg"))), 4).alias(
            "total_absdev"
        ),
    )


@register(
    "events_skew_split_join",
    oracle="""
WITH dim AS (
  SELECT event_type, avg(value) AS type_avg FROM events GROUP BY event_type
)
SELECT e.event_type, count(*) AS n,
       round(sum(abs(e.value - d.type_avg)), 4) AS total_absdev
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
""",
)
def events_skew_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/cold split join (operators/skew.py): the two heaviest
    event_type keys (measured by ``top_skewed_keys`` — deterministic:
    count desc, key asc tiebreak) take a broadcast of the dim's hot
    slice, the cold keys take the ordinary shuffle join, and the union is
    row-identical to the plain join — the same oracle as the salted twin
    certifies it. This is the shape AQE cannot produce when the right
    side is overall too big to broadcast but its hot slice is tiny."""
    from prom_etl_db_spark.operators.skew import split_skew_join, top_skewed_keys

    ev = _events(spark, sf_dir)
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    hot = top_skewed_keys(ev, ["event_type"], k=2, min_share=0.01)
    joined = split_skew_join(ev, dim, ["event_type"], hot_keys=hot)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.abs(F.col("value") - F.col("type_avg"))), 4).alias(
            "total_absdev"
        ),
    )


@register(
    "wordpiece_learned_merges",
    oracle=r"""
WITH RECURSIVE words0 AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM documents)
  WHERE length(w) > 0 GROUP BY w
), vocab0 AS (
  SELECT list(struct_pack(freq := freq,
    s := ' ' || array_to_string(
           list_concat(
             [list_filter(string_split(w, ''), x -> x != '')[1]],
             list_transform(list_filter(string_split(w, ''), x -> x != '')[2:],
                            c -> '##' || c)),
           '  ') || ' ')) AS vocab
  FROM words0
), steps AS (
  SELECT 0 AS i, CAST(NULL AS STRUCT(a VARCHAR, b VARCHAR)) AS w, vocab FROM vocab0
  UNION ALL
  SELECT i + 1, win,
    list_transform(vocab, v -> struct_pack(freq := v.freq,
      s := replace(v.s, ' ' || win.a || '  ' || win.b || ' ',
                   ' ' || win.a ||
                   (CASE WHEN win.b LIKE '##%' THEN substr(win.b, 3)
                         ELSE win.b END) || ' ')))
  FROM (
    SELECT i, vocab,
      (SELECT struct_pack(a := l, b := r)
       FROM (
         SELECT tk[x] AS l, tk[x+1] AS r, sum(freq) AS n
         FROM (SELECT u.freq AS freq,
                      string_split(trim(u.s, ' '), '  ') AS tk
               FROM unnest(vocab) AS t(u)),
              unnest(range(1, len(tk))) AS g(x)
         GROUP BY 1, 2) p
       JOIN (SELECT tok, sum(f2) AS tf
             FROM (SELECT u2.freq AS f2,
                          unnest(string_split(trim(u2.s, ' '), '  ')) AS tok
                   FROM unnest(vocab) AS t2(u2))
             GROUP BY tok) fl ON fl.tok = p.l
       JOIN (SELECT tok, sum(f3) AS tf
             FROM (SELECT u3.freq AS f3,
                          unnest(string_split(trim(u3.s, ' '), '  ')) AS tok
                   FROM unnest(vocab) AS t3(u3))
             GROUP BY tok) fr ON fr.tok = p.r
       ORDER BY CAST(p.n AS DOUBLE) / (CAST(fl.tf AS DOUBLE) * CAST(fr.tf AS DOUBLE)) DESC,
                p.l, p.r
       LIMIT 1) AS win
    FROM steps WHERE i < 8
  )
)
SELECT CAST(i AS BIGINT) AS rank, w.a AS left_tok, w.b AS right_tok,
       w.a || (CASE WHEN w.b LIKE '##%' THEN substr(w.b, 3) ELSE w.b END) AS merged
FROM steps WHERE i >= 1 ORDER BY rank
""",
)
def wordpiece_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed WordPiece tokenizer training (`text.wordpiece_train`;
    Schuster & Nakajima 2012, the BERT tokenizer's construction): 8
    merges learned by the LIKELIHOOD objective — argmax of
    count(ab)/(count(a)*count(b)) instead of BPE's raw count — with the
    '##' continuation-marker convention replacing BPE's '</w>'. The
    oracle replays the trainer as a DuckDB recursive CTE (the
    bpe_learned_merges technique, extended with per-round token-frequency
    joins for the score's denominator); the score divides exact integer
    counts as doubles through the same IEEE ops on both engines, and
    ties break (left, right) lexicographic, so the argmax sequence is
    engine-portable. Also exact-equality unit-tested against a
    from-scratch local reference (tests/test_wordpiece.py)."""
    docs = _t(spark, sf_dir, "documents")
    merges = text.wordpiece_train(docs, 8)
    return spark.createDataFrame(
        [
            (i + 1, a, b, text._wp_merged_name(a, b))
            for i, (a, b) in enumerate(merges)
        ],
        "rank long, left_tok string, right_tok string, merged string",
    )


@register(
    "wordpiece_encoded_token_counts",
    oracle=r"""
WITH RECURSIVE words0 AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM documents)
  WHERE length(w) > 0 GROUP BY w
), vocab0 AS (
  SELECT list(struct_pack(freq := freq,
    s := ' ' || array_to_string(
           list_concat(
             [list_filter(string_split(w, ''), x -> x != '')[1]],
             list_transform(list_filter(string_split(w, ''), x -> x != '')[2:],
                            c -> '##' || c)),
           '  ') || ' ')) AS vocab
  FROM words0
), steps AS (
  SELECT 0 AS i, CAST(NULL AS STRUCT(a VARCHAR, b VARCHAR)) AS w, vocab FROM vocab0
  UNION ALL
  SELECT i + 1, win,
    list_transform(vocab, v -> struct_pack(freq := v.freq,
      s := replace(v.s, ' ' || win.a || '  ' || win.b || ' ',
                   ' ' || win.a ||
                   (CASE WHEN win.b LIKE '##%' THEN substr(win.b, 3)
                         ELSE win.b END) || ' ')))
  FROM (
    SELECT i, vocab,
      (SELECT struct_pack(a := l, b := r)
       FROM (
         SELECT tk[x] AS l, tk[x+1] AS r, sum(freq) AS n
         FROM (SELECT u.freq AS freq,
                      string_split(trim(u.s, ' '), '  ') AS tk
               FROM unnest(vocab) AS t(u)),
              unnest(range(1, len(tk))) AS g(x)
         GROUP BY 1, 2) p
       JOIN (SELECT tok, sum(f2) AS tf
             FROM (SELECT u2.freq AS f2,
                          unnest(string_split(trim(u2.s, ' '), '  ')) AS tok
                   FROM unnest(vocab) AS t2(u2))
             GROUP BY tok) fl ON fl.tok = p.l
       JOIN (SELECT tok, sum(f3) AS tf
             FROM (SELECT u3.freq AS f3,
                          unnest(string_split(trim(u3.s, ' '), '  ')) AS tok
                   FROM unnest(vocab) AS t3(u3))
             GROUP BY tok) fr ON fr.tok = p.r
       ORDER BY CAST(p.n AS DOUBLE) / (CAST(fl.tf AS DOUBLE) * CAST(fr.tf AS DOUBLE)) DESC,
                p.l, p.r
       LIMIT 1) AS win
    FROM steps WHERE i < 8
  )
), vset AS (
  SELECT list(DISTINCT t) AS v FROM (
    SELECT unnest(string_split(trim(u.s, ' '), '  ')) AS t
    FROM (SELECT vocab FROM steps WHERE i = 0), unnest(vocab) AS tt(u)
    UNION
    SELECT w.a || (CASE WHEN w.b LIKE '##%' THEN substr(w.b, 3) ELSE w.b END)
    FROM steps WHERE i >= 1)
), enc AS (
  SELECT w, 1 AS pos, 0 AS n_toks, false AS unk FROM words0
  UNION ALL
  SELECT w,
         CASE WHEN step IS NULL THEN length(w) + 1 ELSE pos + step END,
         CASE WHEN step IS NULL THEN 1 ELSE n_toks + 1 END,
         step IS NULL
  FROM (
    SELECT e.w AS w, e.pos AS pos, e.n_toks AS n_toks,
      (SELECT max(length(CASE WHEN e.pos > 1 THEN substr(t, 3) ELSE t END))
       FROM vset, unnest(v) AS vv(t)
       WHERE (CASE WHEN e.pos > 1 THEN t LIKE '##%' AND length(t) > 2
                   ELSE t NOT LIKE '##%' END)
         AND (CASE WHEN e.pos > 1 THEN substr(t, 3) ELSE t END)
             = substr(e.w, e.pos,
                      length(CASE WHEN e.pos > 1 THEN substr(t, 3) ELSE t END))
      ) AS step
    FROM enc e
    WHERE e.pos <= length(e.w) AND NOT e.unk
  )
), encoded AS (
  SELECT w, n_toks, unk FROM enc WHERE pos > length(w)
), docwords AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '\s+')) AS w
    FROM documents)
  WHERE length(w) > 0
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wt.n_toks) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN wt.unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
FROM docwords d JOIN encoded wt USING (w)
GROUP BY d.doc_id
""",
)
def wordpiece_encoded_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece ENCODE end to end: train 8 merges, build the runtime
    vocabulary (corpus alphabet + fusions — WordPiece ships a vocab and
    greedy-matches, it does NOT replay merges like BPE), greedy
    longest-prefix-encode every DISTINCT word (BERT's runtime algorithm,
    whole word -> [UNK] on any unmatchable position), and count
    per-document (n_words, n_tokens, n_unk). The oracle replays
    training via the recursive CTE AND the greedy matcher via a second
    recursive CTE (state = (word, pos, n_toks); each step takes the
    longest vocabulary token matching at pos, '##'-constrained for
    pos>1), so one hash pins the likelihood argmax loop, the vocabulary
    closure, the longest-match discipline, and the join-back accounting
    together. Scale: the matcher touches only the distinct-word vocab
    (an Arrow-batched pandas UDF over a language-sized table); the
    corpus-sized work is one explode + one broadcast-class join."""
    docs = _t(spark, sf_dir, "documents")
    return text.wordpiece_token_counts(docs, 8)


# =========================================================================
# Round-5: Unigram-LM (SentencePiece) tokenizer — the third published
# subword construction (Kudo 2018), completing the trio beside BPE and
# WordPiece. The oracle replays the WHOLE trainer in DuckDB: seed
# substring counts, the Viterbi DP as a linear recursive CTE (state =
# a 4-slot window of best-path structs — dp[pos] depends only on
# dp[pos-1..pos-4] because tokens cap at 4 chars, so the recursion is
# LINEAR in word length, never path-enumerating), one hard-EM
# re-estimation, and the final encode. Shared prefix below; the two
# queries append different tails (vocab vs per-doc accounting).
# =========================================================================

_UNIGRAM_SENT = (
    "struct_pack(lp := CAST(-1.0e18 AS DOUBLE), n := CAST(0 AS BIGINT), "
    "toks := CAST([] AS VARCHAR[]))"
)

_UNIGRAM_PASS = """
  SELECT w, freq, 0 AS pos,
         [{sent}, {sent}, {sent},
          struct_pack(lp := CAST(0.0 AS DOUBLE), n := CAST(0 AS BIGINT),
                      toks := CAST([] AS VARCHAR[]))] AS win
  FROM words0
  UNION ALL
  SELECT w, freq, pos + 1,
         [win[2], win[3], win[4], COALESCE(best, {sent})]
  FROM (
    SELECT e.w AS w, e.freq AS freq, e.pos AS pos, e.win AS win,
      (SELECT struct_pack(
           lp := e.win[CAST(5 - k AS INTEGER)].lp + v.lp,
           n := e.win[CAST(5 - k AS INTEGER)].n + 1,
           toks := e.win[CAST(5 - k AS INTEGER)].toks || [v.tok])
       FROM unnest(range(1, 5)) AS g(k)
       JOIN {model} v
         ON v.tok = substr(e.w, CAST(e.pos + 2 - k AS INTEGER),
                           CAST(k AS INTEGER))
       WHERE k <= e.pos + 1 AND e.win[CAST(5 - k AS INTEGER)].lp > -1.0e17
       ORDER BY e.win[CAST(5 - k AS INTEGER)].lp + v.lp DESC,
                e.win[CAST(5 - k AS INTEGER)].n + 1 ASC, k DESC
       LIMIT 1) AS best
    FROM {name} e WHERE e.pos < length(e.w)
  )
"""

_UNIGRAM_CTES = (
    r"""
WITH RECURSIVE words0 AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
    FROM documents)
  WHERE length(w) > 0 GROUP BY w
), subs AS (
  SELECT substr(w, CAST(s AS INTEGER), CAST(k AS INTEGER)) AS tok,
         sum(freq) AS cnt
  FROM words0,
       unnest(range(1, length(w) + 1)) AS g1(s),
       unnest(range(1, 5)) AS g2(k)
  WHERE s + k - 1 <= length(w)
  GROUP BY 1
), seed AS (
  SELECT tok, cnt FROM subs WHERE length(tok) = 1
  UNION ALL
  SELECT tok, cnt FROM (
    SELECT tok, cnt FROM subs WHERE length(tok) > 1
    ORDER BY cnt DESC, tok ASC LIMIT 40) q
), p0 AS (
  SELECT tok, ln(CAST(cnt AS DOUBLE) /
                 CAST((SELECT sum(cnt) FROM seed) AS DOUBLE)) AS lp
  FROM seed
), pass1 AS ("""
    + _UNIGRAM_PASS.format(sent=_UNIGRAM_SENT, model="p0", name="pass1")
    + r"""), seg1 AS (
  SELECT w, freq, win[4] AS dp FROM pass1 WHERE pos = length(w)
), em AS (
  SELECT tok, sum(freq) AS cnt FROM (
    SELECT freq, unnest(dp.toks) AS tok FROM seg1) GROUP BY tok
)"""
)


@register(
    "unigram_lm_vocab",
    oracle=_UNIGRAM_CTES
    + r"""
SELECT s.tok AS token, CAST(s.cnt AS BIGINT) AS seed_count,
       CAST(em.cnt AS BIGINT) AS em_count,
       round(ln(CAST(em.cnt AS DOUBLE) /
                CAST((SELECT sum(cnt) FROM em) AS DOUBLE)), 6) AS logp
FROM em JOIN seed s ON s.tok = em.tok
""",
)
def unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer TRAINING (`functions/unigram.py`, Kudo 2018
    with deterministic hard EM): seed every <=4-char word-internal
    substring (chars always kept, top-40 multis by count desc / token
    asc), Viterbi-segment the distinct-word table under the seed model,
    re-estimate token counts along each word's single best path, and
    ship the surviving vocabulary with its fitted log-probabilities.
    The oracle replays all four stages; the Viterbi DP is a LINEAR
    recursive CTE carrying a 4-slot window of best-path structs (the
    4-char token cap bounds the DP dependency horizon), so the replay
    is O(total word length), never path-enumerating. Ties in the DP
    break (logprob desc, n_toks asc, longer-final-token) — a total
    order both engines apply to the same IEEE doubles. Scale: the
    corpus collapses to distinct words before any of this; see the
    module docstring for the 100 TB layout."""
    from prom_etl_db_spark.functions import unigram

    docs = _t(spark, sf_dir, "documents")
    return unigram.unigram_train(docs).select(
        "token", "seed_count", "em_count", F.round("logp", 6).alias("logp")
    )


@register(
    "unigram_encoded_token_counts",
    oracle=_UNIGRAM_CTES
    + r""", p1 AS (
  SELECT tok, ln(CAST(cnt AS DOUBLE) /
                 CAST((SELECT sum(cnt) FROM em) AS DOUBLE)) AS lp
  FROM em
), pass2 AS ("""
    + _UNIGRAM_PASS.format(sent=_UNIGRAM_SENT, model="p1", name="pass2")
    + r"""), seg2 AS (
  SELECT w, win[4] AS dp FROM pass2 WHERE pos = length(w)
), docwords AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '\s+')) AS w
    FROM documents)
  WHERE length(w) > 0
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(s.dp.n) AS BIGINT) AS n_tokens,
       round(-sum(s.dp.lp), 4) AS neg_logp
FROM docwords d JOIN seg2 s ON s.w = d.w
GROUP BY d.doc_id
""",
)
def unigram_encoded_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM ENCODE end to end: train (seed -> Viterbi -> hard EM),
    then Viterbi-segment every distinct word under the FITTED model and
    account per document (n_words, n_tokens, neg_logp — the document's
    total negative log-likelihood, the model's own compression score;
    the CCNet-style selection signal a trained tokenizer gives away for
    free). The oracle replays training AND encode: two linear recursive
    Viterbi CTEs chained through the hard-EM count table, so one hash
    pins seed counting, both DPs (with their tiebreaks), the MLE
    re-estimation, and the broadcast-join accounting together.
    neg_logp rounds at 4 decimals AFTER the per-doc sum (the
    established tolerance for sum-order ulp drift across engines)."""
    from prom_etl_db_spark.functions import unigram

    docs = _t(spark, sf_dir, "documents")
    return unigram.unigram_token_counts(docs)


@register(
    "doc_kneser_ney_perplexity",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_train,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x != '') AS tk
  FROM documents
), tri AS (
  SELECT doc_id, is_train, tk[x] AS u, tk[x+1] AS v, tk[x+2] AS w
  FROM toks, unnest(range(1, len(tk) - 1)) AS g(x)
), c3 AS (
  SELECT u, v, w, count(*) AS c3 FROM tri WHERE is_train GROUP BY 1, 2, 3
), h2 AS (
  SELECT u, v, CAST(sum(c3) AS BIGINT) AS c2h, count(*) AS n3h
  FROM c3 GROUP BY 1, 2
), cb AS (
  SELECT v, w, count(*) AS cb FROM c3 GROUP BY 1, 2
), n1v AS (
  SELECT v, CAST(sum(cb) AS BIGINT) AS cvtot, count(*) AS cvty
  FROM cb GROUP BY 1
), p1t AS (
  SELECT w, count(*) AS n1c FROM cb GROUP BY 1
), tot AS (
  SELECT count(*) AS btypes, count(DISTINCT w) AS wtypes FROM cb
), voc AS (
  SELECT count(DISTINCT u.w) AS vsz
  FROM (SELECT unnest(tk) AS w FROM toks WHERE is_train) u
), joined AS (
  SELECT t.doc_id, c3.c3, h2.c2h, h2.n3h, cb.cb, n1v.cvtot, n1v.cvty,
         (greatest(coalesce(p1t.n1c, 0) - 0.75, 0.0)
          + 0.75 * tot.wtypes / (voc.vsz + 1.0)) / tot.btypes AS p1
  FROM tri t
  LEFT JOIN c3 ON c3.u = t.u AND c3.v = t.v AND c3.w = t.w
  LEFT JOIN h2 ON h2.u = t.u AND h2.v = t.v
  LEFT JOIN cb ON cb.v = t.v AND cb.w = t.w
  LEFT JOIN n1v ON n1v.v = t.v
  LEFT JOIN p1t ON p1t.w = t.w
  CROSS JOIN tot CROSS JOIN voc
), mid AS (
  SELECT doc_id, c3, c2h, n3h,
         CASE WHEN cvtot IS NULL THEN p1
              ELSE (greatest(coalesce(cb, 0) - 0.75, 0.0)
                    + 0.75 * cvty * p1) / cvtot
         END AS p2
  FROM joined
), scored AS (
  SELECT doc_id,
         ln(CASE WHEN c2h IS NULL THEN p2
                 ELSE (greatest(coalesce(c3, 0) - 0.75, 0.0)
                       + 0.75 * n3h * p2) / c2h
            END) AS logp
  FROM mid
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(avg(logp), 6) AS avg_logp,
       round(exp(-avg(logp)), 4) AS ppl
FROM scored GROUP BY doc_id
""",
)
def doc_kneser_ney_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram perplexity (Chen & Goodman 1999)
    trained on the lang='en' slice and scored over the whole corpus —
    the published smoothing KenLM implements and CCNet's quality LM
    relies on, completing the LM-quality ladder above
    `doc_bigram_lm_perplexity`'s add-α MLE. The oracle replays the
    ENTIRE estimator: trigram type counts, both continuation-count
    re-aggregations, the distinct-continuation totals, the uniform OOV
    leak, and the exact two-level backoff CASE structure, with every
    arithmetic expression written in the same shape on both engines so
    per-trigram log-probabilities agree bit-for-bit (only the per-doc
    mean crosses sum-order, handled by the round-6/round-4 convention).
    Documents with <3 tokens carry no trigram and are omitted — the
    same routing stance as the bigram query's single-word rule."""
    docs = _t(spark, sf_dir, "documents")
    return text.kneser_ney_trigram_perplexity(docs)


# Shared SQL replay of the perceptual-hash fixture + code algebra
# (functions/phash.py): closed-form 18x16 pixels -> exact 2x2 box means
# -> row-wise gradient bits -> 8 LSB-first band bytes (+ aHash dark
# count). Integer arithmetic end to end, so both engines agree exactly.
_PHASH_CODES_SQL = r"""
WITH px AS (
  SELECT doc_id, rr, cc,
         CASE WHEN doc_id % 50 = 1 AND rr BETWEEN 4 AND 5
                   AND cc BETWEEN 6 AND 7
              THEN (v0 + 120) % 241 ELSE v0 END AS v
  FROM (
    SELECT doc_id, rr, cc,
           (((eff % 239) + 2) * (rr * 31 + cc * 17 + 5)
            + ((eff % 233) + 1) * (rr * cc + 7) + eff) % 241 AS v0
    FROM (
      SELECT d.doc_id, r.range AS rr, c.range AS cc,
             d.doc_id - CASE WHEN d.doc_id % 50 = 1 THEN 1 ELSE 0 END AS eff
      FROM documents d CROSS JOIN range(16) r CROSS JOIN range(18) c
    )
  )
), cells AS (
  SELECT doc_id, rr // 2 AS gr, cc // 2 AS gc,
         CAST(sum(v) // 4 AS BIGINT) AS a
  FROM px GROUP BY 1, 2, 3
), bits AS (
  SELECT l.doc_id, l.gr, l.gc,
         CASE WHEN l.a > r.a THEN 1 ELSE 0 END AS bit
  FROM cells l JOIN cells r
    ON r.doc_id = l.doc_id AND r.gr = l.gr AND r.gc = l.gc + 1
), bands AS (
  SELECT doc_id, gr, CAST(sum(bit * (1 << gc)) AS INT) AS bv
  FROM bits GROUP BY 1, 2
), codes AS (
  SELECT doc_id,
         CAST(max(CASE WHEN gr = 0 THEN bv END) AS INT) AS d0,
         CAST(max(CASE WHEN gr = 1 THEN bv END) AS INT) AS d1,
         CAST(max(CASE WHEN gr = 2 THEN bv END) AS INT) AS d2,
         CAST(max(CASE WHEN gr = 3 THEN bv END) AS INT) AS d3,
         CAST(max(CASE WHEN gr = 4 THEN bv END) AS INT) AS d4,
         CAST(max(CASE WHEN gr = 5 THEN bv END) AS INT) AS d5,
         CAST(max(CASE WHEN gr = 6 THEN bv END) AS INT) AS d6,
         CAST(max(CASE WHEN gr = 7 THEN bv END) AS INT) AS d7
  FROM bands GROUP BY doc_id
)
"""


@register(
    "image_dhash_codes",
    oracle=_PHASH_CODES_SQL
    + r""", dark AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN a < m THEN 1 ELSE 0 END) AS INT) AS n_dark
  FROM (SELECT doc_id, a,
               sum(a) OVER (PARTITION BY doc_id) // 72 AS m
        FROM cells)
  GROUP BY doc_id
)
SELECT c.doc_id, c.d0, c.d1, c.d2, c.d3, c.d4, c.d5, c.d6, c.d7, k.n_dark
FROM codes c JOIN dark k USING (doc_id)
""",
)
def image_dhash_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/E2 (r5): perceptual image codes — dHash (gradient signs over
    the exact 2x2-box-averaged 9x8 grid, 8 LSB-first band bytes) plus
    the aHash dark-cell count — computed over a REAL PNG roundtrip:
    the closed-form image is encoded by the five-filter-cycling PNG
    writer and decoded by the from-scratch decoder before hashing
    (`functions/phash.py`), so this one hash pins the codec path AND
    the hash algebra (the FLAC lossless-roundtrip pattern). The oracle
    recomputes pixels, box means, bits, and packing in pure integer
    SQL. Hashing is a map over the decode scan — zero shuffle."""
    from prom_etl_db_spark.functions import phash

    docs = _t(spark, sf_dir, "documents")
    return phash.image_dhash_codes(docs)


@register(
    "image_phash_neardup_pairs",
    oracle=_PHASH_CODES_SQL
    + r"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.d0, b.d0)) + bit_count(xor(a.d1, b.d1))
          + bit_count(xor(a.d2, b.d2)) + bit_count(xor(a.d3, b.d3))
          + bit_count(xor(a.d4, b.d4)) + bit_count(xor(a.d5, b.d5))
          + bit_count(xor(a.d6, b.d6)) + bit_count(xor(a.d7, b.d7))
          AS INT) AS hamming
FROM codes a JOIN codes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.d0, b.d0)) + bit_count(xor(a.d1, b.d1))
    + bit_count(xor(a.d2, b.d2)) + bit_count(xor(a.d3, b.d3))
    + bit_count(xor(a.d4, b.d4)) + bit_count(xor(a.d5, b.d5))
    + bit_count(xor(a.d6, b.d6)) + bit_count(xor(a.d7, b.d7)) <= 6
""",
)
def image_phash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2, image near-dup (r5): pairs within Hamming distance 6 of the
    64-bit dHash — the LAION-style image dedup. The SPARK side never
    compares all pairs: candidates come from an equi-join on 8-bit
    bands (complete for distance <= 7 by pigeonhole — the multi-index
    Hamming guarantee, Norouzi et al. 2012), verified by 8 JVM-side
    XOR+popcounts. The ORACLE is the definitional all-pairs scan over
    the recomputed codes, so the driver hash proves the banded
    generator misses nothing and invents nothing. Fixture plants one
    near-pair per 50 documents (<= 2 bits apart); unplanted pairs sit
    near the 32-bit random distance."""
    from prom_etl_db_spark.functions import phash

    docs = _t(spark, sf_dir, "documents")
    return phash.phash_neardup_pairs(phash.image_dhash_codes(docs), 6)


@register(
    "video_y4m_bt601_decode",
    oracle="""
WITH px AS (
  SELECT d.doc_id, f.range AS f, r.range AS rr, c.range AS cc,
         (d.doc_id * 3 + f.range * 11 + r.range * 5 + c.range * 7) % 256
           AS y,
         (d.doc_id * 5 + f.range * 7
          + (r.range // 2) * 13 + (c.range // 2) * 3) % 256 AS u,
         (d.doc_id * 7 + f.range * 5
          + (r.range // 2) * 3 + (c.range // 2) * 13) % 256 AS v
  FROM documents d
  CROSS JOIN range(4) f CROSS JOIN range(8) r CROSS JOIN range(16) c
  WHERE f.range < 2 + d.doc_id % 3
), rgb AS (
  SELECT doc_id,
    greatest(least((298 * (y - 16) + 409 * (v - 128) + 128) // 256,
                   255), 0) AS r,
    greatest(least((298 * (y - 16) - 100 * (u - 128)
                    - 208 * (v - 128) + 128) // 256, 255), 0) AS g,
    greatest(least((298 * (y - 16) + 516 * (u - 128) + 128) // 256,
                   255), 0) AS b
  FROM px
)
SELECT doc_id AS media_id,
       CAST(2 + doc_id % 3 AS INT) AS n_frames,
       CAST(16 AS INT) AS width,
       CAST(8 AS INT) AS height,
       CAST(24 + doc_id % 6 AS INT) AS fps_num,
       CAST(1001 AS INT) AS fps_den,
       CAST(sum(r) AS BIGINT) AS rsum,
       CAST(sum(g) AS BIGINT) AS gsum,
       CAST(sum(b) AS BIGINT) AS bsum
FROM rgb GROUP BY doc_id
""",
)
def video_y4m_bt601_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 video, RAW interchange (r5): YUV4MPEG2 write → byte-level
    re-parse (tag grammar incl. the F<num>:<den> frame-rate field,
    FRAME markers, 4:2:0 plane slicing) → exact integer BT.601
    fixed-point RGB conversion with sample-and-hold chroma upsampling
    (`functions/video.py`). Raw video is lossless by definition, so the
    oracle recomputes the whole pixel path in integer SQL — including
    the clip((t+128)//256) form whose floor-vs-truncate divergence is
    neutralized by the clamp (negative pre-clip values clip to 0 under
    either semantics). Completes the video family: MJPEG-AVI (lossy
    codec-in-container), GIF (lossless LZW), Y4M (raw)."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.y4m_roundtrip_features(docs)


@register(
    "doc_nfc_normalize",
    oracle="""
WITH built AS (
  SELECT doc_id,
         text || ' ' ||
         CASE doc_id % 5
           WHEN 0 THEN chr(101) || chr(769)
           WHEN 1 THEN chr(8491)
           WHEN 2 THEN chr(100) || chr(803) || chr(775)
           WHEN 3 THEN chr(4370) || chr(4449) || chr(4523)
           ELSE chr(64257)
         END AS inp
  FROM documents
)
SELECT doc_id,
       CAST(length(inp) AS INT) AS n_cp_in,
       CAST(length(nfc_normalize(inp)) AS INT) AS n_cp_nfc,
       nfc_normalize(inp) != inp AS changed,
       nfc_normalize(inp) AS text_nfc
FROM built
""",
)
def doc_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (UAX #15 — r5): the canonical-
    composition pass text pipelines run before tokenization/dedup. The
    fixture corpus is ASCII (NFC-invariant), so the query plants five
    deterministic strata in-query (the C4 construction trick):
    combining-acute composition, the U+212B ANGSTROM singleton,
    canonical REORDER + compose (dot-below before dot-above), Hangul
    jamo → syllable composition, and the NFC-INVARIANT U+FB01 ligature
    (so `changed` splits both ways under the driver hash). Spark runs
    stdlib unicodedata in one Arrow batch; DuckDB runs utf8proc — two
    independent implementations of the UCD tables, so the hash match
    (which includes the full normalized TEXT) is real interop
    evidence. Verified: both agree on every stratum including
    reordering and Hangul (tests/test_nfc.py)."""
    docs = _t(spark, sf_dir, "documents")
    marker = F.element_at(
        F.array(
            F.lit("é"),
            F.lit("Å"),
            F.lit("ḍ̇"),
            F.lit("한"),
            F.lit("ﬁ"),
        ),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    built = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" "), marker).alias("text")
    )
    return text.nfc_normalize_features(built)


# =========================================================================
# Round-5 continuation: fixed-point spectrogram (Q15 integer DFT).
# =========================================================================

# Shared oracle CTE builder for the spectrogram family: twiddle
# integers are INLINED from the same Python table the Spark side uses
# (one table by construction), so the whole pipeline — closed-form
# signal, framing, Q15 DFT, bin power — is exact int64 arithmetic on
# both sides. ``nf_sql``/``gate_sql``/``max_n``/``max_f`` parameterize
# the fixture shape (the VAD query uses a longer, tone-gated signal).


def _spectro_ctes(nf_sql: str, gate_sql: str, max_n: int, max_f: int) -> str:
    return f"""
WITH tw(m, c, s) AS (VALUES {spectral.twiddle_values_sql()}),
d AS (
  SELECT doc_id, {nf_sql} AS nf, 1 + doc_id % 15 AS k0
  FROM documents
),
samp AS (
  SELECT d.doc_id, i.range AS n,
         ((d.doc_id + 5 * i.range) % 97) - 48
           + CAST(floor(tw.c * {spectral.TONE_AMP} / 32768.0) AS BIGINT)
             * ({gate_sql}) AS x
  FROM d CROSS JOIN range({max_n}) i
  JOIN tw ON tw.m = (d.k0 * i.range) % 32
  WHERE i.range < 16 * d.nf + 16
),
fr AS (
  SELECT doc_id, f.range AS f FROM d CROSS JOIN range({max_f}) f
  WHERE f.range < d.nf
),
dft AS (
  SELECT fr.doc_id, fr.f, k.range AS k,
         sum(sa.x * t.c) AS xre, sum(sa.x * t.s) AS xim
  FROM fr
  JOIN samp sa ON sa.doc_id = fr.doc_id
   AND sa.n >= fr.f * 16 AND sa.n < fr.f * 16 + 32
  CROSS JOIN range(17) k
  JOIN tw t ON t.m = (k.range * (sa.n - fr.f * 16)) % 32
  GROUP BY fr.doc_id, fr.f, k.range
),
dftp AS (
  SELECT doc_id, f, k, xre * xre + xim * xim AS pw FROM dft
)
"""


_SPECTRO_CTES = _spectro_ctes("2 + doc_id % 3", "1", 80, 4)


@register(
    "audio_spectrogram_power",
    oracle=_SPECTRO_CTES
    + """
SELECT doc_id AS media_id, CAST(f AS INT) AS frame, CAST(k AS INT) AS bin,
       CAST(pw AS BIGINT) AS power_fp
FROM dftp
""",
)
def audio_spectrogram_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, short-time spectrogram (r5): per document a REAL
    PCM-16 WAV of a closed-form signal (strong cosine at bin
    1 + doc_id%15 over broadband residue) is written, decoded back
    (full RIFF walk), framed at 50 % overlap, and pushed through a
    Q15 FIXED-POINT 32-point DFT — integer twiddles round(cos·2^15),
    exactly the arithmetic embedded DSP FFTs use — yielding one exact
    int64 power per (clip, frame, bin). The oracle replays the whole
    chain with the SAME twiddle integers inlined as SQL literals, so
    the driver hash is bit-exact with zero float-summation hazard (the
    documented `.00005` boundary problem of float-sum oracles cannot
    occur). Reference scope: §2.E multimodal extension (the reference
    treats media as opaque payloads)."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.spectrogram_power(docs)


@register(
    "audio_spectrogram_frames",
    oracle=_SPECTRO_CTES
    + """
SELECT doc_id AS media_id, CAST(f AS INT) AS frame,
       CAST(31 - (max(CASE WHEN k >= 1 THEN pw * 32 + (31 - k) END) % 32)
            AS INT) AS dominant_bin,
       CAST(sum(CASE WHEN k <= 1 THEN pw ELSE 0 END) AS BIGINT) AS e_low,
       CAST(sum(CASE WHEN k >= 2 AND k <= 7 THEN pw ELSE 0 END)
            AS BIGINT) AS e_mid,
       CAST(sum(CASE WHEN k >= 8 THEN pw ELSE 0 END) AS BIGINT) AS e_high,
       CAST(sum(pw) AS BIGINT) AS e_total
FROM dftp GROUP BY doc_id, f
""",
)
def audio_spectrogram_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, frame-level spectral descriptors (r5): dominant
    non-DC bin + three band energies + total per (clip, frame), the
    row a VAD / audio-quality filter consumes. Spark computes it as
    ONE hash agg over the spectrogram (struct-max for the
    deterministic max-power-then-lowest-bin tiebreak — no window, no
    second DFT pass); the oracle encodes the same tiebreak as a
    lexicographic pack (pw·32 + (31−k), hugeint-safe in DuckDB). All
    values exact int64 — the dominant bin over the fixture recovers
    each clip's planted tone, so the hash also pins the DFT's
    frequency axis, not just its algebra."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.spectrogram_frame_features(docs)


@register(
    "audio_vad_segments",
    oracle=_spectro_ctes(
        "8 + doc_id % 5",
        "CASE WHEN (d.doc_id + i.range // 32) % 3 = 0 THEN 0 ELSE 1 END",
        208,
        12,
    )
    + f"""
, ftot AS (
  SELECT doc_id, f, sum(pw) AS e_total FROM dftp GROUP BY doc_id, f
), act AS (
  SELECT doc_id, f,
         CASE WHEN f != lag(f) OVER w + 1 THEN 1 ELSE 0 END AS brk,
         e_total
  FROM ftot WHERE e_total >= {spectral.VAD_THRESHOLD}
  WINDOW w AS (PARTITION BY doc_id ORDER BY f)
), seg AS (
  SELECT doc_id, f, e_total,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY f
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segment
  FROM act
)
SELECT doc_id AS media_id, CAST(segment AS BIGINT) AS segment,
       CAST(min(f) AS INT) AS start_frame,
       CAST(max(f) AS INT) AS end_frame,
       count(*) AS n_frames,
       CAST(sum(e_total) AS BIGINT) AS seg_energy
FROM seg GROUP BY doc_id, segment
""",
)
def audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, voice-activity segmentation (r5): the utterance-cutting
    step of a speech curation pipeline, composed ON TOP of the Q15
    spectrogram — per clip (a longer fixture whose planted tone is
    GATED off in every third 32-sample block, so activity genuinely
    alternates), frames clearing a total-power threshold are merged
    into maximal consecutive runs (gaps-and-islands, windows
    partitioned by the bounded media_id key). Because frame power is
    exact int64, the threshold comparison has NO float boundary — the
    oracle replays fixture, DFT, threshold, and island-merge verbatim
    and the hash pins segment boundaries, lengths, and energies."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.vad_segments(docs)


@register(
    "metrics_lttb_downsample",
    oracle="""
WITH RECURSIVE pts AS (
  SELECT event_type AS s,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 1000 AS DOUBLE) AS x,
         floor(value + 0.5) AS v
  FROM events
), ib AS (
  SELECT s, i, x, v, (i - 2) * 18 // (n - 2) AS b FROM pts
  WHERE i >= 2 AND i <= n - 1
), cand AS (
  SELECT s, b, list(struct_pack(x := x, v := v) ORDER BY i) AS cpts
  FROM ib GROUP BY s, b
), avgs AS (
  SELECT s, b, avg(x) AS cx, avg(v) AS cy FROM ib GROUP BY s, b
), lastp AS (
  SELECT s, x, v FROM pts WHERE i = n
), firstp AS (
  SELECT s, x, v FROM pts WHERE i = 1
), nxt AS (
  SELECT c.s, c.b, c.cpts,
         coalesce(a.cx, l.x) AS cx, coalesce(a.cy, l.v) AS cy
  FROM cand c
  LEFT JOIN avgs a ON a.s = c.s AND a.b = c.b + 1
  JOIN lastp l ON l.s = c.s
), rec AS (
  SELECT s, CAST(-1 AS BIGINT) AS b, x AS ax, v AS ay FROM firstp
  UNION ALL
  SELECT n.s, n.b,
    list_max([{'a': abs((r.ax - n.cx) * (p.v - r.ay) - (r.ax - p.x) * (n.cy - r.ay)),
               'nx': -p.x, 'x': p.x, 'v': p.v} for p in n.cpts]).x AS ax,
    list_max([{'a': abs((r.ax - n.cx) * (p.v - r.ay) - (r.ax - p.x) * (n.cy - r.ay)),
               'nx': -p.x, 'x': p.x, 'v': p.v} for p in n.cpts]).v AS ay
  FROM rec r JOIN nxt n ON n.s = r.s AND n.b = r.b + 1
)
SELECT s AS series, CAST(b + 1 AS INT) AS pos,
       CAST(ax AS BIGINT) AS x_ms, CAST(ay AS BIGINT) AS v
FROM rec
UNION ALL
SELECT s AS series, 19 AS pos, CAST(x AS BIGINT) AS x_ms, CAST(v AS BIGINT) AS v
FROM lastp
""",
)
def metrics_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-ext, LTTB downsampling (Steinarsson 2013 — r5): the
    dashboard-rendering downsampler (Grafana's default for big series)
    over the events fixture, 20 points per event_type series. The
    sequential select-chain (bucket i's pick anchors bucket i+1's
    triangle) runs per-series in applyInPandas — parallel across
    series, the real cardinality axis; the oracle replays the chain
    with a recursive CTE whose per-step argmax is a list-comprehension
    lexicographic max (area, then earliest x). Determinism is BY
    CONSTRUCTION: integer-ms x rebased to 2024-01-01 and floor(v+0.5)
    integer values make every centroid sum exact in float64 and every
    triangle area a fixed expression tree over bit-identical operands
    — so Spark and DuckDB provably make the same choices (verified
    0 mismatches), with no float-boundary hazard in the hash. Note on
    ORACLE cost (not operator cost): DuckDB recursion re-scans per
    step, so the replay is O(chain²) and is practical at the gate's
    sf0.01 (~2k steps/series) but slow at sf0.1 — the OPERATOR itself
    is linear (scale-probed 0.18 of linear at 10×)."""
    ev = _t(spark, sf_dir, "events")
    return analytics.lttb_downsample(ev)


# HTML-extraction fixture: ONE template, injected into both the Spark
# builder and the oracle SQL (escaped), so the page both engines clean
# is byte-identical. Strata exercise every pass: script with internal
# '<' and quotes, style with braces, comment hiding tags, block tags,
# attribute-heavy inline tags, self-closing br, the whole entity set,
# and double-encoding (&amp;lt; must yield literal '&lt;').
_HTML_PREFIX = (
    '<html><head><title>T</title><style>p { color: red; }</style>'
    '<script type="text/javascript">if (a<b) { alert("x&y"); }</script>'
    "</head><body><!-- hidden <b>comment</b> -->"
    "<h1>Title &amp; More</h1><p class=\"lead\">"
)
_HTML_SUFFIX = (
    "</p><div>Tom &amp; Jerry &lt;3 &quot;quoted&quot; &#39;s&nbsp;here"
    " and &amp;lt;kept&amp;gt;</div><ul><li>one</li>"
    '<li>two <a href="http://e.com?a=1&amp;b=2">link text</a></li></ul>'
    "<br/>tail words</body></html>"
)


def _sqlq(s: str) -> str:
    return s.replace("'", "''")


@register(
    "doc_html_extract",
    oracle=f"""
WITH page AS (
  SELECT doc_id,
         '{_sqlq(_HTML_PREFIX)}' || text || '{_sqlq(_HTML_SUFFIX)}' AS html
  FROM documents
), cleaned AS (
  SELECT doc_id, {text.html_extract_oracle_exprs()} AS clean_text
  FROM page
)
SELECT doc_id, clean_text,
       CAST(length(clean_text) AS INT) AS n_chars,
       CAST(length(clean_text)
            - length(replace(clean_text, chr(10), '')) + 1 AS INT) AS n_lines
FROM cleaned
""",
)
def doc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 text, HTML → text extraction (r5): the page-cleaning step C4/
    CCNet run on every crawled document before quality scoring — drop
    script/style/comment subtrees, block tags → line breaks, strip
    remaining tags, decode entities (&amp; last, so double-encoded
    text stays encoded), normalize whitespace. The ENTIRE pass is a
    chain of built-in regexp_replace/replace Columns (whole-stage
    codegen, zero Python, narrow no-shuffle plan); patterns are written
    in the RE2-compatible subset and the oracle replays them in DuckDB,
    so the driver hash over the full cleaned text cross-checks two
    independent regex engines (java.util.regex vs RE2) on the same
    stratified page."""
    docs = _t(spark, sf_dir, "documents")
    page = docs.select(
        "doc_id",
        F.concat(
            F.lit(_HTML_PREFIX), F.col("text"), F.lit(_HTML_SUFFIX)
        ).alias("html"),
    )
    return text.html_extract_text(page)


@register(
    "tsdb_gorilla_compress",
    oracle="""
WITH RECURSIVE pts AS (
  SELECT event_type AS s,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS i,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 1000000 AS t,
         CAST(floor(value + 0.5) AS BIGINT) AS v
  FROM events
), d AS (
  SELECT s, i, t, v,
         t - lag(t) OVER w AS delta,
         lag(v) OVER w AS pv
  FROM pts WINDOW w AS (PARTITION BY s ORDER BY i)
), dd AS (
  SELECT s, i, v, pv,
         delta - coalesce(lag(delta) OVER (PARTITION BY s ORDER BY i), 0) AS dod,
         CASE WHEN i = 0 THEN NULL ELSE xor(v, pv) END AS x
  FROM d
), tsb AS (
  SELECT s, i, v,
         CASE WHEN i = 0 THEN 64
              WHEN dod = 0 THEN 1
              WHEN dod BETWEEN -63 AND 64 THEN 9
              WHEN dod BETWEEN -255 AND 256 THEN 12
              WHEN dod BETWEEN -2047 AND 2048 THEN 16
              ELSE 36 END AS ts_bits,
         x,
         CASE WHEN x IS NULL OR x = 0 THEN NULL
              WHEN x > 0 THEN 64 - length(bin(x)) ELSE 0 END AS lz,
         CASE WHEN x IS NULL OR x = 0 THEN NULL
              ELSE length(bin(x)) - length(rtrim(bin(x), '0')) END AS tz
  FROM dd
), rec AS (
  SELECT s, CAST(0 AS BIGINT) AS i, 99 AS s_lead, 99 AS s_trail,
         CAST(64 AS BIGINT) AS vbits
  FROM tsb WHERE i = 0
  UNION ALL
  SELECT st.s, st.i,
    CASE WHEN st.x = 0 OR (st.lz >= r.s_lead AND st.tz >= r.s_trail)
         THEN r.s_lead ELSE least(st.lz, 31) END,
    CASE WHEN st.x = 0 OR (st.lz >= r.s_lead AND st.tz >= r.s_trail)
         THEN r.s_trail ELSE st.tz END,
    CAST(CASE WHEN st.x = 0 THEN 1
         WHEN st.lz >= r.s_lead AND st.tz >= r.s_trail
         THEN 2 + (64 - r.s_lead - r.s_trail)
         ELSE 13 + (64 - least(st.lz, 31) - st.tz) END AS BIGINT)
  FROM rec r JOIN tsb st ON st.s = r.s AND st.i = r.i + 1
)
SELECT t.s AS series, CAST(t.i // 64 AS INT) AS block,
       count(*) AS n_samples,
       CAST(sum(t.ts_bits) AS BIGINT) AS ts_bits,
       CAST(sum(r.vbits) AS BIGINT) AS val_bits,
       CAST(count(*) FILTER (t.x = 0) AS BIGINT) AS n_xor_zero,
       CAST(sum(t.v) AS BIGINT) AS v_sum,
       CAST(min(t.v) AS BIGINT) AS v_min,
       CAST(max(t.v) AS BIGINT) AS v_max
FROM tsb t JOIN rec r ON r.s = t.s AND r.i = t.i
GROUP BY t.s, t.i // 64
""",
)
def tsdb_gorilla_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-extended storage posture, Gorilla TSDB compression (Pelkonen
    et al., VLDB 2015 — r5): the delta-of-delta + XOR bitstream
    encoding Prometheus's TSDB descends from (the reference delegates
    storage efficiency to Prometheus; here it is a first-class
    verifiable operator). Spark encodes each event_type series into a
    REAL bitstream, decodes it back, asserts bit-exact roundtrip, and
    emits per-64-sample-block stats: exact ts/value bit costs,
    xor-zero runs, and decoded-value sum/min/max (== originals by the
    asserted losslessness, the FLAC pattern). The oracle replays the
    dod bucket table with two window lags and the XOR control-window
    chain with a recursive CTE (leading/trailing zeros via exact
    bin()-string arithmetic — no float log2), so the driver hash pins
    every branch of the encoder's cost model plus the decode path."""
    ev = _t(spark, sf_dir, "events")
    return gorilla.gorilla_compress_features(ev)


@register(
    "promql_time_components",
    oracle="""
WITH s AS (
  SELECT event_id,
         epoch_us(ts) // 1000000 AS v,
         make_timestamp((epoch_us(ts) // 1000000) * 1000000) AS t,
         value, event_type
  FROM events
)
SELECT event_id,
       CAST(CASE event_id % 3 WHEN 0 THEN sign(-value)
            WHEN 1 THEN 0.0 ELSE sign(value) END AS DOUBLE) + 0.0 AS sgn,
       CAST(year(t) AS INT) AS year,
       CAST(month(t) AS INT) AS month,
       CAST(day(t) AS INT) AS day_of_month,
       CAST(dayofweek(t) % 7 AS INT) AS day_of_week,
       CAST(dayofyear(t) AS INT) AS day_of_year,
       CAST(day(last_day(t)) AS INT) AS days_in_month,
       CAST(hour(t) AS INT) AS hour,
       CAST(minute(t) AS INT) AS minute
FROM s
""",
)
def promql_time_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-extended, PromQL calendar + sign family (r5): `year month
    day_of_month day_of_week day_of_year days_in_month hour minute`
    (Prometheus functions.md) computed TIMEZONE-FREE via Hinnant's
    civil-from-days integer algorithm in pure Columns — session-TZ
    `F.year()` would silently shift under the vanilla driver session —
    plus `sgn` over a three-way stratum so all of {-1, 0, 1} appear.
    The oracle extracts components with DuckDB's own calendar library:
    two independent proleptic-Gregorian implementations, one hash
    (validated on 3005 random epochs through year ~2096 under a
    hostile session timezone)."""
    ev = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ: unix_micros() rejects it and a cast through
    # TIMESTAMP would read the session zone. date + h/m/s extraction is
    # TZ-free on NTZ, so the epoch reconstruction is deterministic.
    t = F.col("ts")
    v = (
        F.datediff(t.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + F.hour(t).cast("long") * 3600
        + F.minute(t).cast("long") * 60
        + F.second(t).cast("long")
    )
    comps = promql.time_component_columns(v)
    # + 0.0 flushes IEEE -0.0 (signum(-0.0) = -0.0; sf0.1 has a literal
    # zero value) to +0.0 — the README canon-safety rule
    sgn = (
        F.when(F.col("event_id") % 3 == 0, F.signum(-F.col("value")))
        .when(F.col("event_id") % 3 == 1, F.lit(0.0))
        .otherwise(F.signum(F.col("value")))
        .cast("double")
        + F.lit(0.0)
    )
    return ev.select(
        "event_id",
        sgn.alias("sgn"),
        *[c.alias(k) for k, c in comps.items()],
    )


@register(
    "hybrid_rrf_search",
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
), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT count(*) AS n,
         avg(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\s+')) END) AS avgdl
  FROM documents
), bm25 AS (
  SELECT tf.doc_id,
         round(sum(
           ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl))
         ), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats GROUP BY tf.doc_id
), lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rank
  FROM bm25 ORDER BY score DESC, doc_id ASC LIMIT 50
), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT c.vec_id AS doc_id,
         list_sum([qv[i]::DOUBLE * c.embedding[i]::DOUBLE
                   for i in range(1, len(qv)+1)])
           / (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
                             for i in range(1, len(qv)+1)]))
              * sqrt(list_sum([c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE
                               for i in range(1, len(c.embedding)+1)])))
           AS sim
  FROM embeddings c, q WHERE c.vec_id != 0
), dense AS (
  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS dense_rank
  FROM scored ORDER BY sim DESC, doc_id ASC LIMIT 50
), fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         CAST(l.lex_rank AS BIGINT) AS lex_rank,
         CAST(d.dense_rank AS BIGINT) AS dense_rank,
         coalesce(1.0 / (60 + l.lex_rank), 0.0)
           + coalesce(1.0 / (60 + d.dense_rank), 0.0) AS raw
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rank, dense_rank, round(raw, 6) AS rrf_score,
       CAST(row_number() OVER (ORDER BY raw DESC, doc_id ASC) AS BIGINT)
         AS fused_rank
FROM fused ORDER BY raw DESC, doc_id ASC LIMIT 20
""",
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/E5 hybrid retrieval, Reciprocal-Rank Fusion (Cormack et al.
    SIGIR 2009 — r5): the standard lexical+dense combiner every hybrid
    search stack ships — BM25 over documents (query terms 'spark query
    stream', depth 50) fused with exact cosine ANN over embeddings
    (query = vector 0, depth 50) by Σ 1/(60+rank), top-20. Ranks are
    INTEGERS, so the fusion arithmetic is float-hazard-free; the
    lexical ranking orders by the ROUNDED BM25 score (the hash-stable
    quantity bm25_query_scores already pins) with id tiebreaks. Both
    retriever depths are orderBy().limit() partial top-ks feeding
    bounded ≤50-row windows — never a global single-partition sort."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex_scores = text.bm25_scores(docs, ["spark", "query", "stream"])
    lex_top = lex_scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(50)
    wl = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = lex_top.withColumn("lex_rank", F.row_number().over(wl)).select(
        "doc_id", "lex_rank"
    )
    dense = (
        similarity.cosine_topk_bruteforce(
            emb, emb.where(F.col("vec_id") == 0), k=50
        )
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("dense_rank"))
    )
    return similarity.rrf_fuse(
        [lex, dense], rank_cols=["lex_rank", "dense_rank"]
    )


@register(
    "url_canonicalize",
    oracle="""
SELECT doc_id,
  CASE doc_id % 7
    WHEN 0 THEN 'http://example.com/a/s' || doc_id || '?a=1&b=2'
    WHEN 1 THEN 'https://www.test.org/d' || doc_id
    WHEN 2 THEN 'http://host' || doc_id || '.example/?x=' || doc_id
    WHEN 3 THEN 'http://h/p%2FqA/' || doc_id
    WHEN 4 THEN 'http://h' || doc_id || ':8080/k?x=' || doc_id || '&y=2&z=1'
    WHEN 5 THEN 'http://u@h' || doc_id || '.com/x' || doc_id
    ELSE 'http://ok.example/p' || doc_id || '?a=1'
  END AS canonical_url,
  CASE doc_id % 7
    WHEN 0 THEN 'example.com'
    WHEN 1 THEN 'www.test.org'
    WHEN 2 THEN 'host' || doc_id || '.example'
    WHEN 3 THEN 'h'
    WHEN 4 THEN 'h' || doc_id
    WHEN 5 THEN 'h' || doc_id || '.com'
    ELSE 'ok.example'
  END AS host,
  doc_id % 7 != 6 AS changed
FROM documents
""",
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 web curation, RFC 3986 URL canonicalization (r5): the
    normalization URL-level dedup runs before any content hashing —
    case folding, unreserved percent-decoding (+ hex uppercasing of
    preserved triplets), §5.2.4 dot-segment removal AFTER percent
    normalization (so %2E%2E is a real '..'), default-port and
    fragment dropping, stable query-param sort (documented non-RFC
    extra). Seven in-query strata exercise each rule — including an
    already-canonical stratum so `changed` splits both ways — and the
    oracle states each stratum's canonical form as a closed form of
    doc_id (the multimodal expected-value pattern; DuckDB has no URL
    library to serve as a second implementation). The Spark side is
    the GENERAL normalizer (functions/urlnorm.py), not stratum-driven
    — unit tests pin it on RFC examples the fixture never touches."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    variants = F.array(
        F.concat(F.lit("HTTP://Example.COM:80/a/./b/../s"), d, F.lit("?b=2&a=1#frag")),
        F.concat(F.lit("https://WWW.Test.ORG:443/%7Euser/%2e%2e/d"), d),
        F.concat(F.lit("http://Host"), d, F.lit(".example?x="), d),
        F.concat(F.lit("http://h/p%2fq%41/"), d),
        F.concat(F.lit("http://h"), d, F.lit(":8080/k?z=1&y=2&x="), d),
        F.concat(F.lit("http://u@H"), d, F.lit(".com:80/../x"), d),
        F.concat(F.lit("http://ok.example/p"), d, F.lit("?a=1")),
    )
    built = docs.select(
        "doc_id",
        F.element_at(variants, (F.col("doc_id") % 7 + 1).cast("int")).alias("url"),
    )
    return urlnorm.canonical_urls(built)


@register(
    "audio_fingerprint_neardup",
    oracle=_SPECTRO_CTES
    + """
, ftot AS (
  SELECT doc_id, f,
         31 - (max(CASE WHEN k >= 1 THEN pw * 32 + (31 - k) END) % 32) AS dom
  FROM dftp GROUP BY doc_id, f
), fp AS (
  SELECT doc_id,
         string_agg(CAST(dom AS VARCHAR), ',' ORDER BY f) AS fingerprint,
         count(*) AS n_frames
  FROM ftot GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fingerprint,
       a.n_frames
FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
""",
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/E2 audio dedup, spectral fingerprinting (r5): the
    chromaprint-family move — per-frame dominant-bin sequences as clip
    fingerprints, identical fingerprints equi-joined into dup pairs
    (amplitude- and noise-robust where byte hashing is not: every
    fixture clip has UNIQUE broadband residue, yet clips sharing the
    planted tone bin and frame count still pair — the join finds
    acoustic, not byte, duplicates). Composes the Q15 spectrogram, so
    the exact-int argmax chain keeps the oracle float-hazard-free;
    ids+fingerprints only in the shuffle, output bounded by true dup
    volume (the E1 exact-dedup posture)."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.fingerprint_neardup_pairs(docs)


# Mojibake fixture constants: REAL double-encodings produced by the
# encoding algebra itself (utf-8 bytes re-read as cp1252), not typed-in
# approximations — the oracle embeds the same literals, so both engines
# see byte-identical inputs and expected outputs.
_MOJI_CLEAN1 = "café é"
_MOJI1 = _MOJI_CLEAN1.encode("utf-8").decode("cp1252")
_MOJI_CLEAN2 = "déjà vu"
_MOJI2 = _MOJI_CLEAN2.encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")
_MOJI_BAIT = "x Ã x"  # marker present but NOT valid double-encoding


@register(
    "doc_mojibake_repair",
    oracle=f"""
SELECT doc_id,
  CASE doc_id % 4
    WHEN 0 THEN text || ' {_MOJI_CLEAN1}'
    WHEN 1 THEN text || ' {_MOJI_CLEAN2}'
    WHEN 2 THEN text || ' {_MOJI_BAIT}'
    ELSE text END AS text_fixed,
  doc_id % 4 IN (0, 1, 2) AS suspected,
  doc_id % 4 IN (0, 1) AS repaired,
  CAST(length(CASE doc_id % 4
    WHEN 0 THEN text || ' {_MOJI_CLEAN1}'
    WHEN 1 THEN text || ' {_MOJI_CLEAN2}'
    WHEN 2 THEN text || ' {_MOJI_BAIT}'
    ELSE text END) AS INT) AS n_chars_fixed
FROM documents
""",
)
def doc_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 web curation, mojibake repair (r5): the ftfy core move
    reimplemented from the encoding algebra — text whose cp1252
    re-encoding decodes as valid UTF-8 was double-encoded; repair and
    repeat (real crawls contain triple-encoded text). Four strata:
    single mojibake (cafÃ© class), DOUBLE mojibake (repaired in two
    passes), a marker-bait stratum ('Ã' present but NOT a valid double
    encoding — the repair must refuse), and untouched ASCII — so
    suspected and repaired each split both ways. Fixture mojibake is
    produced by the encoding functions themselves at import, never
    typed in; the oracle states the expected clean text as literals and
    the driver hash covers the FULL repaired text."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id") % 4
    built = docs.select(
        "doc_id",
        F.when(d == 0, F.concat(F.col("text"), F.lit(" " + _MOJI1)))
        .when(d == 1, F.concat(F.col("text"), F.lit(" " + _MOJI2)))
        .when(d == 2, F.concat(F.col("text"), F.lit(" " + _MOJI_BAIT)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return text.mojibake_features(built)


@register(
    "linkage_jaro_winkler_blocks",
    oracle="""
WITH names AS (
  SELECT doc_id,
         CASE doc_id % 10
           WHEN 0 THEN 'anderson' WHEN 1 THEN 'brooks'
           WHEN 2 THEN 'carter'   WHEN 3 THEN 'dawson'
           WHEN 4 THEN 'edwards'  WHEN 5 THEN 'foster'
           WHEN 6 THEN 'graham'   WHEN 7 THEN 'hughes'
           WHEN 8 THEN 'ingram'   ELSE 'jackson' END AS base,
         doc_id % 3 AS v
  FROM documents
), built AS (
  SELECT doc_id,
         CASE v
           WHEN 0 THEN base[1] || base[3] || base[2] || base[4:]
           WHEN 1 THEN base || 'son'
           ELSE base END AS name,
         base[1] AS block
  FROM names
), pairs AS (
  SELECT a.block, a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(round(jaro_winkler_similarity(a.name, b.name) * 1000000)
              AS BIGINT) AS jw_q6
  FROM built a JOIN built b ON a.block = b.block AND a.doc_id < b.doc_id
)
SELECT block, count(*) AS n_pairs,
       CAST(sum(CASE WHEN jw_q6 >= 900000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matches,
       CAST(sum(jw_q6) AS BIGINT) AS jw_mass_q6,
       CAST(max(jw_q6) AS BIGINT) AS jw_max_q6
FROM pairs GROUP BY block
""",
)
def linkage_jaro_winkler_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-ext record linkage (r5): blocking + Jaro-Winkler (Winkler
    1990, the census fuzzy-match) — ten surname classes with planted
    transposition and suffix typos, blocked by initial so the all-pairs
    explosion is contained to co-located blocks; per-pair scoring is an
    Arrow-batched pandas UDF of the FROM-SPEC implementation, and the
    oracle scores the same pairs with DuckDB's independent native
    jaro_winkler_similarity — two implementations, one hash (bit-equal
    on fuzz; the one convention divergence, both-empty = 0.0, is
    documented in functions/linkage.py). Float content reaches the
    hash only as the quantized-integer mass sum(round(jw*1e6)) — the
    repo's order-free term-quantization pattern."""
    docs = _t(spark, sf_dir, "documents")
    surnames = ["anderson", "brooks", "carter", "dawson", "edwards",
                "foster", "graham", "hughes", "ingram", "jackson"]
    base = F.element_at(
        F.array(*[F.lit(s) for s in surnames]),
        (F.col("doc_id") % 10 + 1).cast("int"),
    )
    v = F.col("doc_id") % 3
    # transposition typo: swap 2nd and 3rd characters
    swapped = F.concat(
        F.substring(base, 1, 1),
        F.substring(base, 3, 1),
        F.substring(base, 2, 1),
        F.substring(base, 4, 64),
    )
    name = (
        F.when(v == 0, swapped)
        .when(v == 1, F.concat(base, F.lit("son")))
        .otherwise(base)
    )
    built = docs.select(
        "doc_id",
        name.alias("name"),
        F.substring(base, 1, 1).alias("block"),
    )
    return linkage.blocked_jw_stats(built)


@register(
    "image_rotate_flip",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
)
SELECT doc_id AS media_id,
  CAST(min(h) AS INT) AS rot_w, CAST(min(w) AS INT) AS rot_h,
  CAST(sum((x+1) * (h-y) * ((doc_id + 3*x + 5*y) % 256)) AS BIGINT)
    AS wsum_rot_r,
  CAST(sum((w-x) * (y+1) * ((doc_id*7 + x) % 256)) AS BIGINT)
    AS wsum_fliph_g,
  CAST(sum((x+1) * (h-y) * ((doc_id*13 + y) % 256)) AS BIGINT)
    AS wsum_flipv_b
FROM px GROUP BY doc_id
""",
)
def image_rotate_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 geometric augmentation (r5): rotate-90°-clockwise and both
    flips on REAL decoded BMP pixel arrays (np.rot90/np.flip — the
    augmentation primitives), verified through POSITION-WEIGHTED sums
    Σ(x'+1)(y'+1)·channel: the oracle substitutes each transform's
    coordinate algebra into the closed-form gradient (rot90cw weight =
    (x+1)(h−y) on the source grid, fliph = (w−x)(y+1), flipv =
    (x+1)(h−y) on B), so any off-by-one, wrong axis, or
    transpose-without-reverse breaks the hash where a channel MEAN
    would hide every one of them. Exact int64 throughout."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.image_transform_features(docs)


@register(
    "audio_resample_q15",
    oracle="""
WITH d AS (
  SELECT doc_id, 40 + doc_id % 50 AS n_in,
         (40 + doc_id % 50) * 11025 // 8000 AS n_out
  FROM documents
), o AS (
  SELECT d.doc_id, d.n_in, d.n_out, j.range AS j,
         (j.range * 8000) // 11025 AS k,
         ((j.range * 8000) % 11025) * 32768 // 11025 AS frac
  FROM d CROSS JOIN range(124) j
  WHERE j.range < d.n_out
), s AS (
  SELECT doc_id, n_in, n_out, j,
         (doc_id * 3 + 11 * least(k, n_in - 1)) % 512 - 256 AS xk,
         (doc_id * 3 + 11 * least(k + 1, n_in - 1)) % 512 - 256 AS xk1,
         frac
  FROM o
), y AS (
  SELECT doc_id, n_in, n_out, j,
         xk + CAST(floor((xk1 - xk) * frac / 32768.0) AS BIGINT) AS v
  FROM s
)
SELECT doc_id AS media_id,
       CAST(min(n_in) AS INT) AS n_in,
       CAST(min(n_out) AS INT) AS n_out,
       CAST(sum(v) AS BIGINT) AS out_sum,
       CAST(min(v) AS BIGINT) AS out_min,
       CAST(max(v) AS BIGINT) AS out_max,
       CAST(sum((j + 1) * v) AS BIGINT) AS out_wsum
FROM y GROUP BY doc_id
""",
)
def audio_resample_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, sample-rate conversion (r5): the 8000→11025 Hz
    resample an ASR-prep pipeline runs, as Q15 fixed-point linear
    interpolation over a real WAV roundtrip — source position j·fs_in/
    fs_out split into exact floor + Q15 fraction, so every output
    sample is integer arithmetic the oracle replays verbatim
    (non-terminating rational ratio 320/441 exercises every fraction
    phase). The position-weighted sum pins output ORDER; min/max/sum
    pin the values. Exact int64 end-to-end."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.resample_features(docs)


@register(
    "doc_fold_accents",
    oracle="""
WITH built AS (
  SELECT doc_id,
         text || ' ' || CASE doc_id % 5
           WHEN 0 THEN 'Café Déjà Vu'
           WHEN 1 THEN 'NAÏVE Über Å'
           WHEN 2 THEN 'Kraków Gdańsk Łódź'
           WHEN 3 THEN 'Ωμέγα Σίγμα'
           ELSE 'plain ascii' END AS t
  FROM documents
)
SELECT doc_id,
       lower(strip_accents(t)) AS text_folded,
       lower(strip_accents(t)) != t AS changed,
       CAST(length(t) - length(lower(strip_accents(t))) AS INT) AS cp_delta
FROM built
""",
)
def doc_fold_accents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 search normalization, accent folding (r5): NFD-decompose,
    drop combining marks, lowercase — the index normalization that
    collides 'Café' with 'cafe' while PRESERVING non-accent letters
    (ł stays: stripping it is lossy transliteration, a different op).
    Five strata (French/German/Polish/Greek/ascii — the Polish one
    proves ł survives while ó folds, the Greek one that tonos strips
    under a non-Latin script; ascii keeps `changed` split). Spark runs
    stdlib unicodedata; DuckDB runs utf8proc strip_accents — two
    independent UCD implementations, one hash over the FULL folded
    text (the NFC-normalization pattern, verified on 11 candidate
    strata before fixture selection)."""
    docs = _t(spark, sf_dir, "documents")
    marker = F.element_at(
        F.array(
            F.lit("Café Déjà Vu"),
            F.lit("NAÏVE Über Å"),
            F.lit("Kraków Gdańsk Łódź"),
            F.lit("Ωμέγα Σίγμα"),
            F.lit("plain ascii"),
        ),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    built = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" "), marker).alias("text")
    )
    return text.accent_fold_features(built)


@register(
    "doc_char_entropy",
    oracle="""
WITH ch AS (
  SELECT doc_id, length(text) AS n, unnest(string_split(text, '')) AS c
  FROM documents WHERE trim(text) != ''
), runs AS (
  SELECT doc_id, n, c, count(*) AS cnt FROM ch GROUP BY doc_id, n, c
), agg AS (
  SELECT doc_id, CAST(min(n) AS INT) AS n_chars,
         CAST(count(*) AS INT) AS n_distinct,
         CAST(max(cnt) AS INT) AS max_run,
         CAST(sum(CAST(round(1000000 * (cnt / CAST(n AS DOUBLE))
                             * log2(n / CAST(cnt AS DOUBLE)), 0)
                  AS BIGINT)) AS BIGINT) AS entropy_q6
  FROM runs GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_chars, 0) AS n_chars,
       coalesce(a.n_distinct, 0) AS n_distinct,
       coalesce(a.max_run, 0) AS max_run,
       CAST(coalesce(a.entropy_q6, 0) AS BIGINT) AS entropy_q6
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
""",
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 quality, order-0 character entropy (r5): the classic text-vs-
    noise signal (boilerplate ≈ low bits/char, random bytes ≈ high,
    prose ≈ 4). Spark computes it ENTIRELY IN-ROW — sort the char
    array once and fold runs, banking a quantized term
    round(1e6·(c/n)·log2(n/c)) as each run closes — zero shuffle, the
    signal rides the scan at any corpus size; the oracle takes the
    orthodox explode+groupBy road. Quantized-term integer sums are
    order-free exact, so the only cross-engine float surface is a
    1-ulp log2 landing within 5e-7 of a rounding boundary (~1e-10 per
    term). Blank docs emit zeros on both sides."""
    docs = _t(spark, sf_dir, "documents")
    return text.char_entropy_features(docs)


@register(
    "speech_pipeline_v1",
    oracle=_spectro_ctes(
        "8 + doc_id % 5",
        "CASE WHEN (d.doc_id + i.range // 32) % 3 = 0 THEN 0 ELSE 1 END",
        208,
        12,
    )
    + f"""
, fr2 AS (
  SELECT doc_id, f, sum(pw) AS e_total,
         31 - (max(CASE WHEN k >= 1 THEN pw * 32 + (31 - k) END) % 32) AS dom
  FROM dftp GROUP BY doc_id, f
), act AS (
  SELECT doc_id, f, e_total, dom,
         CASE WHEN f != lag(f) OVER w + 1 THEN 1 ELSE 0 END AS brk
  FROM fr2 WHERE e_total >= {spectral.VAD_THRESHOLD}
  WINDOW w AS (PARTITION BY doc_id ORDER BY f)
), seg AS (
  SELECT doc_id, f, e_total, dom,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY f
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segment
  FROM act
)
SELECT doc_id AS media_id, CAST(segment AS BIGINT) AS segment,
       CAST(min(f) AS INT) AS start_frame,
       CAST(max(f) AS INT) AS end_frame,
       count(*) AS n_frames,
       CAST(sum(e_total) AS BIGINT) AS seg_energy,
       CAST(31 - (max(e_total * 32 + (31 - dom)) % 32) AS INT)
         AS peak_dominant_bin
FROM seg GROUP BY doc_id, segment
""",
)
def speech_pipeline_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 composed speech front-end (r5 flagship for the audio family,
    the curation_pipeline_v2 pattern): Q15 spectrogram → energy VAD
    islands → per-segment descriptors, with the segment rollup and the
    peak-frame dominant bin sharing ONE hash agg (lexicographic
    struct-max on (e_total, −bin) — no join-back, no second DFT pass).
    The oracle chains the whole pipeline: DFT CTEs, per-frame argmax,
    threshold, island merge, and the peak-frame pack (e_total·32 +
    (31−dom), hugeint-safe) — every stage exact int64, zero float
    hazard. Each emitted segment's peak bin recovers the clip's
    planted tone (unit-asserted), so the hash pins the composition's
    semantics, not just its algebra."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.speech_segments_with_descriptors(docs)
