"""Embedding similarity search (SURVEY.md §2.E E3).

Two paths over an ``array<float>`` column:

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query set
  against the corpus; the dot product is a JVM-side ``aggregate(zip_with)``
  fold, no Python in the hot path. At 100 TB the corpus side streams
  through executors once; the only shuffle is the final per-query top-k
  (tiny: k rows per partition after partial ``min_by``-style pruning).
- ``cosine_topk_ivf`` — IVF-style scale path: assign corpus vectors to the
  nearest of C centroids (one broadcast pass), search only the ``nprobe``
  closest centroid buckets per query. Recall<1, cost ~ nprobe/C of brute
  force; the bucket assignment reuses the same JVM-side cosine.

Deterministic everywhere: ties break on vec_id; centroids are seeded from
fixed corpus rows (no RNG, no ``Date.now``-style nondeterminism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prom_etl_db_spark.parallel import balance

__all__ = [
    "cosine",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_neardup_pairs",
    "cosine_neardup_lsh",
]


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a strict left-to-right double fold — whole-stage-codegen
    territory, and index-ordered so results are reproducible bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``broadcast(queries)`` — the corpus never shuffles for the join; the
    row_number window afterwards shuffles only (|queries| × |corpus|)
    scored rows, which AQE coalesces. Self-matches excluded.
    Output: (query_id, neighbor_id, cos_sim) with rank ≤ k.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = balance(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E2 (embedding near-dup, exact): all unordered pairs with cosine ≥
    threshold. One side broadcast, the other streams — the correctness
    baseline for ``cosine_neardup_lsh``; use the LSH path when neither side
    fits in a broadcast. Output: (id_a, id_b, cos_sim), id_a < id_b."""
    a = balance(vectors, id_col).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _hyperplanes(dim: int, n: int, seed: int = 42):
    """Deterministic random hyperplanes (fixed seed) for sign-LSH."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n, dim)).astype(float)


def cosine_neardup_lsh(
    vectors: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = 16,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """E2 (embedding near-dup, scale path): random-hyperplane (SimHash)
    LSH. Per vector, ``bands×bits`` sign bits of dot products against fixed
    hyperplanes; vectors sharing one band's bit-pattern become candidates;
    candidates are verified with the exact cosine. Approximate by design —
    recall 1-(1-p^bits)^bands with p = 1 - θ/π; tune bands/bits to the
    target threshold. Never an all-pairs join: the candidate shuffle
    carries (id, band, key) only, like the MinHash banding in
    ``functions.dedup`` (same plan shape at 100 TB).
    """
    planes = _hyperplanes(dim, bands * bits, seed)
    v = balance(vectors, id_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )

    def plane_dot(p) -> Column:
        # dot(vec, p) with the plane folded in as literals — JVM arithmetic
        return F.aggregate(
            F.zip_with(
                F.col("vec"),
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(
                    *[
                        F.when(plane_dot(planes[b * bits + j]) >= 0, F.lit("1")).otherwise(
                            F.lit("0")
                        )
                        for j in range(bits)
                    ]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    v = v.persist()  # read by the signature pass and both verify joins
    sig = v.select("id", F.explode(band_keys).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # candidate shuffle carries (id, band, key) triples only — the wide
    # vectors re-join by id AFTER pair dedup, exactly like the MinHash
    # banding path (shingle sets never ride the candidate shuffle).
    cand = (
        sig.alias("l")
        .join(
            sig.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    vb = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k via inverted-file (IVF) bucketing.

    Centroids = the ``num_centroids`` lowest-id corpus vectors (fixed seed
    rows — deterministic; a k-means refinement would slot in here without
    changing the plan shape). Corpus rows are assigned to their nearest
    centroid (broadcast pass); each query searches its ``nprobe`` nearest
    centroid buckets only. Same output shape as brute force.
    """
    cent = (
        corpus.orderBy(F.asc(id_col))
        .limit(num_centroids)
        .select(
            F.monotonically_increasing_id().alias("_tmp"),  # not used as key
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("cent_vec"),
        )
        .drop("_tmp")
    )

    c = balance(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    # assign: argmax cosine over broadcast centroids — one pass, no shuffle
    assigned = (
        c.join(F.broadcast(cent))
        .withColumn("c_sim", cosine(F.col("c_vec"), F.col("cent_vec")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("neighbor_id").orderBy(
                    F.desc("c_sim"), F.asc("centroid_id")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("neighbor_id", "c_vec", "centroid_id")
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("c_sim", cosine(F.col("q_vec"), F.col("cent_vec")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
            ),
        )
        .where(F.col("rn") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )

    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
        .dropDuplicates(["query_id", "rank"])
    )
