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

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prom_etl_db_spark.functions.scratch import scratch
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
    """Zero-safe cosine: a zero-norm side scores 0.0, matching the
    numpy paths (`_normalized` patches zero norms to 1 → dot 0). The
    naive division yields NaN there, and NaN sorts ABOVE every real
    number under ``desc`` — a zero vector would become everyone's
    rank-1 neighbor in the IVF scorers."""
    denom = _norm(a) * _norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(a, b) / denom)


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Driver-side (ids, row-normalized float64 matrix) for the broadcast
    side of a brute-force scorer — same memory class as ``broadcast()``
    (the caller's contract is that this side is small; the LSH/IVF paths
    exist for when it is not)."""
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    if not rows:
        # shape (0, 0) — np.array([]) is 1-D and norm(axis=1) would
        # raise AxisError; callers early-return on an empty side
        return ids, np.zeros((0, 0), dtype=np.float64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def _normalized(batch):
    mat = np.array(list(batch), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _pairwise_cos_fn(va: pd.Series, vb: pd.Series) -> pd.Series:
    A = _normalized(va)
    B = _normalized(vb)
    return pd.Series(np.einsum("ij,ij->i", A, B))


def pairwise_cosine_udf(a: Column, b: Column) -> Column:
    """Row-wise cosine of two vector columns as an Arrow-batched pandas
    UDF (vectorized einsum). The Column-expression ``cosine()`` fold is
    interpreted per element — fine for a handful of pairs, ~100× slower
    when an LSH verify stage has millions of candidates. (Registered
    lazily: pandas_udf needs an active session.)"""
    return F.pandas_udf(_pairwise_cos_fn, "double")(a, b)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    The query set rides to every partition as a normalized float64 matrix
    (broadcast-class); each corpus partition scores itself against it with
    one BLAS matmul inside ``mapInPandas`` and emits only its LOCAL top-k
    per query — so the shuffle into the final global-rank window carries
    ≤ (partitions × |queries| × k) rows, never the full score matrix. The
    per-pair fold this replaces is interpreted per element (higher-order
    functions don't codegen) — matmul is ~100× on 64-dim vectors.
    Self-matches excluded. Output: (query_id, neighbor_id, cos_sim, rank).
    """
    import pandas as pd

    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    if not len(q_ids):
        # typed empty result, like the PQ paths — not a driver AxisError
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rank long"
        )
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat))

    def score(it):
        import numpy as np

        ids_q, Q = bq.value
        for pdf in it:
            if not len(pdf):
                continue
            C = _normalized(pdf[vec_col])
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            S = C @ Q.T  # (batch × queries)
            S[c_ids[:, None] == ids_q[None, :]] = -np.inf  # self-matches
            kk = min(k, len(c_ids))
            # local top-k per query column — argpartition picks an
            # ARBITRARY subset of rows tied at the kk-th score, which
            # would break the documented (desc cos_sim, asc neighbor_id)
            # determinism when the dropped tie has the smaller id; keep
            # every row at or above the boundary score instead and let
            # the global window break the ties
            top = np.argpartition(-S, kk - 1, axis=0)[:kk, :]
            out_q, out_n, out_s = [], [], []
            for j in range(len(ids_q)):
                boundary = S[top[:, j], j].min()
                rows = np.flatnonzero(S[:, j] >= boundary)
                out_q.extend([ids_q[j]] * len(rows))
                out_n.extend(c_ids[rows])
                out_s.extend(S[rows, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    scored = balance(corpus, id_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.where(F.col("cos_sim") != float("-inf"))
        .withColumn("rank", F.row_number().over(w))
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
    threshold. One side rides broadcast as a normalized matrix; each
    partition scores itself against it with one BLAS matmul and emits only
    the pairs over threshold — the correctness baseline for
    ``cosine_neardup_lsh``; use the LSH path when neither side fits in a
    broadcast. Output: (id_a, id_b, cos_sim), id_a < id_b."""
    import pandas as pd

    b_ids, b_mat = _collect_matrix(vectors, id_col, vec_col)
    if not len(b_ids):
        return vectors.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cos_sim double"
        )
    sc = vectors.sparkSession.sparkContext
    bb = sc.broadcast((b_ids, b_mat))

    def score(it):
        import numpy as np

        ids_b, B = bb.value
        for pdf in it:
            if not len(pdf):
                continue
            A = _normalized(pdf[vec_col])
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            S = A @ B.T
            ia, ib = np.where((S >= threshold) & (a_ids[:, None] < ids_b[None, :]))
            yield pd.DataFrame(
                {"id_a": a_ids[ia], "id_b": ids_b[ib], "cos_sim": S[ia, ib]}
            )

    out = balance(vectors, id_col).mapInPandas(
        score, "id_a long, id_b long, cos_sim double"
    )
    return out.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


def _hyperplanes(dim: int, n: int, seed: int = 42):
    """Deterministic random hyperplanes (fixed seed) for sign-LSH."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n, dim)).astype(float)


def lsh_auto_size(
    n_vectors: int, threshold: float, *, target_recall: float = 0.95
) -> tuple[int, int]:
    """(bands, bits) for sign-LSH sized to the corpus: ``bits`` grows with
    log₂(n) so RANDOM-pair candidate volume stays ~linear (random pairs
    collide per band at ~2^-bits, so n²·bands/2^bits stays O(n·bands) when
    2^bits ≈ n), then ``bands`` is the smallest count reaching the target
    recall at the threshold: recall = 1-(1-p^bits)^bands, p = 1-θ/π.

    ``2^bits ≈ n/16``: each vector random-collides with ~16 others per
    band, so candidate volume is ~8·n·bands — shuffle-bound, linear in n.
    (r4 re-pin: the previous ``n/256`` rule left candidate volume
    quadratic until n > 2^16 because the bits FLOOR dominated — measured
    87k → 8.66M pairs for 10× the vectors; the extra bands this rule
    needs for the same recall only grow the cheap BLAS projection and the
    n·bands signature rows, not the quadratic-ish collision term.)

    The bits floor is 8 (tiny corpora don't need fewer) and the cap 24
    (beyond that, band-count growth for recall outpaces the collision
    savings at moderate thresholds — shard the corpus instead)."""
    import math

    bits = max(8, min(24, math.ceil(math.log2(max(2, n_vectors))) - 4))
    p_bit = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_band = p_bit**bits
    if p_band >= 1.0:
        return 1, bits
    bands = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band))
    return max(1, bands), bits


def cosine_neardup_lsh(
    vectors: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int | None = None,
    bits: int | None = None,
    seed: int = 42,
    target_recall: float = 0.95,
) -> DataFrame:
    """E2 (embedding near-dup, scale path): random-hyperplane (SimHash)
    LSH. Per vector, ``bands×bits`` sign bits of dot products against fixed
    hyperplanes; vectors sharing one band's bit-pattern become candidates;
    candidates are verified with the exact cosine. Approximate by design —
    recall 1-(1-p^bits)^bands with p = 1 - θ/π; tune bands/bits to the
    target threshold. Never an all-pairs join: the candidate shuffle
    carries (id, band, key) only, like the MinHash banding in
    ``functions.dedup`` (same plan shape at 100 TB).

    Sizing: when ``bands``/``bits`` are None (the default), they are
    AUTO-SIZED from the corpus count via ``lsh_auto_size`` — ``bits``
    grows with log₂(corpus) so candidate volume stays near-linear, and
    ``bands`` is then chosen to hit ``target_recall`` at the threshold.
    (A static bits would silently go superlinear at 100× the corpus; a
    static bands at larger bits would silently lose recall.) The count is
    one cheap job over the already-persisted id+vec projection. Explicit
    values override — for true near-dup thresholds (≥0.9, p_bit ≳ 0.85) a
    handful of bands suffices and collisions concentrate on real dups.
    """
    v = balance(vectors, id_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    # read by the count, the signature pass, both verify joins; scratch-
    # registered so the job boundary can free it (see functions.scratch)
    v = scratch(v.persist())
    if bands is None or bits is None:
        # the sizing count doubles as cache materialization
        auto_bands, auto_bits = lsh_auto_size(
            v.count(), threshold, target_recall=target_recall
        )
        bands = auto_bands if bands is None else bands
        bits = auto_bits if bits is None else bits
    planes = _hyperplanes(dim, bands * bits, seed)

    # all bands×bits sign bits in ONE BLAS matmul per Arrow batch, packed
    # into an int64 key per band — 96 interpreted per-element fold
    # expressions would cost more than the candidate join itself
    weights = (2 ** np.arange(bits, dtype=np.int64)).reshape(1, bits)

    def band_keys_fn(vs: pd.Series) -> pd.Series:
        V = np.array(list(vs), dtype=np.float64)
        signs = (V @ planes.T) >= 0  # (batch × bands*bits)
        keys = (
            signs.reshape(len(V), bands, bits).astype(np.int64) * weights
        ).sum(axis=2)
        return pd.Series(list(keys))

    band_keys = F.pandas_udf(band_keys_fn, "array<long>")

    sig = v.select(
        "id", F.posexplode(band_keys(F.col("vec"))).alias("band", "key")
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
        .withColumn("cos_sim", pairwise_cosine_udf(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _nearest_centroids_udf(cent_ids, cent_mat, nprobe: int):
    """array<long> of the ``nprobe`` nearest centroid ids by cosine, as
    one BLAS matmul per Arrow batch against the closure-captured (and
    row-normalized) centroid matrix. ``cent_ids`` must be ASCENDING so
    the stable argsort's tie order is ascending-id — the same (desc sim,
    asc centroid_id) order the join formulation produced."""
    ids = np.asarray(cent_ids, dtype=np.int64)
    Cn = cent_mat / np.maximum(np.linalg.norm(cent_mat, axis=1, keepdims=True), 1e-30)

    def fn(v):
        M = _normalized(v)
        S = M @ Cn.T
        idx = np.argsort(-S, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([ids[row].tolist() for row in idx])

    return F.pandas_udf(fn, "array<long>")


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int | None = 16,
    nprobe: int | None = 4,
) -> DataFrame:
    """Approximate top-k via inverted-file (IVF) bucketing.

    Centroids = the ``num_centroids`` lowest-id corpus vectors (fixed
    seed rows — deterministic; ``clustering.kmeans`` refinement slots in
    here without changing the plan shape). ``num_centroids=None``
    auto-sizes to ~√n (the standard IVF rule: bucket width ≈ centroid
    count ≈ √n balances probe cost against scan cost), with nprobe then
    ~√centroids.

    Assignment/probing is one BLAS matmul per Arrow batch against the
    closure-broadcast centroid matrix — NOT a corpus × centroids join:
    at √n centroids that join is ~n^1.5 rows with a per-row fold, while
    the matmul stays one narrow pass. Each query then searches only its
    ``nprobe`` buckets via the (centroid_id) equi-join.
    """
    if num_centroids is None:
        n = corpus.count()
        num_centroids = max(4, int(math.isqrt(n)))
    if nprobe is None:
        nprobe = max(2, int(math.isqrt(num_centroids)))
    cent_rows = (
        corpus.orderBy(F.asc(id_col))
        .limit(num_centroids)
        .select(F.col(id_col), F.col(vec_col))
        .collect()
    )  # num_centroids × d — broadcast-class, like _collect_matrix
    cent_ids = [r[0] for r in cent_rows]
    cent_mat = np.array([r[1] for r in cent_rows], dtype=np.float64)

    c = balance(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    assign1 = _nearest_centroids_udf(cent_ids, cent_mat, 1)
    assigned = c.withColumn("centroid_id", assign1(F.col("c_vec"))[0])

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_n = _nearest_centroids_udf(cent_ids, cent_mat, nprobe)
    probes = q.select(
        "query_id",
        "q_vec",
        F.explode(probe_n(F.col("q_vec"))).alias("centroid_id"),
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


def _md5_planes(bits: int, dim: int, tag: str = "plane") -> list[list[float]]:
    """Deterministic hyperplanes whose every component is re-derivable in
    ANSI SQL: component (i, j) = md5("{tag}-i-j") first 8 hex chars as a
    32-bit int, mapped affinely onto [-1, 1). The map is all exact dyadic
    arithmetic (÷2^32, ×2, −1), so Python, the JVM, and DuckDB produce
    bit-identical doubles — which makes the downstream sign bits (and
    therefore the whole LSH code) engine-independent."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{tag}-{i}-{j}".encode()).hexdigest()[:8], 16)
            / 4294967296.0
            * 2.0
            - 1.0
            for j in range(dim)
        ]
        for i in range(bits)
    ]


def signlsh_codes(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    bits: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Sign-LSH (random-hyperplane / SRP) bucket codes as ONE narrow
    projection: code = Σ 2^i over planes with vec·plane_i > 0.

    This is the deterministic, oracle-checkable verification surface for
    the production :func:`cosine_neardup_lsh` (whose auto-sized
    numpy-seeded planes aren't SQL-expressible): same estimator —
    P(bit_a = bit_i) = 1 − θ(a,b)/π — different plane family. Dots are
    strict left folds (:func:`_dot`), matching DuckDB's sequential
    ``list_sum`` bit for bit, so even near-zero dots sign identically.

    Scale: pure whole-stage-codegen column math, zero shuffles, zero
    Python; 100 TB cost is one pass over the vectors. Output:
    (id_col, code).
    """
    planes = _md5_planes(bits, dim)
    code = None
    for i, plane in enumerate(planes):
        bit = F.when(
            _dot(F.col(vec_col), F.array(*[F.lit(v) for v in plane])) > 0,
            F.lit(1 << i).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        code = bit if code is None else code + bit
    return emb.select(F.col(id_col), code.alias("code"))


def signlsh_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    bits: int = 16,
    dim: int = 64,
) -> str:
    """DuckDB dual of :func:`signlsh_codes` — re-derives the md5 planes
    and folds the dots in the same element order."""
    return f"""
WITH v AS (
  SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS vec
  FROM {table}
), pl AS (
  SELECT i.range AS i,
         list_transform(range(0, {dim}), j ->
           (CAST(('0x' || substr(md5('plane-' || CAST(i.range AS VARCHAR) || '-'
                                  || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
            / 4294967296.0) * 2.0 - 1.0) AS plane
  FROM range({bits}) i
), dots AS (
  SELECT v.{id_col}, pl.i,
         list_sum(list_transform(range(1, {dim + 1}), j -> v.vec[j] * pl.plane[j])) AS dot
  FROM v CROSS JOIN pl
)
SELECT {id_col},
       CAST(sum(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS BIGINT) AS code
FROM dots GROUP BY {id_col}
"""


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Scalar int8 quantization: per-DIMENSION min/max over the corpus,
    then code = round((x − mn)/(mx − mn)·255) per element — the memory
    lever that makes billion-vector ANN serveable (4× smaller than f32;
    IVF probes scan codes and only re-rank survivors in full precision).

    Scale: per-dim stats are ONE hash aggregation over (dim) — d rows —
    collected driver-side (d×2 doubles, broadcast-class, same contract
    as the k-means centroid collect); the encode pass is a pure Column
    transform with the stats as literals. A constant dimension (mx = mn)
    quantizes to 0.

    Output: (id, codes array<int>) — callers project sums/slices.
    """
    from pyspark.sql import functions as F

    dims = (
        emb.select(F.posexplode(vec_col).alias("i", "e"))
        .select("i", F.col("e").cast("double").alias("e"))
        .groupBy("i")
        .agg(F.min("e").alias("mn"), F.max("e").alias("mx"))
        .collect()
    )
    mn = {r["i"]: r["mn"] for r in dims}
    mx = {r["i"]: r["mx"] for r in dims}
    d = len(dims)
    mns = F.array(*[F.lit(mn[i]) for i in range(d)])
    mxs = F.array(*[F.lit(mx[i]) for i in range(d)])
    codes = F.zip_with(
        F.col(vec_col),
        F.zip_with(mns, mxs, lambda a, b: F.struct(a.alias("mn"), b.alias("mx"))),
        lambda x, s: F.when(
            s["mx"] > s["mn"],
            F.round(
                (x.cast("double") - s["mn"]) / (s["mx"] - s["mn"]) * 255, 0
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return emb.select(F.col(id_col).alias("id"), codes.alias("codes"))


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int | None = None,
    kmeans_iters: int = 0,
) -> int:
    """Build and PERSIST an IVF index: a centroid table plus the corpus
    partitioned into inverted lists on disk.

    Layout (two parquet tables under ``path``):

    - ``centroids/``: (centroid_id, vector) — √n-ish rows, the probe map.
    - ``lists/``: (vec_id, embedding) PARTITIONED BY centroid_id — the
      inverted file IS the directory structure, so a query probing
      ``nprobe`` buckets scans exactly those directories (Spark partition
      pruning; asserted by the plan test) and never touches the rest of
      the corpus. At 100 TB this is the difference between an ANN query
      reading ~nprobe/√n of the data and reading all of it.

    ``kmeans_iters > 0`` refines the deterministic hash-seeded centroids
    with that many Lloyd rounds (``clustering.kmeans``); 0 keeps the raw
    seeds (cheapest build, same plan shapes). Returns the centroid count.
    """
    from pathlib import Path

    from prom_etl_db_spark.functions import clustering

    if num_centroids is None:
        n = corpus.count()
        num_centroids = max(4, int(math.isqrt(n)))
    if kmeans_iters > 0:
        km = clustering.kmeans(
            corpus, num_centroids, n_iter=kmeans_iters,
            id_col=id_col, vec_col=vec_col,
        ).select(
            F.col(id_col), F.col(vec_col), F.col("cluster").alias("centroid_id")
        )
        # centroid = per-dimension mean of its members: posexplode + two
        # hash aggs (the (cluster, dim) partial-sum shape kmeans itself
        # uses), rebuilt into ordered arrays
        cent = (
            km.select("centroid_id", F.posexplode(vec_col).alias("i", "e"))
            .groupBy("centroid_id", "i")
            .agg(F.avg(F.col("e").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("i", "m"))
                ).alias("__sm")
            )
            .select(
                "centroid_id",
                F.transform(F.col("__sm"), lambda s: s["m"]).alias("vector"),
            )
        )
        # Rebuild the inverted lists by COSINE against the final
        # centroids — the same metric `cosine_topk_ivf_index` routes
        # queries with. Keeping kmeans' squared-euclidean labels would
        # mean probing centroids whose lists were populated under a
        # different metric (recall silently degrades on unnormalized
        # embeddings); it also heals the labels' one-iteration lag
        # behind the returned mean centroids. kmeans can drop empty
        # clusters, so the rows (not the request) are the truth.
        cent_rows = sorted(cent.collect(), key=lambda r: r["centroid_id"])
        ids = [r["centroid_id"] for r in cent_rows]
        mat = np.array([r["vector"] for r in cent_rows], dtype=np.float64)
        assign1 = _nearest_centroids_udf(ids, mat, 1)
        assigned = corpus.select(
            F.col(id_col), F.col(vec_col)
        ).withColumn("centroid_id", assign1(F.col(vec_col))[0])
    else:
        seeds = (
            corpus.orderBy(F.asc(id_col))
            .limit(num_centroids)
            .select(F.col(id_col), F.col(vec_col))
        )
        # centroid_id = dense 0..k-1 by ascending source id (deterministic;
        # the window runs over num_centroids rows, not the corpus)
        w = Window.orderBy(F.asc(id_col))
        cent = seeds.select(
            (F.row_number().over(w) - 1).cast("long").alias("centroid_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "vector"
            ),
        )
        cent_rows = sorted(cent.collect(), key=lambda r: r["centroid_id"])
        ids = [r["centroid_id"] for r in cent_rows]
        mat = np.array([r["vector"] for r in cent_rows], dtype=np.float64)
        assign1 = _nearest_centroids_udf(ids, mat, 1)
        assigned = corpus.select(
            F.col(id_col), F.col(vec_col)
        ).withColumn("centroid_id", assign1(F.col(vec_col))[0])

    root = Path(path)
    cent.coalesce(1).write.mode("overwrite").parquet(str(root / "centroids"))
    (
        assigned.select(id_col, vec_col, "centroid_id")
        .write.partitionBy("centroid_id")
        .mode("overwrite")
        .parquet(str(root / "lists"))
    )
    # the ACTUAL centroid count, which callers size nprobe from: kmeans
    # drops empty clusters, and a corpus smaller than the request seeds
    # fewer rows — returning the requested number would miscalibrate both
    return len(cent_rows)


def cosine_topk_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int | None = None,
) -> DataFrame:
    """Query a PERSISTED IVF index (see ``build_ivf_index``): load the
    centroid map (broadcast-class collect), route each query to its
    ``nprobe`` nearest centroids, and scan ONLY those inverted-list
    partitions — the ``centroid_id IN (...)`` predicate prunes at the
    directory level, so I/O is ~nprobe/num_centroids of the corpus.

    Same scoring tail as ``cosine_topk_ivf``: BLAS cosine per Arrow
    batch, per-query top-k window over bucket-bounded candidates.
    """
    from pathlib import Path

    root = Path(path)
    cent_rows = sorted(
        spark.read.parquet(str(root / "centroids")).collect(),
        key=lambda r: r["centroid_id"],
    )
    ids = [r["centroid_id"] for r in cent_rows]
    mat = np.array([r["vector"] for r in cent_rows], dtype=np.float64)
    if nprobe is None:
        nprobe = max(2, int(math.isqrt(len(ids))))

    probe_n = _nearest_centroids_udf(ids, mat, nprobe)
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_n(F.col(vec_col))).alias("centroid_id"),
    )
    probed_ids = sorted(
        {r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()}
    )
    lists = (
        spark.read.parquet(str(root / "lists"))
        .where(F.col("centroid_id").isin(probed_ids))  # partition-pruned
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            "centroid_id",
        )
    )
    scored = (
        lists.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
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


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_cols: list[str] | None = None,
    k: int = 60,
    top: int = 20,
) -> DataFrame:
    """Reciprocal-Rank Fusion (Cormack et al., SIGIR 2009) — the
    standard hybrid-retrieval combiner: each input ranking contributes
    1/(k + rank) and documents are re-ranked by the sum. Inputs are
    (id, rank) DataFrames (rank already truncated to each retriever's
    depth).

    Determinism: RRF scores are sums of ≤len(rankings) terms computed
    from INTEGER ranks — identical operands and one fixed fold order on
    both engines, so the fused ordering has no float hazard; ties break
    on id. Scale: depth-truncated inputs are tiny (candidates ≤
    Σdepths), so the fusion is a broadcast-class full-outer join and
    the final top-N is orderBy().limit() (TakeOrderedAndProject — a
    per-partition partial top-k, never a global single-partition
    window)."""
    from functools import reduce

    rank_cols = rank_cols or [f"rank_{i}" for i in range(len(rankings))]
    fused = reduce(
        lambda a, b: a.join(b, id_col, "full_outer"),
        [
            r.select(id_col, F.col(r.columns[1]).alias(c))
            for r, c in zip(rankings, rank_cols)
        ],
    )
    score = reduce(
        lambda a, b: a + b,
        [
            F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col(c).cast("double")), F.lit(0.0)
            )
            for c in rank_cols
        ],
    )
    scored = fused.select(
        id_col,
        *[F.col(c).cast("long").alias(c) for c in rank_cols],
        F.round(score, 6).alias("rrf_score"),
        score.alias("__raw"),
    )
    topn = scored.orderBy(F.desc("__raw"), F.asc(id_col)).limit(top)
    w = Window.orderBy(F.desc("__raw"), F.asc(id_col))
    return (
        topn.withColumn("fused_rank", F.row_number().over(w))
        .drop("__raw")
    )
