"""Embedding clustering: distributed Lloyd's k-means and SemDeDup-style
semantic dedup (SURVEY.md §2.E — dedup/similarity family).

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) prunes semantic duplicates
by clustering embeddings first and comparing pairs only WITHIN a cluster —
the cluster bound is what makes semantic dedup tractable at corpus scale
(Σ|cluster|² ≪ n²; with k ≈ √n and balanced clusters the candidate volume
stays ~n^1.5 instead of n²).

Scale posture of each step:
  - the driver holds only the k×d centroid matrix (broadcast-class); all
    per-vector work happens executor-side in Arrow-batched pandas UDFs
    (one BLAS matmul per batch, never per-row Python);
  - the centroid update is a (cluster, dim) hash aggregation with
    map-side partial sums — no window, no driver data path;
  - iteration control flow is driver-side Python over a k×d array, like
    the connected-components loop in ``functions.dedup``.

Determinism contract (what makes the DuckDB oracle hash-match): the
init picks the k vectors with the smallest md5(id‖salt) (same rule as
``sampling.hash_position``); centroids are rounded to ``round_decimals``
after init and after every update, so both engines iterate over BITWISE
IDENTICAL centroids and float-summation-order noise (~1e-12, vs
inter-centroid distance gaps ~1e-1) cannot flip an argmin; assignment
ties break to the lowest cluster index in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.similarity import pairwise_cosine_udf
from prom_etl_db_spark.functions.scratch import scratch
from prom_etl_db_spark.parallel import balance

__all__ = [
    "kmeans_init",
    "kmeans_init_spread",
    "assign_clusters",
    "kmeans",
    "kmeans_centroids",
    "semantic_neardup_pairs",
    "pq_train",
    "pq_encode",
    "pq_codes",
    "pq_adc_topk",
    "pq_adc_topk_ivf",
    "build_ivfpq_index",
    "pq_adc_topk_ivfpq_index",
]


def kmeans_init(
    vectors: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans-init",
    round_decimals: int = 6,
):
    """Deterministic seeding: the k vectors with the smallest
    md5(id‖salt), as a k×d float64 numpy array (rounded). A sort-limit-k
    over (hash, id) — Spark plans it as a TakeOrderedAndProject, so no
    global sort materializes."""
    import numpy as np

    rows = (
        vectors.select(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("__h"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__v"),
        )
        .orderBy("__h", "__id")
        .limit(k)
        .collect()
    )
    return np.round(np.array([r["__v"] for r in rows], dtype=np.float64), round_decimals)


def kmeans_init_spread(
    vectors: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans-init",
    round_decimals: int = 6,
):
    """Deterministic farthest-point (greedy k-center) seeding: start from
    the min-hash vector, then repeatedly take the vector farthest from the
    chosen set (ties → smallest id). Immune to the all-seeds-in-one-blob
    failure of hash seeding, at the cost of k−1 extra passes over the
    corpus (each a narrow pandas-UDF max-reduce; fine for the small k this
    is meant for — k ≈ √n sharding wants the hash init instead)."""
    import numpy as np
    import pandas as pd  # noqa: F401

    first = (
        vectors.select(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("__h"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__v"),
        )
        .orderBy("__h", "__id")
        .limit(1)
        .collect()[0]
    )
    chosen = [np.asarray(first["__v"], dtype=np.float64)]
    for _ in range(k - 1):
        C = np.round(np.array(chosen), round_decimals)
        c_sq = (C * C).sum(axis=1)

        def min_dist(v):
            M = np.array(list(v), dtype=np.float64)
            d2 = (M * M).sum(axis=1, keepdims=True) - 2.0 * (M @ C.T) + c_sq
            return pd.Series(d2.min(axis=1))

        min_dist_udf = F.pandas_udf(min_dist, "double")
        far = (
            vectors.select(
                F.col(id_col).alias("__id"),
                F.col(vec_col).alias("__v"),
                min_dist_udf(F.col(vec_col)).alias("__d"),
            )
            .orderBy(F.col("__d").desc(), F.col("__id").asc())
            .limit(1)
            .collect()[0]
        )
        chosen.append(np.asarray(far["__v"], dtype=np.float64))
    return np.round(np.array(chosen), round_decimals)


def assign_clusters(
    vectors: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_ids=None,
) -> DataFrame:
    """(id, vec, cluster): nearest centroid by squared euclidean distance,
    ties to the lowest cluster id (numpy argmin's first-minimum rule over
    rows sorted by id). ``cluster_ids`` maps centroid-matrix rows back to
    stable cluster labels (defaults to 0..k−1) — after an empty-cluster
    drop the surviving labels keep their original numbers. One BLAS
    matmul per Arrow batch against the closure-captured k×d matrix — the
    pandas-UDF equivalent of a broadcast join."""
    import numpy as np
    import pandas as pd  # noqa: F401 — worker-side dependency of the UDF

    C = centroids  # k×d float64
    labels = np.arange(len(C)) if cluster_ids is None else np.asarray(cluster_ids)
    c_sq = (C * C).sum(axis=1)  # |c|² per centroid

    # no type hints: pandas_udf would try (and fail) to infer the eval type
    # from them because pd is only in scope inside this function
    def nearest(v):
        M = np.array(list(v), dtype=np.float64)  # b×d
        # argmin over |v|² − 2v·c + |c|²; |v|² is constant per row → drop
        d2 = -2.0 * (M @ C.T) + c_sq  # b×k
        return pd.Series(labels[np.argmin(d2, axis=1)].astype(np.int64))

    nearest_udf = F.pandas_udf(nearest, "long")
    return vectors.select(
        F.col(id_col), F.col(vec_col), nearest_udf(F.col(vec_col)).alias("cluster")
    )


def kmeans(
    vectors: DataFrame,
    k: int,
    *,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans-init",
    round_decimals: int = 6,
    init: str = "hash",
) -> DataFrame:
    """Lloyd's k-means for a FIXED iteration count: hash-seeded init, then
    ``n_iter`` assign→update rounds; returns the final (id, vec, cluster)
    assignment. Fixed-count (rather than tol-based) iteration keeps the
    computation SQL-expressible, so the registry entry gets a hash-match
    oracle instead of a rows-only check — at pipeline scale 2-5 rounds is
    also simply what one runs (SemDeDup uses few, coarse iterations).

    ``init``: "hash" (default) is the single-pass SQL-expressible seeding
    the oracle mirrors; "spread" is deterministic farthest-point — better
    separation on clumpy data, k−1 extra passes, not SQL-mirrored.

    Empty-cluster rule: a centroid that attracts no members drops out of
    the next round (both engines); k can only shrink.

    Per round: one narrow pandas-UDF pass (assign) + one posexplode and a
    (cluster, dim) hash agg with partial sums (update) + a k×d collect.
    The input is re-read each round — persist() upstream if the source
    scan is expensive.
    """
    v = balance(vectors.select(id_col, vec_col), id_col)
    labels, C = _kmeans_loop(
        v, k, n_iter=n_iter, id_col=id_col, vec_col=vec_col, salt=salt,
        round_decimals=round_decimals, init=init,
    )
    return assign_clusters(v, C, id_col=id_col, vec_col=vec_col, cluster_ids=labels)


def _kmeans_loop(
    v: DataFrame,
    k: int,
    *,
    n_iter: int,
    id_col: str,
    vec_col: str,
    salt: str,
    round_decimals: int,
    init: str,
):
    """Shared fixed-iteration Lloyd loop: returns the FINAL (cluster
    labels, centroid matrix) after ``n_iter − 1`` assign→update rounds.
    ``kmeans`` materializes one more assignment against it; encode-only
    callers (product quantization) capture the matrix directly."""
    import numpy as np

    init_fn = {"hash": kmeans_init, "spread": kmeans_init_spread}[init]
    C = init_fn(
        v, k, id_col=id_col, vec_col=vec_col, salt=salt, round_decimals=round_decimals
    )
    labels = list(range(len(C)))
    for _ in range(n_iter - 1):
        assigned = assign_clusters(
            v, C, id_col=id_col, vec_col=vec_col, cluster_ids=labels
        )
        means = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        clusters = sorted({r["cluster"] for r in means})
        dim = max(r["pos"] for r in means) + 1
        C = np.zeros((len(clusters), dim))
        index_of = {c: i for i, c in enumerate(clusters)}
        for r in means:
            C[index_of[r["cluster"]], r["pos"]] = r["m"]
        C = np.round(C, round_decimals)
        labels = clusters
    return labels, C


def kmeans_centroids(
    vectors: DataFrame,
    k: int,
    *,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans-init",
    round_decimals: int = 6,
    init: str = "hash",
):
    """Training half of ``kmeans``: the final (cluster labels, k×d
    centroid matrix) of the fixed-iteration loop, without materializing
    the final assignment DataFrame. Same determinism contract."""
    v = balance(vectors.select(id_col, vec_col), id_col)
    return _kmeans_loop(
        v, k, n_iter=n_iter, id_col=id_col, vec_col=vec_col, salt=salt,
        round_decimals=round_decimals, init=init,
    )


def semantic_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    *,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "hash",
) -> DataFrame:
    """SemDeDup candidate pairs: (id_a, id_b, cluster, cos_sim) for pairs
    in the SAME k-means cluster with round(cosine, 6) ≥ threshold, id_a <
    id_b. The equi-join on cluster is what bounds the pair count —
    Σ|cluster|² work instead of n² (choose k ≈ √n at scale so clusters
    stay ~√n wide); the cosine verify is one Arrow-batched einsum.
    Recall is bounded by clustering quality — a true near-dup pair split
    across clusters is missed (the SemDeDup trade; the exact
    ``cosine_neardup_pairs`` is the small-corpus baseline)."""
    assigned = scratch(
        kmeans(
            vectors, k, n_iter=n_iter, id_col=id_col, vec_col=vec_col, init=init
        ).persist()
    )
    a = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
    )
    pairs = a.join(b, "cluster").where(F.col("id_a") < F.col("id_b"))
    sim = F.round(pairwise_cosine_udf(F.col("__va"), F.col("__vb")), 6)
    return (
        pairs.withColumn("cos_sim", sim)
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cluster", "cos_sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid — "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011): the billion-vector ANN compression
# standard (FAISS IVF-PQ). Split each d-dim vector into m contiguous
# subspaces, train an independent k-way codebook per subspace, encode each
# vector as m small integers, and score queries against CODES via an m×k
# lookup table (asymmetric distance computation) instead of full vectors.
#
# Scale posture: training is m deterministic k-means runs whose collects are
# k×(d/m) doubles each (k×d total — broadcast-class, same contract as
# ``kmeans``); encoding is ONE Arrow-batched pandas-UDF pass with all m
# centroid matrices closure-captured (no per-subspace shuffle joins); ADC
# scoring is a pure-Column fold over an exploded literal query-table array —
# JVM-side, no Python in the scan. At 100 TB the ADC scan composes with the
# IVF partition pruning in ``similarity.cosine_topk_ivf_index`` (probe the
# inverted lists, scan codes, re-rank survivors in full precision).
#
# Determinism contract (what the DuckDB oracle mirrors): per-subspace
# codebooks inherit the ``kmeans`` contract (md5 hash init with a
# per-subspace salt, fixed iterations, 6-dp centroid rounding, ties to the
# lowest cluster id); ADC table entries are squared-L2 sums folded
# LEFT-TO-RIGHT over the subspace dims then rounded to 6 dp, so identical
# code → bit-identical score in both engines.
# ---------------------------------------------------------------------------


def pq_train(
    vectors: DataFrame,
    *,
    m: int = 2,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans-init-pq",
    round_decimals: int = 6,
):
    """Train m independent per-subspace codebooks. Returns a list of
    (labels, centroid-matrix, dim-offset) per subspace; the vector
    dimension is probed from one row and must divide evenly by m."""
    first = vectors.select(vec_col).first()
    if first is None:
        raise ValueError("pq_train: empty corpus")
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    books = []
    for j in range(m):
        sub = vectors.select(
            F.col(id_col), F.slice(vec_col, j * ds + 1, ds).alias("__sub")
        )
        labels, C = kmeans_centroids(
            sub, k, n_iter=n_iter, id_col=id_col, vec_col="__sub",
            salt=f"{salt}{j}", round_decimals=round_decimals,
        )
        books.append((labels, C, j * ds))
    return books


def pq_encode(
    vectors: DataFrame,
    books,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    passthrough: tuple = (),
) -> DataFrame:
    """(id[, passthrough…], codes array<long> length m): nearest
    per-subspace centroid for every vector, all m subspaces in ONE
    Arrow-batched pass (one small BLAS matmul per subspace per batch).
    Ties to the lowest cluster label, the ``assign_clusters`` rule.
    ``passthrough`` names extra columns carried alongside (e.g. an IVF
    centroid assignment computed in the same pass)."""
    import numpy as np
    import pandas as pd  # noqa: F401 — worker-side dependency of the UDF

    prepared = [
        (np.asarray(labels, dtype=np.int64), np.asarray(C), off, C.shape[1])
        for labels, C, off in books
    ]

    def encode(v):
        M = np.array(list(v), dtype=np.float64)
        out = np.empty((len(M), len(prepared)), dtype=np.int64)
        for j, (labels, C, off, ds) in enumerate(prepared):
            S = M[:, off : off + ds]
            d2 = -2.0 * (S @ C.T) + (C * C).sum(axis=1)
            out[:, j] = labels[np.argmin(d2, axis=1)]
        return pd.Series(list(out))

    encode_udf = F.pandas_udf(encode, "array<long>")
    return vectors.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in passthrough],
        encode_udf(F.col(vec_col)).alias("codes"),
    )


def pq_codes(
    vectors: DataFrame,
    *,
    m: int = 2,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train + encode: (id, codes array<long> length m)."""
    books = pq_train(
        vectors, m=m, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    return pq_encode(vectors, books, id_col=id_col, vec_col=vec_col)


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    m: int = 2,
    k: int = 4,
    n_iter: int = 2,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: score every corpus CODE against each
    query's m×k lookup table (entry = round(‖q_sub − centroid‖², 6), sums
    folded left-to-right like DuckDB's list_sum so the oracle hash-matches)
    and keep the ``topk`` smallest per query (ties to the lowest neighbor
    id). The query table array is a literal — the explode is the pandas-UDF
    -free equivalent of a broadcast join; the per-query rank is one window
    over an equi-partitioned shuffle. Queries must be broadcast-class
    (collected driver-side), the corpus is never collected.

    A corpus row whose id EQUALS the query's id is excluded (the
    self-match convention shared with ``cosine_topk_bruteforce``) — if
    queries come from a different table whose id space overlaps the
    corpus, disambiguate ids first or the colliding row is silently
    skipped."""
    books = pq_train(
        corpus, m=m, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)

    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, adc_dist double, rank int"
        )
    qlits = []
    for row in qrows:
        tables = _adc_tables(row[vec_col], books)
        qlits.append(
            F.struct(
                F.lit(row[id_col]).alias("query_id"),
                F.array(
                    *[F.array(*[F.lit(s) for s in slots]) for slots in tables]
                ).alias("tbl"),
            )
        )

    scored = codes.select(
        F.col("id").alias("neighbor_id"),
        F.col("codes"),
        F.explode(F.array(*qlits)).alias("q"),
    ).where(F.col("q.query_id") != F.col("neighbor_id"))
    # left-to-right fold over subspaces: ((0 + t0) + t1) ≡ t0 + t1
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(len(books) - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.col("q.tbl")[j][F.col("codes")[j].cast("int")],
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            F.col("q.query_id").alias("query_id"),
            "neighbor_id",
            dist.alias("adc_dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
    )


def _adc_tables(qvec, books) -> list[list[float]]:
    """Per-subspace ADC lookup tables for one query vector: a dense
    k-slot list per subspace indexed by cluster LABEL (labels may have
    gaps after an empty-cluster drop; unused slots stay 0 and are never
    looked up because no code carries a dropped label). Entries are
    squared-L2 sums folded LEFT-TO-RIGHT then rounded to 6 dp — the
    determinism contract the DuckDB oracle mirrors."""
    qv = [float(x) for x in qvec]
    tables = []
    for labels, C, off in books:
        ds = C.shape[1]
        slots = [0.0] * (max(labels) + 1)
        for li, lab in enumerate(labels):
            t = 0.0
            for i in range(ds):
                d = qv[off + i] - float(C[li][i])
                t += d * d
            slots[lab] = float(round(t, 6))
        tables.append(slots)
    return tables


def _seed_train_encode(
    corpus: DataFrame,
    *,
    num_centroids: int,
    m: int,
    k: int,
    n_iter: int,
    id_col: str,
    vec_col: str,
):
    """Shared build half of IVF-PQ (in-memory query path AND persisted
    index): seed centroids = the ``num_centroids`` lowest-id corpus
    vectors with DENSE 0..K−1 ids by ascending source id (the
    ``similarity.build_ivf_index`` convention; order-isomorphic to the
    source ids, so routing tie-breaks are unchanged), PQ codebooks, and
    ONE corpus pass computing centroid assignment + codes together (two
    closure-captured BLAS matmuls in the same Arrow batch).

    Returns (cent_ids, cent_mat, books, codes) where codes is
    (id, centroid_id, codes)."""
    import numpy as np

    from prom_etl_db_spark.functions import similarity as sim

    cent_rows = (
        corpus.orderBy(F.asc(id_col))
        .limit(num_centroids)
        .select(F.col(vec_col))
        .collect()
    )
    cent_ids = list(range(len(cent_rows)))
    cent_mat = np.array([r[0] for r in cent_rows], dtype=np.float64)

    books = pq_train(
        corpus, m=m, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    assign1 = sim._nearest_centroids_udf(cent_ids, cent_mat, 1)
    codes = pq_encode(
        balance(corpus, id_col).withColumn(
            "centroid_id", assign1(F.col(vec_col))[0]
        ),
        books,
        id_col=id_col,
        vec_col=vec_col,
        passthrough=("centroid_id",),
    )
    return cent_ids, cent_mat, books, codes


def _probe_frame(session, qrows, cent_ids, cent_mat, books, nprobe, id_col, vec_col):
    """Route collected query rows driver-side (cosine, stable ties to the
    lower centroid id — the ``cosine_topk_ivf`` convention) and build the
    small (query_id, probed centroid_id, m×k ADC table) frame the codes
    scan broadcasts. Returns (frame, sorted probed centroid ids)."""
    import numpy as np

    ids = np.asarray(cent_ids, dtype=np.int64)
    Cn = cent_mat / np.maximum(
        np.linalg.norm(cent_mat, axis=1, keepdims=True), 1e-30
    )
    probe_rows = []
    for row in qrows:
        qv = np.asarray([float(x) for x in row[vec_col]], dtype=np.float64)
        qn = qv / max(float(np.linalg.norm(qv)), 1e-30)
        order = np.argsort(-(Cn @ qn), kind="stable")[:nprobe]
        tables = _adc_tables(row[vec_col], books)
        for cid in ids[order]:
            probe_rows.append((int(row[id_col]), int(cid), tables))
    df = session.createDataFrame(
        probe_rows, "query_id long, centroid_id long, tbl array<array<double>>"
    )
    return df, sorted({r[1] for r in probe_rows})


def _adc_rank(codes: DataFrame, probes: DataFrame, n_books: int, topk: int) -> DataFrame:
    """Score probed (id, codes, centroid_id) rows against the broadcast
    probe frame's lookup tables (left-to-right fold over subspaces:
    ((0 + t0) + t1) ≡ t0 + t1) and keep the per-query top-k, ties to the
    lowest neighbor id. Same self-match exclusion as ``pq_adc_topk``."""
    from pyspark.sql.window import Window

    scored = codes.join(F.broadcast(probes), "centroid_id").where(
        F.col("query_id") != F.col("id")
    )
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_books - 1)),
        F.lit(0.0),
        lambda acc, j: acc + F.col("tbl")[j][F.col("codes")[j].cast("int")],
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            "query_id", F.col("id").alias("neighbor_id"), dist.alias("adc_dist")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
    )


def pq_adc_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    num_centroids: int = 16,
    nprobe: int = 4,
    m: int = 2,
    k: int = 4,
    n_iter: int = 2,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the composed billion-vector ANN serving path — inverted-
    file ROUTING bounds the candidate set, PQ CODES bound the bytes
    scanned, ADC scores without touching a full-precision vector
    (``_seed_train_encode`` + ``_probe_frame`` + ``_adc_rank``; the
    persisted form is ``build_ivfpq_index``). Candidate volume is
    nprobe/num_centroids of the corpus instead of all of it — multiply
    with PQ's m bytes/vector for the full memory story. Queries must be
    broadcast-class; the empty-query case returns before any training
    work. Same self-match exclusion as ``pq_adc_topk``."""
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, adc_dist double, rank int"
        )
    cent_ids, cent_mat, books, codes = _seed_train_encode(
        corpus, num_centroids=num_centroids, m=m, k=k, n_iter=n_iter,
        id_col=id_col, vec_col=vec_col,
    )
    probes, _ = _probe_frame(
        corpus.sparkSession, qrows, cent_ids, cent_mat, books, nprobe,
        id_col, vec_col,
    )
    return _adc_rank(codes, probes, len(books), topk)


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    *,
    num_centroids: int = 16,
    m: int = 2,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Build and PERSIST an IVF-PQ index — the serveable form of
    ``pq_adc_topk_ivf`` (same ``_seed_train_encode`` build half). Layout
    (three parquet tables under ``path``):

    - ``centroids/``: (centroid_id, vector) — the probe map
      (``similarity.build_ivf_index`` convention: lowest-id seeds, dense
      0..K−1 ids by ascending source id).
    - ``codebooks/``: (subspace, cluster, offset, centroid) — m·k rows,
      the PQ codebooks queries rebuild their ADC tables from.
    - ``lists/``: (id, codes) PARTITIONED BY centroid_id — the inverted
      file IS the directory structure AND the rows are m small ints, no
      full vectors: a probe reads ~nprobe/K of the corpus at m bytes per
      vector (the two multiplicative ANN levers, persisted). Doubles
      roundtrip parquet bit-exactly, so a reopened index scores
      identically to the in-memory path.

    Returns the centroid count actually written (≤ ``num_centroids``
    when the corpus is smaller).
    """
    from pathlib import Path

    cent_ids, cent_mat, books, codes = _seed_train_encode(
        corpus, num_centroids=num_centroids, m=m, k=k, n_iter=n_iter,
        id_col=id_col, vec_col=vec_col,
    )
    root = Path(path)
    cent_rows = [
        (int(cid), [float(x) for x in cent_mat[i]])
        for i, cid in enumerate(cent_ids)
    ]
    session = corpus.sparkSession
    session.createDataFrame(
        cent_rows, "centroid_id long, vector array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "centroids"))
    book_rows = [
        (j, int(lab), int(off), [float(x) for x in C[li]])
        for j, (labels, C, off) in enumerate(books)
        for li, lab in enumerate(labels)
    ]
    session.createDataFrame(
        book_rows,
        "subspace int, cluster long, offset int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "codebooks"))
    codes.write.partitionBy("centroid_id").mode("overwrite").parquet(
        str(root / "lists")
    )
    return len(cent_rows)


def pq_adc_topk_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    topk: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a PERSISTED IVF-PQ index (see ``build_ivfpq_index``): load
    centroids + codebooks (both broadcast-class), route each query
    driver-side and rebuild its m×k ADC table from the stored codebooks
    (identical doubles → identical scores as the in-memory path —
    ``_probe_frame``/``_adc_rank`` are literally the same code), and
    scan ONLY the probed list partitions — the ``centroid_id IN``
    predicate prunes at the directory level and each scanned row is m
    ints, so I/O ≈ (nprobe/K)·(m/d·bytes) of a full-precision scan."""
    from pathlib import Path

    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, adc_dist double, rank int"
        )
    root = Path(path)
    cent_rows = sorted(
        spark.read.parquet(str(root / "centroids")).collect(),
        key=lambda r: r["centroid_id"],
    )
    cent_ids = [r["centroid_id"] for r in cent_rows]
    cent_mat = np.array([r["vector"] for r in cent_rows], dtype=np.float64)
    book_rows = spark.read.parquet(str(root / "codebooks")).collect()
    by_sub: dict[int, list] = {}
    for r in book_rows:
        by_sub.setdefault(r["subspace"], []).append(r)
    books = []
    for j in sorted(by_sub):
        rows = sorted(by_sub[j], key=lambda r: r["cluster"])
        labels = [r["cluster"] for r in rows]
        C = np.array([r["centroid"] for r in rows], dtype=np.float64)
        books.append((labels, C, rows[0]["offset"]))

    probes, probed = _probe_frame(
        spark, qrows, cent_ids, cent_mat, books, nprobe, id_col, vec_col
    )
    lists = (
        spark.read.parquet(str(root / "lists"))
        .where(F.col("centroid_id").isin(probed))  # partition-pruned
        .select("id", "codes", "centroid_id")
    )
    return _adc_rank(lists, probes, len(books), topk)
