"""K-means + SemDeDup (functions/clustering.py)."""

import numpy as np
import pytest

from prom_etl_db_spark.functions.clustering import (
    assign_clusters,
    kmeans,
    semantic_neardup_pairs,
)
from prom_etl_db_spark.functions.similarity import cosine_neardup_pairs


def _blobs(spark, *, n_per=20, dim=8, seed=7):
    """Three well-separated blobs on distinct axes; ids encode the blob."""
    rng = np.random.default_rng(seed)
    rows = []
    for b, axis in enumerate((0, 3, 6)):
        center = np.zeros(dim)
        center[axis] = 10.0
        for i in range(n_per):
            v = center + rng.normal(0, 0.1, dim)
            rows.append((b * 100 + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_blobs(spark):
    out = kmeans(_blobs(spark), 3, n_iter=3, init="spread").collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["vec_id"] // 100, set()).add(r["cluster"])
    # each blob lands in exactly one cluster, and the three are distinct
    assert all(len(s) == 1 for s in by_blob.values())
    assert len(set().union(*by_blob.values())) == 3


def test_kmeans_deterministic_under_repartition(spark):
    df = _blobs(spark)
    a = {(r["vec_id"], r["cluster"]) for r in kmeans(df, 3, n_iter=2).collect()}
    b = {
        (r["vec_id"], r["cluster"])
        for r in kmeans(df.repartition(13), 3, n_iter=2).collect()
    }
    assert a == b


def test_assign_clusters_keeps_surviving_labels(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0])], "vec_id long, embedding array<double>"
    )
    C = np.array([[0.0, 0.0], [10.0, 10.0]])
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, C, cluster_ids=[4, 9]).collect()
    }
    assert got == {1: 4, 2: 9}


def test_semantic_neardup_full_recall_on_blobs(spark):
    """Blob members are mutual near-dups (cos ~ 1) and k-means keeps each
    blob whole, so the SemDeDup pairs must EQUAL the exact all-pairs
    baseline at the same threshold."""
    df = _blobs(spark, n_per=8)
    sem = {
        (r["id_a"], r["id_b"])
        for r in semantic_neardup_pairs(df, 0.99, k=3, n_iter=3, init="spread").collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(df, threshold=0.99).collect()
    }
    assert sem == exact
    assert len(sem) == 3 * (8 * 7) // 2


def test_kmeans_k_larger_than_corpus_is_rejected_or_shrinks(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = kmeans(df, 8, n_iter=2).collect()
    assert {r["vec_id"] for r in out} == {1, 2}
    assert all(0 <= r["cluster"] < 2 for r in out)


# --- product quantization -------------------------------------------------


def test_pq_codes_match_per_subspace_kmeans(spark):
    """Each PQ code column IS the per-subspace k-means assignment with the
    per-subspace salt — the one-pass encoder must agree with the reference
    composition (slice → kmeans) subspace by subspace."""
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions.clustering import pq_codes

    df = _blobs(spark)  # dim=8 → two 4-dim subspaces
    got = {
        r["id"]: tuple(r["codes"])
        for r in pq_codes(df, m=2, k=3, n_iter=2).collect()
    }
    for j in range(2):
        sub = df.select(
            "vec_id", F.slice("embedding", j * 4 + 1, 4).alias("sub")
        )
        want = {
            r["vec_id"]: r["cluster"]
            for r in kmeans(
                sub, 3, n_iter=2, vec_col="sub", salt=f"kmeans-init-pq{j}"
            ).collect()
        }
        assert {i: c[j] for i, c in got.items()} == want


def test_pq_encode_deterministic_under_repartition(spark):
    from prom_etl_db_spark.functions.clustering import pq_codes

    df = _blobs(spark)
    a = {(r["id"], tuple(r["codes"])) for r in pq_codes(df, m=2, k=3).collect()}
    b = {
        (r["id"], tuple(r["codes"]))
        for r in pq_codes(df.repartition(7), m=2, k=3).collect()
    }
    assert a == b


def test_pq_adc_topk_finds_blob_neighbors(spark):
    """On well-separated blobs the quantization error is tiny relative to
    the inter-blob distance, so every ADC neighbor of a blob member must
    come from the same blob."""
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions.clustering import pq_adc_topk

    df = _blobs(spark)
    queries = df.where(F.col("vec_id").isin(0, 100, 200))
    out = pq_adc_topk(df, queries, m=2, k=3, n_iter=2, topk=5).collect()
    assert len(out) == 15
    for r in out:
        assert r["neighbor_id"] // 100 == r["query_id"] // 100
        assert r["adc_dist"] >= 0.0


def test_pq_empty_inputs(spark):
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions.clustering import pq_adc_topk, pq_train

    df = _blobs(spark)
    with pytest.raises(ValueError, match="empty corpus"):
        pq_train(df.where(F.lit(False)), m=2, k=3)
    out = pq_adc_topk(df, df.where(F.lit(False)), m=2, k=3, topk=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "adc_dist", "rank"]


def test_pq_adc_topk_ivf_blob_neighbors_and_bounded_candidates(spark):
    """IVF-PQ on separated blobs: routing must send each query to its own
    blob's lists, so every returned neighbor shares the query's blob; the
    result is also a subset of what the unrouted ADC scan returns (the
    routing can only REMOVE candidates, never invent them)."""
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions.clustering import pq_adc_topk, pq_adc_topk_ivf

    df = _blobs(spark)
    queries = df.where(F.col("vec_id").isin(5, 105, 205))
    out = pq_adc_topk_ivf(
        df, queries, num_centroids=6, nprobe=2, m=2, k=3, n_iter=2, topk=5
    ).collect()
    assert len(out) == 15
    for r in out:
        assert r["neighbor_id"] // 100 == r["query_id"] // 100
    full = {
        (r["query_id"], r["neighbor_id"], r["adc_dist"])
        for r in pq_adc_topk(df, queries, m=2, k=3, n_iter=2, topk=60).collect()
    }
    assert {(r["query_id"], r["neighbor_id"], r["adc_dist"]) for r in out} <= full


def test_ivfpq_index_roundtrip_equals_in_memory(spark, tmp_path):
    """A persisted IVF-PQ index reopened from disk must score IDENTICALLY
    to the in-memory composed path (doubles roundtrip parquet
    bit-exactly), the codes-only list layout must hold m ints per row
    (no vectors), and the probed scan must touch only probed partition
    directories."""
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions.clustering import (
        build_ivfpq_index,
        pq_adc_topk_ivf,
        pq_adc_topk_ivfpq_index,
    )

    df = _blobs(spark)
    queries = df.where(F.col("vec_id").isin(5, 105, 205))
    path = str(tmp_path / "ivfpq")
    n_cent = build_ivfpq_index(df, path, num_centroids=6, m=2, k=3, n_iter=2)
    assert n_cent == 6

    lists = spark.read.parquet(path + "/lists")
    assert set(lists.columns) == {"id", "codes", "centroid_id"}
    assert lists.count() == df.count()

    got = pq_adc_topk_ivfpq_index(
        spark, path, queries, topk=5, nprobe=2
    )
    mem = pq_adc_topk_ivf(
        df, queries, num_centroids=6, nprobe=2, m=2, k=3, n_iter=2, topk=5
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, mem.collect()))

    # directory-level pruning: the probed scan's FileScan carries a
    # centroid_id partition filter (not a post-scan row filter)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
