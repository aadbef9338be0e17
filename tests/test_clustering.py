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
