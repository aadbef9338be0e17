"""Embedding similarity / near-dup tests (SURVEY.md §2.E E2/E3).

Planted-vector fixtures with hand-computable cosines; the LSH path is
checked for (a) subset-of-exact at the same threshold — verify step makes
false positives impossible — and (b) full recall on true near-duplicates
(cosine ≈ 1 collides in every band)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.similarity import (
    cosine_neardup_lsh,
    cosine_neardup_pairs,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
)

DIM = 8


def _vec(*nonzero: tuple[int, float]) -> list[float]:
    v = [0.0] * DIM
    for i, x in nonzero:
        v[i] = x
    return v


@pytest.fixture(scope="module")
def vectors(spark):
    # 0 and 1: identical direction (cos=1). 2: cos(0,2)=1/√2.
    # 3: orthogonal to all. 4: near-dup of 3 (cos≈0.995).
    rows = [
        (0, _vec((0, 1.0))),
        (1, _vec((0, 2.0))),
        (2, _vec((0, 1.0), (1, 1.0))),
        (3, _vec((2, 1.0))),
        (4, _vec((2, 1.0), (3, 0.1))),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exact_neardup_pairs(spark, vectors):
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_neardup_pairs(vectors, threshold=0.9).collect()
    }
    assert set(got) == {(0, 1), (3, 4)}
    assert got[(0, 1)] == pytest.approx(1.0)
    assert got[(3, 4)] == pytest.approx(1 / math.sqrt(1.01), abs=1e-6)


def test_exact_neardup_threshold_boundary(spark, vectors):
    # at 0.7, the 45° pairs (0,2) and (1,2) (cos=1/√2≈0.7071) join the set
    got = {(r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(vectors, 0.7).collect()}
    assert got == {(0, 1), (3, 4), (0, 2), (1, 2)}


def test_lsh_subset_and_recall(spark, vectors):
    exact = {(r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(vectors, 0.9).collect()}
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_lsh(
            vectors, threshold=0.9, dim=DIM, bands=16, bits=4
        ).collect()
    }
    # verify step ⇒ no false positives
    assert lsh <= exact
    # identical-direction pair collides in EVERY band — guaranteed found
    assert (0, 1) in lsh
    # cos≈0.995 pair: collision prob per 4-bit band ≈ (1-θ/π)^4 ≈ 0.89,
    # miss prob over 16 bands ≈ 3e-16 — deterministic planes, so stable
    assert (3, 4) in lsh


def test_lsh_verify_drops_band_collisions(spark):
    # two orthogonal vectors (cos=0) that may still share a band by chance
    # must be filtered out by the exact-cosine verify
    df = spark.createDataFrame(
        [(0, _vec((0, 1.0))), (1, _vec((1, 1.0)))],
        "vec_id long, embedding array<float>",
    )
    assert cosine_neardup_lsh(df, threshold=0.5, dim=DIM, bands=4, bits=1).count() == 0


def test_topk_matches_neardup_scores(spark, vectors):
    # brute-force top-1 neighbor of vec 0 is vec 1 at cos 1.0
    top = cosine_topk_bruteforce(vectors, vectors.where(F.col("vec_id") == 0), k=1)
    r = top.first()
    assert (r["query_id"], r["neighbor_id"]) == (0, 1)
    assert r["cos_sim"] == pytest.approx(1.0)


def test_lsh_recall_at_query_parameters(spark, sf_dir):
    # the registry query's configuration (threshold 0.4, AUTO-sized
    # bands/bits) must hold >= 0.9 aggregate recall against the exact
    # pair set — this is the gate the rows-only driver check can't provide
    from prom_etl_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(emb, 0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_lsh(emb, threshold=0.4).collect()
    }
    assert lsh <= exact  # exact verify ⇒ never a false positive
    assert exact, "fixture must contain near-dup pairs"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} below 0.9"


def test_lsh_auto_size_grows_bits_with_corpus():
    from prom_etl_db_spark.functions.similarity import lsh_auto_size

    # small corpora stay at the 8-bit floor; bits then track log2(n)-4
    # (r4: 2^bits ~ n/16), so 100x the corpus adds ~log2(100) ~ 7 bits
    # instead of 100x the random-pair candidate volume
    b_small = lsh_auto_size(500, 0.4)
    b_mid = lsh_auto_size(100_000, 0.4)
    b_big = lsh_auto_size(10_000_000, 0.4)
    assert b_small[1] == 8
    assert b_mid[1] == 13
    assert b_big[1] == 20
    assert b_small[0] < b_mid[0] < b_big[0]  # recall costs bands as bits grow

    # the sizing reproduces round 1's hand-derived numbers at threshold
    # 0.4 / 8 bits: p_band ~ 0.025 -> ~118 bands for 95% recall
    bands, bits = lsh_auto_size(500, 0.4, target_recall=0.95)
    assert (bands, bits) == (118, 8)

    # high thresholds collapse to few bands: p_bit ~ 0.856 at 0.9
    bands_hi, _ = lsh_auto_size(500, 0.9)
    assert bands_hi <= 15

    # candidate-volume sanity: expected random collisions n^2*bands/2^bits
    # grow near-linearly, not quadratically, across a 100x corpus jump
    def volume(n):
        bands_, bits_ = lsh_auto_size(n, 0.4)
        return (n * n / 2**bits_) * bands_

    assert volume(10_000_000) / volume(100_000) < 100 * 25


def test_ivf_recall_at_query_parameters(spark, sf_dir):
    # IVF at the registry's configuration (16 centroids, nprobe=4, k=5)
    # vs brute-force ground truth on the fixture — aggregate recall@5
    from prom_etl_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_ivf(
            emb, queries, k=5, num_centroids=16, nprobe=4
        ).collect()
    }
    assert truth, "fixture must produce neighbors"
    recall = len(approx & truth) / len(truth)
    # 4 of 16 probes scans ~25% of the corpus; near neighbors concentrate
    # in the probed buckets, so recall should be far above that floor
    assert recall >= 0.6, f"recall@5 {recall:.3f} below 0.6"


def test_ivf_auto_sizing_and_blas_path(spark):
    """num_centroids=None sizes to ~sqrt(n); results still rank real
    neighbors first (the BLAS assignment must agree with the cosine-join
    formulation it replaced)."""
    import numpy as np

    from prom_etl_db_spark.functions.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(144)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.where("vec_id < 5")
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_bruteforce(df, qs, k=3).collect()
    }
    approx = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_ivf(
            df, qs, k=3, num_centroids=None, nprobe=None
        ).collect()
    }
    # sqrt(144) = 12 centroids, nprobe ~ 3; rank-1 recall should be high
    hits = sum(
        1 for q in range(5) if approx.get((q, 1)) == exact.get((q, 1))
    )
    assert hits >= 3


def test_ivf_index_build_query_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """Persisted IVF index: build writes centroids + partitioned inverted
    lists; querying probes only nprobe buckets (directory-level partition
    pruning) and reaches >= 90% recall@5 vs brute force on the fixture."""
    from prom_etl_db_spark.functions.similarity import (
        build_ivf_index,
        cosine_topk_bruteforce,
        cosine_topk_ivf_index,
    )
    from prom_etl_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    ncent = build_ivf_index(emb, idx)
    assert ncent >= 4
    # layout: one directory per inverted list
    from pathlib import Path

    parts = list((Path(idx) / "lists").glob("centroid_id=*"))
    assert len(parts) >= ncent // 2  # seeds may share nearest centroids

    queries = emb.where(F.col("vec_id") % 100 == 0)
    got = cosine_topk_ivf_index(spark, idx, queries, k=5, nprobe=8)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert all(len(v) == 5 for v in by_q.values())

    exact = cosine_topk_bruteforce(emb, queries, k=5)
    exact_by_q = {}
    for r in exact.collect():
        exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(by_q[q] & exact_by_q[q]) for q in exact_by_q)
    total = sum(len(v) for v in exact_by_q.values())
    # isotropic fixture vectors: nprobe/ncent ~ 1/3 of the lists scanned;
    # neighbors concentrate in probed buckets, so recall must sit far
    # above that floor (same honest bar as the in-memory IVF test)
    assert hits / total >= 0.6, f"recall {hits}/{total}"

    # the probe scan must be partition-pruned to the nprobe buckets
    probed = got._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in probed


def test_ivf_index_kmeans_refined_build(spark, sf_dir, tmp_path):
    from prom_etl_db_spark.functions.similarity import (
        build_ivf_index,
        cosine_topk_ivf_index,
    )
    from prom_etl_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    idx = str(tmp_path / "ivf_km")
    build_ivf_index(emb, idx, num_centroids=8, kmeans_iters=2)
    q = emb.limit(3)
    out = cosine_topk_ivf_index(spark, idx, q, k=3, nprobe=3).collect()
    assert len(out) == 9 and all(r["rank"] <= 3 for r in out)


def test_signlsh_codes_deterministic_and_antipodal(spark):
    """md5-plane sign-LSH: identical vectors share a code, v and -v get
    complementary codes (every dot flips sign), and codes are stable
    across re-evaluation — the determinism the oracle match rests on."""
    from prom_etl_db_spark.functions.similarity import signlsh_codes

    base = [0.3 * (i % 5) - 0.6 for i in range(64)]
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, [-x for x in base])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["code"] for r in signlsh_codes(df, bits=16, dim=64).collect()}
    assert out[0] == out[1]
    assert out[0] ^ out[2] == (1 << 16) - 1  # all 16 bits flip
    again = {r["vec_id"]: r["code"] for r in signlsh_codes(df, bits=16, dim=64).collect()}
    assert again == out


def test_signlsh_collision_rate_tracks_angle(spark):
    """P(bit match) = 1 - theta/pi: orthogonal pairs should agree on
    ~half their bits, near-identical pairs on nearly all."""
    from prom_etl_db_spark.functions.similarity import signlsh_codes

    a = [1.0] + [0.0] * 63
    b = [0.0, 1.0] + [0.0] * 62  # orthogonal to a
    c = [1.0, 0.05] + [0.0] * 62  # ~3 degrees from a
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r["code"] for r in signlsh_codes(df, bits=16, dim=64).collect()}
    ortho_match = 16 - bin(out[0] ^ out[1]).count("1")
    near_match = 16 - bin(out[0] ^ out[2]).count("1")
    assert 3 <= ortho_match <= 13  # expect ~8, sigma = 2
    assert near_match >= 14  # expect ~15.7


# -- review-pass regressions -------------------------------------------------


def test_ivf_zero_norm_vector_scores_zero_not_nan(spark):
    # cosine() on a zero-norm side used to produce NaN, and NaN sorts
    # ABOVE every real number under desc — the zero vector became
    # everyone's rank-1 neighbor in the IVF path while the brute-force
    # path correctly ranked it last. Both must now agree.
    rows = [(i, _vec((0, 1.0), (1, float(i)))) for i in range(6)]
    rows.append((6, [0.0] * DIM))  # the all-zeros vector
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = vecs.where(F.col("vec_id") == 0)
    ivf = cosine_topk_ivf(vecs, queries, k=3, num_centroids=2, nprobe=2).collect()
    assert all(not math.isnan(r["cos_sim"]) for r in ivf)
    assert 6 not in {r["neighbor_id"] for r in ivf if r["rank"] == 1}
    bf = cosine_topk_bruteforce(vecs, queries, k=3).collect()
    assert {(r["neighbor_id"], r["rank"]) for r in ivf} == {
        (r["neighbor_id"], r["rank"]) for r in bf
    }


def test_topk_tie_break_is_ascending_id_across_partitions(spark):
    # equal scores at the local top-k boundary: argpartition alone keeps
    # an arbitrary tied row per partition; the documented rule is
    # (desc cos_sim, asc neighbor_id) regardless of partition layout
    rows = [(i, _vec((0, 1.0))) for i in range(40)]  # all identical
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(8)
    queries = vecs.where(F.col("vec_id") == 39)
    out = cosine_topk_bruteforce(vecs, queries, k=5).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [
        0, 1, 2, 3, 4,
    ]


def test_bruteforce_empty_queries_returns_typed_empty(spark, vectors):
    empty_q = vectors.where(F.col("vec_id") < 0)
    out = cosine_topk_bruteforce(vectors, empty_q, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]
    out2 = cosine_neardup_pairs(vectors.where(F.col("vec_id") < 0), 0.9)
    assert out2.count() == 0


def test_ivf_index_build_returns_actual_centroid_count(spark, tmp_path):
    from prom_etl_db_spark.functions.similarity import build_ivf_index

    rows = [(i, _vec((i % DIM, 1.0 + i))) for i in range(6)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # request more centroids than the corpus has rows: the seeds branch
    # can only produce 6 — the return must say 6, not 32
    n = build_ivf_index(vecs, str(tmp_path / "idx"), num_centroids=32)
    assert n == 6
    stored = spark.read.parquet(str(tmp_path / "idx" / "centroids")).count()
    assert stored == 6


def test_lsh_auto_size_keeps_candidate_volume_linear():
    """r4 re-pin: the auto-size rule must keep 2^bits within a constant
    factor of n (once past the floor), so random-collision candidate
    volume n²·bands/2^bits stays O(n·bands) — the previous n/256 rule
    left it quadratic until n > 2^16. And bands must still reach the
    target recall: 1-(1-p^bits)^bands ≥ 0.95 at the threshold."""
    import math

    from prom_etl_db_spark.functions.similarity import lsh_auto_size

    for n in (1_000, 10_000, 100_000, 1_000_000, 10_000_000):
        bands, bits = lsh_auto_size(n, 0.9)
        assert bits == 24 or (1 << bits) * 32 >= n, (n, bits)
        p = 1.0 - math.acos(0.9) / math.pi
        recall = 1.0 - (1.0 - p**bits) ** bands
        assert recall >= 0.95, (n, bands, bits, recall)


# -- RRF fusion (round 5) -----------------------------------------------------


def test_rrf_fuse_known_vector(spark):
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions.similarity import rrf_fuse

    # ranking A: docs 1,2,3 ; ranking B: docs 3,4
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "r"])
    b = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "r"])
    out = {r.doc_id: r for r in rrf_fuse([a, b], rank_cols=["ra", "rb"], top=10).collect()}
    # doc 3: 1/63 + 1/61 is the largest sum; doc 1: 1/61; doc 4: 1/62; doc 2: 1/62
    assert out[3].fused_rank == 1
    assert round(1 / 63 + 1 / 61, 6) == out[3].rrf_score
    assert out[1].rrf_score == round(1 / 61, 6)
    assert out[4].rrf_score == round(1 / 62, 6)
    # tie between doc 2 (rank 2 in A) and doc 4 (rank 2 in B): id breaks it
    assert out[2].fused_rank == 3 and out[4].fused_rank == 4
    assert out[1].fused_rank == 2
    # docs missing from a ranking carry NULL there
    assert out[4].ra is None and out[1].rb is None


def test_rrf_fuse_top_truncation(spark):
    from prom_etl_db_spark.functions.similarity import rrf_fuse

    a = spark.createDataFrame([(i, i) for i in range(1, 31)], ["doc_id", "r"])
    out = rrf_fuse([a], rank_cols=["ra"], top=5).collect()
    assert sorted(r.doc_id for r in out) == [1, 2, 3, 4, 5]
    assert sorted(r.fused_rank for r in out) == [1, 2, 3, 4, 5]
