"""Deterministic HLL (functions/sketches.py): accuracy, mergeability,
and the exactness claims the oracle match relies on."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions import sketches


@pytest.fixture(scope="module")
def keyed(spark):
    # two groups with known exact cardinalities: 400 and 37 distinct keys
    rows = [("a", i % 400) for i in range(2000)] + [("b", i % 37) for i in range(500)]
    return spark.createDataFrame(rows, "g string, k long")


def test_hll_estimate_within_error_bound(keyed):
    out = {r["g"]: r for r in sketches.hll_cardinality(keyed, "g", "k").collect()}
    se = sketches.hll_error_bound(12)
    assert abs(out["a"]["hll_estimate"] - 400) <= 5 * se * 400 + 5
    assert abs(out["b"]["hll_estimate"] - 37) <= 5 * se * 37 + 5


def test_hll_registers_merge_by_max(keyed, spark):
    """Shard-union = per-register max: computing registers over two
    disjoint halves and max-merging equals the single-pass registers —
    the property that lets the sketch distribute over 1000 executors."""
    whole = {
        (r["g"], r["idx"]): r["r"]
        for r in sketches.hll_registers(keyed, "g", "k").collect()
    }
    h1 = sketches.hll_registers(keyed.where(F.col("k") % 2 == 0), "g", "k")
    h2 = sketches.hll_registers(keyed.where(F.col("k") % 2 == 1), "g", "k")
    merged = {
        (r["g"], r["idx"]): r["r"]
        for r in h1.unionAll(h2).groupBy("g", "idx").agg(F.max("r").alias("r")).collect()
    }
    assert merged == whole


def test_hll_deterministic_across_repartition(keyed):
    a = sorted(map(tuple, sketches.hll_cardinality(keyed, "g", "k").collect()))
    b = sorted(
        map(tuple, sketches.hll_cardinality(keyed.repartition(7), "g", "k").collect())
    )
    assert a == b


def test_harmonic_sum_terms_are_exact_dyadics():
    """The oracle-match argument: every 2^-rank term and every partial
    sum over ≤2^p registers is exactly representable, so accumulation
    order can't change the double."""
    p, bits = 12, 20
    m = 1 << p
    # worst case: all m registers at the max rank (bits+1)
    total = 0.0
    for _ in range(m):
        total += 2.0 ** -(bits + 1)
    assert total == m * 2.0 ** -(bits + 1)  # no rounding drift
    # and the alpha*m^2/S estimate is pure IEEE ops from there
    est = sketches._alpha(m) * m * m / (total + 0.0)
    assert math.isfinite(est)


def test_hll_empty_group_absent(spark):
    df = spark.createDataFrame([("a", 1)], "g string, k long")
    out = sketches.hll_cardinality(df, "g", "k").collect()
    assert len(out) == 1 and out[0]["g"] == "a"
    # one filled register -> m-1 zero registers, small-range correction path
    assert out[0]["zero_registers"] == (1 << 12) - 1
    assert out[0]["hll_estimate"] == pytest.approx(1.0, abs=0.51)


# -- quantile histogram ------------------------------------------------------


@pytest.fixture(scope="module")
def valued(spark):
    # group "a": uniform-ish 0..499 (i*7 % 500); group "b": constant 42
    rows = [("a", float((i * 7) % 500)) for i in range(3000)] + [
        ("b", 42.0) for _ in range(100)
    ]
    return spark.createDataFrame(rows, "g string, v double")


def test_quantile_histogram_within_bucket_width(valued):
    out = {
        r["g"]: r
        for r in sketches.quantile_histogram(
            valued, "g", "v", q=0.9, bins=128, lo=0.0, hi=500.0
        ).collect()
    }
    exact_a = sorted(((i * 7) % 500) for i in range(3000))[
        __import__("math").ceil(0.9 * 3000) - 1
    ]
    width = 500.0 / 128
    assert abs(out["a"]["q_estimate"] - exact_a) <= width
    assert abs(out["b"]["q_estimate"] - 42.0) <= width
    assert out["a"]["n_values"] == 3000 and out["b"]["n_values"] == 100


def test_quantile_histogram_clamps_out_of_domain(spark):
    df = spark.createDataFrame(
        [("a", -50.0), ("a", 10.0), ("a", 9999.0)], "g string, v double"
    )
    out = sketches.quantile_histogram(
        df, "g", "v", q=0.5, bins=10, lo=0.0, hi=100.0
    ).collect()
    # median of {clamped-low, 10, clamped-high} sits in the 10.0 bucket
    assert len(out) == 1 and 0.0 <= out[0]["q_estimate"] <= 100.0


def test_quantile_histogram_deterministic_across_repartition(valued):
    a = sorted(map(tuple, sketches.quantile_histogram(valued, "g", "v").collect()))
    b = sorted(
        map(
            tuple,
            sketches.quantile_histogram(valued.repartition(7), "g", "v").collect(),
        )
    )
    assert a == b


# -- count-min / bloom -------------------------------------------------------


def test_countmin_never_underestimates(spark):
    rows = [("k%d" % (i % 50),) for i in range(5000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "k string")
    probes = df.distinct()
    est = {
        r["k"]: r["cm_estimate"]
        for r in sketches.countmin_estimates(df, "k", probes).collect()
    }
    exact = {r["k"]: r["c"] for r in df.groupBy("k").count().withColumnRenamed("count", "c").collect()}
    n = 5500
    eps_n = math.e / 1024 * n  # classic CM bound, ~14.6 here
    for k, e in est.items():
        assert e >= exact[k], f"{k}: CM must never underestimate"
        assert e <= exact[k] + 3 * eps_n
    assert est["hot"] >= 500


def test_countmin_absent_key_estimates_near_zero(spark):
    df = spark.createDataFrame([("a",)] * 100, "k string")
    probes = spark.createDataFrame([("zzz-never-seen",)], "k string")
    out = sketches.countmin_estimates(df, "k", probes).collect()
    # absent key can only collide into a's 4 cells; at width 1024 the
    # chance all 4 collide is ~(4/1024)^4 — expect 0
    assert out[0]["cm_estimate"] in (0, 100)
    assert out[0]["cm_estimate"] == 0


def test_bloom_no_false_negatives_and_low_fp(spark):
    members = spark.createDataFrame([(i,) for i in range(0, 400)], "k long")
    probes = spark.createDataFrame([(i,) for i in range(0, 2000)], "k long")
    out = {
        r["k"]: r["in_bloom"]
        for r in sketches.bloom_membership(members, probes, "k").collect()
    }
    assert all(out[i] for i in range(400)), "no false negatives, ever"
    fp = sum(1 for i in range(400, 2000) if out[i])
    # (1 - e^(-kn/m))^k with k=5, n=400, m=16384 -> ~7e-5; 1600 probes
    assert fp <= 5


def test_bloom_duplicate_probe_keys_no_false_negative(spark):
    """A probe key appearing twice must still read as a member — the
    exact-equality hit count doubled with duplicated input and reported
    a FALSE NEGATIVE, violating the Bloom contract."""
    from prom_etl_db_spark.functions.sketches import bloom_membership

    members = spark.createDataFrame([(1,), (2,)], "k long")
    probes = spark.createDataFrame([(1,), (1,), (3,)], "k long")
    got = {r["k"]: r["in_bloom"] for r in bloom_membership(
        members, probes, "k").collect()}
    assert got[1] is True
    assert got[3] is False  # tiny filter, no collision at these sizes


def test_quantile_histogram_ignores_nulls(spark):
    # NULLs used to land in bucket 0 (greatest() skips NULLs), dragging
    # the estimate toward lo; percentile_approx — whose twin this is —
    # ignores them, and so must we
    rows = [("a", 900.0)] * 50 + [("a", None)] * 50
    df = spark.createDataFrame(rows, "g string, v double")
    out = sketches.quantile_histogram(
        df, "g", "v", q=0.5, bins=128, lo=0.0, hi=1000.0
    ).collect()
    assert len(out) == 1
    assert out[0]["n_values"] == 50
    assert abs(out[0]["q_estimate"] - 900.0) <= 1000.0 / 128


def test_countmin_null_key_never_underestimates(spark):
    # a NULL key used to hash to cell NULL, which no probe join matches:
    # estimate 0 for a key with 40 real rows — an underestimate from a
    # sketch whose guarantee is one-sided never-under
    rows = [(None,)] * 40 + [("x",)] * 7
    df = spark.createDataFrame(rows, "k string")
    probes = spark.createDataFrame([(None,), ("x",)], "k string")
    out = {
        r["k"]: r["cm_estimate"]
        for r in sketches.countmin_estimates(df, "k", probes).collect()
    }
    assert out[None] >= 40
    assert out["x"] >= 7
