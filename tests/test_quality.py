"""Data-quality expectations and PSI drift (functions/quality.py):
planted violations are counted exactly; planted drift is detected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions import quality


def test_expectations_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, float("nan")), (4, -5.0), (5, 10.0), (5, 20.0)],
        "id long, v double",
    )
    out = {
        r["check"]: r
        for r in quality.expectations(
            df,
            [
                ("v_null", F.col("v").isNull()),
                ("v_nan", F.isnan(F.coalesce(F.col("v"), F.lit(0.0)))),
                ("v_negative", F.col("v") < 0),
            ],
            unique_keys=[("id_unique", ["id"])],
        ).collect()
    }
    assert out["v_null"]["n_violations"] == 1 and not out["v_null"]["pass"]
    assert out["v_nan"]["n_violations"] == 1
    assert out["v_negative"]["n_violations"] == 1
    assert out["id_unique"]["n_violations"] == 1  # id 5 twice
    assert all(r["n_total"] == 6 for r in out.values())


def test_expectations_all_pass_on_clean_data(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    out = quality.expectations(
        df, [("neg", F.col("v") < 0)], unique_keys=[("uniq", ["id"])]
    ).collect()
    assert all(r["pass"] and r["n_violations"] == 0 for r in out)


@pytest.fixture(scope="module")
def drifting(spark):
    # group "stable": identical distribution both sides; group "shifted":
    # values move from ~100 to ~400 between the slices
    rows = []
    for i in range(2000):
        side = i % 2  # 0 = reference, 1 = comparison
        rows.append(("stable", float((i * 13) % 500), side))
        rows.append(("shifted", 100.0 + (i % 50) if side == 0 else 400.0 + (i % 50), side))
    return spark.createDataFrame(rows, "g string, v double, side int")


def test_psi_detects_planted_shift(drifting):
    out = {
        r["g"]: r["psi"]
        for r in quality.psi_drift(
            drifting, "g", "v", F.col("side") == 0, bins=20, lo=0.0, hi=500.0
        ).collect()
    }
    assert out["stable"] < 0.1, "stationary distribution must read ~0"
    assert out["shifted"] > 0.25, "a 300-point shift must trip the drift gate"


def test_psi_symmetricish_and_deterministic(drifting):
    a = quality.psi_drift(drifting, "g", "v", F.col("side") == 0).collect()
    b = quality.psi_drift(drifting.repartition(7), "g", "v", F.col("side") == 0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # PSI is symmetric in (p, q) by construction of the formula
    swapped = {
        r["g"]: r["psi"]
        for r in quality.psi_drift(drifting, "g", "v", F.col("side") == 1).collect()
    }
    orig = {r["g"]: r["psi"] for r in a}
    for g in orig:
        assert abs(orig[g] - swapped[g]) < 1e-9


def test_unique_keys_null_keys_are_values_not_violations(spark):
    """{1, 2, NULL} is three distinct keys — count_distinct over bare
    columns skipped the NULL row and reported a phantom duplicate."""
    from prom_etl_db_spark.functions.quality import expectations

    df = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    out = {r["check"]: (r["n_violations"], r["pass"]) for r in expectations(
        df, [("k_nonneg", F.col("k") < 0)], unique_keys=[("k_unique", ["k"])]
    ).collect()}
    assert out["k_unique"] == (0, True)
    # and a REAL duplicate (including duplicate NULLs) still counts
    df2 = spark.createDataFrame([(1,), (1,), (None,), (None,)], "k long")
    out2 = {r["check"]: r["n_violations"] for r in expectations(
        df2, [], unique_keys=[("k_unique", ["k"])]
    ).collect()}
    assert out2["k_unique"] == 2


def test_psi_excludes_null_values(spark):
    # NULLs are missing data, not mass at lo: a comparison slice where
    # 30% of values went NULL (extraction regression) must not read as
    # "values collapsed to ~0" — with unchanged non-null values PSI ≈ 0
    rows = []
    for i in range(1000):
        rows.append(("g1", float(100 + (i % 50)), i % 2))
        if i % 3 == 0:
            rows.append(("g1", None, 1))  # NULLs only on the cmp side
    df = spark.createDataFrame(rows, "g string, v double, side int")
    out = quality.psi_drift(
        df, "g", "v", F.col("side") == 0, bins=20, lo=0.0, hi=500.0
    ).collect()
    assert len(out) == 1
    assert out[0]["psi"] < 0.1  # non-null distribution is unchanged


def test_expectations_empty_rule_set_raises_clearly(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="at least one rule"):
        quality.expectations(df, [])
