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


# --- main-content extraction (r6) ------------------------------------------


def test_main_content_drops_link_farms_keeps_prose(spark):
    from prom_etl_db_spark.functions.text import html_main_content
    html = (
        '<html><body><nav><a href="/">Home</a> <a href="/x">About us</a> '
        '<a>More links</a></nav>'
        "<div>This is the long main article body text that clearly survives.</div>"
        "<p>tiny</p>"
        '<div>Second paragraph long enough, with <a href="y">one link</a> '
        "inside it staying under the density cap.</div>"
        "<footer><a>Terms</a> <a>Privacy</a> <a>Contact</a></footer></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    row = html_main_content(df).first()
    assert row["n_blocks_kept"] == 2
    assert row["main_text"].startswith("This is the long main article")
    assert "Home" not in row["main_text"]
    assert "Terms" not in row["main_text"]
    assert "tiny" not in row["main_text"]


def test_main_content_density_boundary_integer_percent(spark):
    from prom_etl_db_spark.functions.text import html_main_content
    # 40 visible chars, exactly 20 of them anchor text = 50%: kept (<=);
    # 22 anchor chars = 55%: dropped
    body_half = "<p>" + "<a>" + "x" * 20 + "</a>" + "y" * 20 + "</p>"
    body_over = "<p>" + "<a>" + "x" * 22 + "</a>" + "y" * 18 + "</p>"
    df = spark.createDataFrame(
        [(1, body_half), (2, body_over)], "doc_id int, html string"
    )
    rows = {r["doc_id"]: r["n_blocks_kept"] for r in html_main_content(df).collect()}
    assert rows == {1: 1, 2: 0}


def test_main_content_all_boilerplate_yields_empty(spark):
    from prom_etl_db_spark.functions.text import html_main_content
    df = spark.createDataFrame(
        [(1, "<nav><a>A</a> <a>B</a></nav>")], "doc_id int, html string"
    )
    row = html_main_content(df).first()
    assert row["main_text"] == "" and row["n_blocks_kept"] == 0


def test_main_content_plan_pure_column(spark):
    from prom_etl_db_spark.functions.text import html_main_content
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id int, html string")
    plan = html_main_content(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
