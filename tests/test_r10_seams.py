"""Round-10 adversarial seam pass over the r9 native-histogram
aggregation family (VERDICT r9 task #4): sum_by over all-empty groups,
NHCB +Inf-presence divergence, avg_by's instant-scope contract,
rate dt=0 composed into quantile, and the n=1 group identity."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row

T0 = datetime(2024, 1, 29, 0, 0)
T1 = datetime(2024, 1, 29, 0, 5)

_BASE = (
    "g string, schema int, zero_threshold double, zero_count long, "
    "count long, sum double, pos_offset int, pos_counts array<long>, "
    "neg_offset int, neg_counts array<long>"
)


def _row(g, z, pos_off, pos, neg_off=0, neg=(), schema=0, s=1.0):
    pos, neg = list(pos), list(neg)
    return Row(g=g, schema=schema, zero_threshold=0.001, zero_count=z,
               count=z + sum(pos) + sum(neg), sum=s,
               pos_offset=pos_off, pos_counts=pos,
               neg_offset=neg_off, neg_counts=neg)


def test_sum_by_all_empty_group_offset_fallback(spark):
    """A group whose every member carries EMPTY bucket arrays merges to
    an empty histogram: offsets fall back to 0 (Prometheus renders an
    empty span — the offset is meaningless without buckets), counts
    stay scalar-true."""
    from prom_etl_db_spark.operators.native_hist import native_hist_sum_by

    df = spark.createDataFrame(
        [_row("a", 2, 3, []), _row("a", 1, -2, [])], _BASE)
    (r,) = native_hist_sum_by(df, ("g",)).collect()
    assert list(r["pos_counts"]) == [] and r["pos_offset"] == 0
    assert list(r["neg_counts"]) == [] and r["neg_offset"] == 0
    assert r["zero_count"] == 3 and r["count"] == 3
    # and the quantile of a zero-bucket-only merge interpolates within
    # [0, zero_threshold] (no buckets -> zero-bucket landing)
    from prom_etl_db_spark.operators.native_hist import native_hist_quantile

    (q,) = native_hist_quantile(
        native_hist_sum_by(df, ("g",)), 0.5).collect()
    assert 0.0 <= q["quantile_value"] <= 0.001


def test_sum_by_nhcb_inf_bucket_presence_differs(spark):
    """custom_values agree, but only one member carries the +Inf bucket
    (index len(cv)): index-wise addition counts the absent bucket as 0
    — the merged array spans to the longest member, the r9 increase
    seam rule applied to the group merge."""
    from prom_etl_db_spark.operators.native_hist import native_hist_sum_by

    schema = _BASE + ", custom_values array<double>"
    cv = [0.5, 2.0]
    rows = [
        Row(g="a", schema=-53, zero_threshold=0.001, zero_count=0,
            count=3, sum=1.0, pos_offset=0, pos_counts=[2, 1],
            neg_offset=0, neg_counts=[], custom_values=cv),
        Row(g="a", schema=-53, zero_threshold=0.001, zero_count=0,
            count=12, sum=2.0, pos_offset=0, pos_counts=[5, 4, 3],
            neg_offset=0, neg_counts=[], custom_values=cv),
    ]
    (r,) = native_hist_sum_by(
        spark.createDataFrame(rows, schema), ("g",)).collect()
    assert list(r["pos_counts"]) == [7, 5, 3]
    assert list(r["custom_values"]) == cv


def test_avg_by_counts_rows_not_series(spark):
    """avg_by's documented INSTANT-SCOPE contract: n_series is the ROW
    count. Two samples of ONE series read as two members — the caller
    must reduce time first (the parser's string path does)."""
    from prom_etl_db_spark.operators.native_hist import native_hist_avg_by

    df = spark.createDataFrame(
        [_row("a", 2, 0, [4]), _row("a", 4, 0, [8])], _BASE)
    (r,) = native_hist_avg_by(df, ("g",)).collect()
    assert r["n_series"] == 2
    assert r["zero_count"] == pytest.approx(3.0)
    assert r["pos_counts"][0] == pytest.approx(6.0)


def test_rate_dt0_yields_null_components_and_null_quantile(spark):
    """The OPERATOR convention: a zero-length window (both endpoints at
    one timestamp) yields NULL rates, and a quantile over it is NULL —
    never a fabricated 0. (The parser path additionally DROPS such
    series, Prometheus's two-points rule.)"""
    from prom_etl_db_spark.operators.native_hist import (
        native_hist_quantile,
        native_hist_rate,
    )
    from pyspark.sql import functions as F

    schema = (
        "labels map<string,string>, ts timestamp, schema int, "
        "zero_threshold double, zero_count long, count long, sum double, "
        "pos_offset int, pos_counts array<long>, "
        "neg_offset int, neg_counts array<long>"
    )
    rows = [
        Row(labels={"n": "s"}, ts=T0, schema=0, zero_threshold=0.001,
            zero_count=1, count=4, sum=2.0, pos_offset=0,
            pos_counts=[3], neg_offset=0, neg_counts=[]),
    ]
    rates = native_hist_rate(spark.createDataFrame(rows, schema))
    (r,) = rates.collect()
    assert r["dt_seconds"] == 0
    assert r["zero_rate"] is None and r["pos_rates"][0] is None
    assert r["count_rate"] is None and r["sum_rate"] is None
    shaped = rates.select(
        "labels", "schema", "zero_threshold",
        F.col("zero_rate").alias("zero_count"),
        F.col("count_rate").alias("count"),
        F.col("sum_rate").alias("sum"),
        "pos_offset", F.col("pos_rates").alias("pos_counts"),
        "neg_offset", F.col("neg_rates").alias("neg_counts"),
    )
    (q,) = native_hist_quantile(shaped, 0.9).collect()
    assert q["quantile_value"] is None


def test_parser_drops_single_sample_series(spark):
    """String path: rate(h[..]) over a series with ONE sample in the
    window emits NOTHING for it (Prometheus's two-points rule), while
    two-sample series still answer."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    schema = (
        "metric_name string, labels map<string,string>, ts timestamp, "
        "schema int, zero_threshold double, zero_count long, count long, "
        "sum double, pos_offset int, pos_counts array<long>, "
        "neg_offset int, neg_counts array<long>"
    )
    rows = [
        Row(metric_name="h", labels={"i": "two"}, ts=T0, schema=0,
            zero_threshold=0.001, zero_count=0, count=2, sum=1.0,
            pos_offset=0, pos_counts=[2], neg_offset=0, neg_counts=[]),
        Row(metric_name="h", labels={"i": "two"}, ts=T1, schema=0,
            zero_threshold=0.001, zero_count=0, count=5, sum=2.0,
            pos_offset=0, pos_counts=[5], neg_offset=0, neg_counts=[]),
        Row(metric_name="h", labels={"i": "one"}, ts=T1, schema=0,
            zero_threshold=0.001, zero_count=0, count=9, sum=3.0,
            pos_offset=0, pos_counts=[9], neg_offset=0, neg_counts=[]),
    ]
    nh = spark.createDataFrame(rows, schema)
    samples = spark.createDataFrame(
        [], "metric_name string, labels map<string,string>, "
            "value double, timestamp timestamp")
    out = eval_promql(
        samples, "histogram_count(rate(h[10m]))",
        datetime(2024, 1, 29, 0, 6),
        native_hists=nh, native_metrics=frozenset({"h"}))
    got = {r["labels"]["i"]: r["value"] for r in out.collect()}
    assert got == {"two": pytest.approx(3 / 300)}


def test_sum_by_single_series_identity(spark):
    """n=1 group: the merge is the input verbatim (offsets, counts,
    scalars) — no widening, no fabricated buckets."""
    from prom_etl_db_spark.operators.native_hist import native_hist_sum_by

    df = spark.createDataFrame(
        [_row("a", 2, -1, [3, 0, 4], neg_off=2, neg=[1, 5], s=7.5)], _BASE)
    (r,) = native_hist_sum_by(df, ("g",)).collect()
    assert r["pos_offset"] == -1 and list(r["pos_counts"]) == [3, 0, 4]
    assert r["neg_offset"] == 2 and list(r["neg_counts"]) == [1, 5]
    assert (r["zero_count"], r["count"], r["sum"]) == (2, 15, 7.5)
    assert r["n_series"] == 1
