"""Round-11: ``resets()`` / ``changes()`` over native histograms
(VERDICT r10 stretch #8 — Prometheus 3 evaluates both; the engine
walks consecutive pairs with the increase machinery's downscale/align
compare)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row


def _ts(i):
    return datetime(2024, 1, 29, 0, 0) + timedelta(minutes=i)


SCHEMA = (
    "labels map<string,string>, ts timestamp, schema int, "
    "zero_count long, pos_offset int, pos_counts array<long>"
)


def _run(spark, rows, schema=SCHEMA):
    from prom_etl_db_spark.operators.native_hist import (
        native_hist_changes_and_resets,
    )

    return {
        tuple(sorted(r["labels"].items())):
        (r["n_changes"], r["n_resets"])
        for r in native_hist_changes_and_resets(
            spark.createDataFrame(rows, schema)).collect()
    }


def test_growth_drop_and_identical_pairs(spark):
    """4 samples → 3 pairs: identical (no change), drop (change +
    reset), growth (change)."""
    rows = [
        Row(labels={"n": "s"}, ts=_ts(0), schema=0, zero_count=1,
            pos_offset=0, pos_counts=[2, 3]),
        Row(labels={"n": "s"}, ts=_ts(1), schema=0, zero_count=1,
            pos_offset=0, pos_counts=[2, 3]),       # identical
        Row(labels={"n": "s"}, ts=_ts(2), schema=0, zero_count=1,
            pos_offset=0, pos_counts=[1, 3]),       # drop → reset
        Row(labels={"n": "s"}, ts=_ts(3), schema=0, zero_count=1,
            pos_offset=0, pos_counts=[4, 5]),       # growth
    ]
    out = _run(spark, rows)
    assert out[(("n", "s"),)] == (2.0, 1.0)


def test_zero_padding_is_not_a_change(spark):
    """The same distribution encoded with explicit zero buckets must
    compare EQUAL (nonzero-entry signature, not raw arrays)."""
    rows = [
        Row(labels={"n": "s"}, ts=_ts(0), schema=0, zero_count=0,
            pos_offset=1, pos_counts=[5]),
        Row(labels={"n": "s"}, ts=_ts(1), schema=0, zero_count=0,
            pos_offset=0, pos_counts=[0, 5, 0]),    # padded, same
    ]
    out = _run(spark, rows)
    assert out[(("n", "s"),)] == (0.0, 0.0)


def test_single_sample_counts_zero(spark):
    rows = [Row(labels={"n": "s"}, ts=_ts(0), schema=0, zero_count=0,
                pos_offset=0, pos_counts=[1])]
    out = _run(spark, rows)
    assert out[(("n", "s"),)] == (0.0, 0.0)


def test_schema_change_downscales_before_reset_compare(spark):
    """schema 1 → 0 pair: fine buckets [2, 2] at offset 1 fold into
    coarse bucket 1 (4 total); a coarse sample [4] at offset 1 is NO
    drop (and IS a change — schema differs); a coarse [3] IS a
    reset."""
    base = [
        Row(labels={"n": "a"}, ts=_ts(0), schema=1, zero_count=0,
            pos_offset=1, pos_counts=[2, 2]),
        Row(labels={"n": "a"}, ts=_ts(1), schema=0, zero_count=0,
            pos_offset=1, pos_counts=[4]),
        Row(labels={"n": "b"}, ts=_ts(0), schema=1, zero_count=0,
            pos_offset=1, pos_counts=[2, 2]),
        Row(labels={"n": "b"}, ts=_ts(1), schema=0, zero_count=0,
            pos_offset=1, pos_counts=[3]),
    ]
    out = _run(spark, base)
    assert out[(("n", "a"),)] == (1.0, 0.0)
    assert out[(("n", "b"),)] == (1.0, 1.0)


def test_neg_side_and_count_sum_participate(spark):
    schema = SCHEMA + (", neg_offset int, neg_counts array<long>, "
                       "count long, sum double")
    rows = [
        Row(labels={"n": "s"}, ts=_ts(0), schema=0, zero_count=0,
            pos_offset=0, pos_counts=[2], neg_offset=0,
            neg_counts=[3], count=5, sum=10.0),
        # neg bucket drops → reset (pos grows)
        Row(labels={"n": "s"}, ts=_ts(1), schema=0, zero_count=0,
            pos_offset=0, pos_counts=[3], neg_offset=0,
            neg_counts=[1], count=4, sum=8.0),
        # only sum drops → reset
        Row(labels={"n": "s"}, ts=_ts(2), schema=0, zero_count=0,
            pos_offset=0, pos_counts=[3], neg_offset=0,
            neg_counts=[1], count=4, sum=7.0),
    ]
    out = _run(spark, rows, schema)
    assert out[(("n", "s"),)] == (2.0, 2.0)


def test_nhcb_custom_values_change_refuses(spark):
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    schema = SCHEMA + ", custom_values array<double>"
    rows = [
        Row(labels={"n": "s"}, ts=_ts(0), schema=-53, zero_count=0,
            pos_offset=0, pos_counts=[1, 2],
            custom_values=[0.5, 1.0]),
        Row(labels={"n": "s"}, ts=_ts(1), schema=-53, zero_count=0,
            pos_offset=0, pos_counts=[1, 3],
            custom_values=[0.5, 2.0]),
    ]
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception),
                       match="custom_values changed"):
        _run(spark, rows, schema)


def test_parsed_resets_changes_strings(spark):
    """String reachability: resets(h[10m]) / changes(h[10m]) through
    eval_promql over the native frame."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    nh_schema = (
        "metric_name string, labels map<string,string>, ts timestamp, "
        "schema int, zero_threshold double, zero_count long, "
        "count long, sum double, pos_offset int, "
        "pos_counts array<long>, neg_offset int, neg_counts array<long>"
    )
    rows = [
        Row(metric_name="h", labels={"job": "j"}, ts=_ts(0), schema=0,
            zero_threshold=0.001, zero_count=0, count=3, sum=3.0,
            pos_offset=0, pos_counts=[3], neg_offset=0, neg_counts=[]),
        Row(metric_name="h", labels={"job": "j"}, ts=_ts(1), schema=0,
            zero_threshold=0.001, zero_count=0, count=1, sum=1.0,
            pos_offset=0, pos_counts=[1], neg_offset=0, neg_counts=[]),
        Row(metric_name="h", labels={"job": "j"}, ts=_ts(2), schema=0,
            zero_threshold=0.001, zero_count=0, count=4, sum=4.0,
            pos_offset=0, pos_counts=[4], neg_offset=0, neg_counts=[]),
    ]
    nh = spark.createDataFrame(rows, nh_schema)
    samples = spark.createDataFrame(
        [], "metric_name string, labels map<string,string>, "
            "value double, timestamp timestamp")
    at = _ts(3)
    (r,) = eval_promql(samples, "resets(h[10m])", at,
                       native_hists=nh,
                       native_metrics=frozenset({"h"})).collect()
    assert r["value"] == 1.0
    (c,) = eval_promql(samples, "changes(h[10m])", at,
                       native_hists=nh,
                       native_metrics=frozenset({"h"})).collect()
    assert c["value"] == 2.0


def test_mixed_family_quantile_unions_both(spark):
    """r11 mixed classic+native family: one metric name with a native
    series AND a classic le-bucket series — histogram_quantile over
    rate() evaluates each family under its own estimator and unions."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    nh_schema = (
        "metric_name string, labels map<string,string>, ts timestamp, "
        "schema int, zero_threshold double, zero_count long, "
        "count long, sum double, pos_offset int, "
        "pos_counts array<long>, neg_offset int, neg_counts array<long>"
    )
    # native series: growth [0, 4] in buckets at idx 1..2 → q=0.5 rank
    # = 2 lands in bucket idx 2 (2^1, 2^2], frac 0.5 → 2^1.5
    nh = spark.createDataFrame([
        Row(metric_name="h", labels={"fam": "n"}, ts=_ts(0), schema=0,
            zero_threshold=0.001, zero_count=0, count=2, sum=2.0,
            pos_offset=1, pos_counts=[1, 1], neg_offset=0,
            neg_counts=[]),
        Row(metric_name="h", labels={"fam": "n"}, ts=_ts(5), schema=0,
            zero_threshold=0.001, zero_count=0, count=6, sum=10.0,
            pos_offset=1, pos_counts=[1, 5], neg_offset=0,
            neg_counts=[]),
    ], nh_schema)
    # classic series, SAME metric name: le 1/2/+Inf cumulative
    # counters; increases 2/4/4 → rank 0.5*4 = 2 ≤ r1=2 → 2/2*1 = 1.0
    srows = []
    for le, c0, c1 in (("1", 1, 3), ("2", 1, 5), ("+Inf", 1, 5)):
        srows += [
            Row(metric_name="h", labels={"fam": "c", "le": le},
                value=float(c0), timestamp=_ts(0)),
            Row(metric_name="h", labels={"fam": "c", "le": le},
                value=float(c1), timestamp=_ts(5)),
        ]
    samples = spark.createDataFrame(
        srows, "metric_name string, labels map<string,string>, "
               "value double, timestamp timestamp")
    out = eval_promql(samples, "histogram_quantile(0.5, rate(h[10m]))",
                      _ts(6), native_hists=nh,
                      native_metrics=frozenset({"h"}))
    got = {r["labels"]["fam"]: round(r["value"], 6) for r in out.collect()}
    assert set(got) == {"n", "c"}
    assert got["n"] == round(2 ** 1.5, 6)
    assert got["c"] == 1.0


class _FakeState:
    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _nh_pdf(rows):
    import pandas as pd

    return pd.DataFrame({
        "timestamp_ms": [r[0] for r in rows],
        "schema": [r[1] for r in rows],
        "zero_count": [r[2] for r in rows],
        "pos_offset": [r[3] for r in rows],
        "pos_counts": [r[4] for r in rows],
        "neg_offset": [0 for _ in rows],
        "neg_counts": [[] for _ in rows],
        "count": [r[2] + sum(r[4]) for r in rows],
        "sum": [float(r[2] + sum(r[4])) for r in rows],
    })


def test_streaming_rc_matches_batch_across_restart(spark):
    """The streaming fold's counters across two 'micro-batches' must
    equal the batch operator over the union — including a drop pair
    that STRADDLES the checkpoint boundary."""
    from prom_etl_db_spark.operators.native_hist import (
        native_hist_changes_and_resets,
    )
    from prom_etl_db_spark.streaming.stateful import (
        _fold_nh_resets_changes,
    )

    b1 = [(1000, 0, 1, 0, [2, 3]), (2000, 0, 1, 0, [2, 3]),
          (3000, 0, 1, 0, [4, 5])]
    b2 = [(4000, 0, 1, 0, [1, 1]),      # drop vs 3000 → reset
          (5000, 0, 1, 0, [6, 6])]
    state = _FakeState()
    list(_fold_nh_resets_changes(("s",), iter([_nh_pdf(b1)]), state))
    (out,) = _fold_nh_resets_changes(("s",), iter([_nh_pdf(b2)]), state)
    stream = (int(out["n_changes"][0]), int(out["n_resets"][0]))

    rows = [Row(labels={"s": "x"},
                ts=datetime(2024, 1, 29) + timedelta(milliseconds=r[0]),
                schema=r[1], zero_count=r[2], pos_offset=r[3],
                pos_counts=r[4], neg_offset=0, neg_counts=[],
                count=r[2] + sum(r[4]),
                sum=float(r[2] + sum(r[4])))
            for r in b1 + b2]
    schema = (SCHEMA + ", neg_offset int, neg_counts array<long>, "
                       "count long, sum double")
    (batch,) = native_hist_changes_and_resets(
        spark.createDataFrame(rows, schema)).collect()
    assert stream == (int(batch["n_changes"]), int(batch["n_resets"]))
    # the straddling pair was counted: identical pair 1 no change,
    # growth, drop (change+reset), growth → 3 changes 1 reset
    assert stream == (3, 1)


def test_streaming_rc_late_arrival_visible_not_fatal():
    from prom_etl_db_spark.streaming.stateful import (
        _fold_nh_resets_changes,
    )

    state = _FakeState()
    list(_fold_nh_resets_changes(
        ("s",), iter([_nh_pdf([(1000, 0, 0, 0, [1]),
                               (3000, 0, 0, 0, [2])])]), state))
    # a late arrival (ts 2000 < newest 3000) and an exact dup (3000):
    # both excluded-and-counted, no raise, counters unchanged
    (out,) = _fold_nh_resets_changes(
        ("s",), iter([_nh_pdf([(2000, 0, 0, 0, [9]),
                               (3000, 0, 0, 0, [2])])]), state)
    assert int(out["n_late"][0]) == 2
    assert int(out["n_changes"][0]) == 1 and int(out["n_resets"][0]) == 0
