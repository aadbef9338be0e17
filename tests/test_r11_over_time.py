"""Round-11: the ``*_over_time`` family over NATIVE-histogram range
selectors + ``absent()`` over native vectors. Before r11 a native name
fell through to the SCALAR stream, which silently matched nothing —
``absent_over_time(h[5m])`` reported a LIVE metric as absent (the
misleading-alert failure mode), and every other over-time form
returned a silent empty."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row


def _ts(i):
    return datetime(2024, 1, 29, 0, 0) + timedelta(minutes=i)


NH_SCHEMA = (
    "metric_name string, labels map<string,string>, ts timestamp, "
    "schema int, zero_threshold double, zero_count long, "
    "count long, sum double, pos_offset int, "
    "pos_counts array<long>, neg_offset int, neg_counts array<long>"
)


def _nh(spark, rows):
    return spark.createDataFrame(rows, NH_SCHEMA)


def _samples(spark):
    return spark.createDataFrame(
        [], "metric_name string, labels map<string,string>, "
            "value double, timestamp timestamp")


def _row(job, minutes, counts, *, schema=0, zero=0):
    return Row(metric_name="h", labels={"job": job}, ts=_ts(minutes),
               schema=schema, zero_threshold=0.001, zero_count=zero,
               count=zero + sum(counts), sum=float(sum(counts)),
               pos_offset=0, pos_counts=list(counts), neg_offset=0,
               neg_counts=[])


def _eval(spark, nh, expr, at=None):
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    return eval_promql(_samples(spark), expr, at or _ts(6),
                       native_hists=nh, native_metrics=frozenset({"h"}))


def test_count_present_over_time(spark):
    nh = _nh(spark, [
        _row("a", 0, [1]), _row("a", 3, [2]), _row("a", 5, [3]),
        _row("b", 5, [1]),
    ])
    got = {r["labels"]["job"]: r["value"]
           for r in _eval(spark, nh, "count_over_time(h[10m])").collect()}
    assert got == {"a": 3.0, "b": 1.0}
    got = {r["labels"]["job"]: r["value"]
           for r in _eval(spark, nh, "present_over_time(h[10m])").collect()}
    assert got == {"a": 1.0, "b": 1.0}


def test_absent_over_time_live_metric_not_absent(spark):
    """The r11 failure mode pinned: a live native metric must NOT be
    reported absent (pre-r11: the scalar stream matched nothing →
    absent fired)."""
    nh = _nh(spark, [_row("a", 5, [1])])
    assert _eval(spark, nh, "absent_over_time(h[10m])").collect() == []
    # and a genuinely empty window IS absent
    (r,) = _eval(
        spark, nh, 'absent_over_time(h{job="none"}[10m])').collect()
    assert r["value"] == 1.0


def test_absent_instant_over_native_vector(spark):
    nh = _nh(spark, [_row("a", 5, [1])])
    assert _eval(spark, nh, "absent(h)").collect() == []
    (r,) = _eval(spark, nh, 'absent(h{job="none"})').collect()
    assert r["value"] == 1.0


def test_sum_over_time_merges_samples(spark):
    """sum_over_time merges a series' samples across TIME with the
    same aligned merge as series across space: collapse with
    histogram_count to check the total."""
    nh = _nh(spark, [
        _row("a", 0, [1, 2], zero=1),
        _row("a", 5, [3, 4], zero=2),
    ])
    (r,) = _eval(
        spark, nh, "histogram_count(sum_over_time(h[10m]))").collect()
    # counts: (1+1+2) + (2+3+4) = 13
    assert r["value"] == 13.0
    (r2,) = _eval(
        spark, nh, "histogram_count(avg_over_time(h[10m]))").collect()
    assert r2["value"] == 6.5


def test_last_first_over_time(spark):
    nh = _nh(spark, [
        _row("a", 0, [1]), _row("a", 5, [7]),
    ])
    (last,) = _eval(
        spark, nh, "histogram_count(last_over_time(h[10m]))").collect()
    assert last["value"] == 7.0
    (first,) = _eval(
        spark, nh, "histogram_count(first_over_time(h[10m]))").collect()
    assert first["value"] == 1.0


def test_estimator_forms_refuse(spark):
    from prom_etl_db_spark.operators.promql_parser import PromQLError

    nh = _nh(spark, [_row("a", 5, [1])])
    with pytest.raises(PromQLError, match="not defined over native"):
        _eval(spark, nh, "max_over_time(h[10m])")
    with pytest.raises(PromQLError, match="not defined over native"):
        _eval(spark, nh, "quantile_over_time(0.5, h[10m])")


def test_hist_addsub_group_left_many_to_one(spark):
    """r11: group_left over h − h (the last named string-surface
    boundary) — many per-endpoint error histograms each subtract ONE
    shared baseline by match key; output keeps each many series' own
    labels."""
    from prom_etl_db_spark.operators.promql_parser import (
        PromQLError, eval_promql,
    )

    rows = []
    # many side h: two endpoints under job=j
    for ep, c in (("e1", [5, 5]), ("e2", [9, 9])):
        rows.append(Row(metric_name="h", labels={"job": "j", "ep": ep},
                        ts=_ts(5), schema=0, zero_threshold=0.001,
                        zero_count=0, count=sum(c), sum=float(sum(c)),
                        pos_offset=0, pos_counts=c, neg_offset=0,
                        neg_counts=[]))
    # one side base: one series keyed by job
    rows.append(Row(metric_name="base", labels={"job": "j"},
                    ts=_ts(5), schema=0, zero_threshold=0.001,
                    zero_count=0, count=4, sum=4.0,
                    pos_offset=0, pos_counts=[2, 2], neg_offset=0,
                    neg_counts=[]))
    nh = spark.createDataFrame(rows, NH_SCHEMA)
    out = eval_promql(
        _samples(spark),
        "histogram_count(h - on(job) group_left base)",
        _ts(6), native_hists=nh,
        native_metrics=frozenset({"h", "base"}))
    got = {r["labels"]["ep"]: r["value"] for r in out.collect()}
    assert got == {"e1": 6.0, "e2": 14.0}
    # duplicate ONE side refuses
    rows_dup = rows + [Row(
        metric_name="base", labels={"job": "j", "x": "2"}, ts=_ts(5),
        schema=0, zero_threshold=0.001, zero_count=0, count=1,
        sum=1.0, pos_offset=0, pos_counts=[1], neg_offset=0,
        neg_counts=[])]
    nh2 = spark.createDataFrame(rows_dup, NH_SCHEMA)
    bad = eval_promql(
        _samples(spark),
        "histogram_count(h - on(job) group_left base)",
        _ts(6), native_hists=nh2,
        native_metrics=frozenset({"h", "base"}))
    with pytest.raises(Exception, match="ONE side"):
        bad.collect()
    # label carry stays a named refusal
    with pytest.raises(PromQLError, match="label carry"):
        eval_promql(
            _samples(spark),
            "histogram_count(h - on(job) group_left(ep) base)",
            _ts(6), native_hists=nh,
            native_metrics=frozenset({"h", "base"}))


def test_hist_addsub_group_right_and_unmatched_drop(spark):
    """group_right mirrors (many side on the right); unmatched many
    rows drop (inner matching)."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    rows = [
        Row(metric_name="base", labels={"job": "j"}, ts=_ts(5),
            schema=0, zero_threshold=0.001, zero_count=0, count=4,
            sum=4.0, pos_offset=0, pos_counts=[2, 2], neg_offset=0,
            neg_counts=[]),
        Row(metric_name="h", labels={"job": "j", "ep": "e1"}, ts=_ts(5),
            schema=0, zero_threshold=0.001, zero_count=0, count=10,
            sum=10.0, pos_offset=0, pos_counts=[5, 5], neg_offset=0,
            neg_counts=[]),
        # unmatched many row (different job) must DROP
        Row(metric_name="h", labels={"job": "other", "ep": "e9"},
            ts=_ts(5), schema=0, zero_threshold=0.001, zero_count=0,
            count=3, sum=3.0, pos_offset=0, pos_counts=[3],
            neg_offset=0, neg_counts=[]),
    ]
    nh = spark.createDataFrame(rows, NH_SCHEMA)
    out = eval_promql(
        _samples(spark),
        "histogram_count(base + on(job) group_right h)",
        _ts(6), native_hists=nh,
        native_metrics=frozenset({"h", "base"}))
    got = {r["labels"].get("ep"): r["value"] for r in out.collect()}
    assert got == {"e1": 14.0}


def test_info_string_routed(spark):
    """r11: Prometheus 3's experimental info() as a STRING — enrich
    sample labels with target_info data labels; the data-label
    selector names, constrains, and can pick another info metric."""
    from pyspark.sql import Row as R

    from prom_etl_db_spark.operators.promql_parser import eval_promql

    rows = [
        R(metric_name="svc_up", labels={"instance": "i1", "job": "j"},
          value=1.0, timestamp=_ts(5)),
        R(metric_name="svc_up", labels={"instance": "i2", "job": "j"},
          value=2.0, timestamp=_ts(5)),
        R(metric_name="target_info",
          labels={"instance": "i1", "job": "j",
                  "cluster": "us", "owner": "core"},
          value=1.0, timestamp=_ts(5)),
        R(metric_name="build_info",
          labels={"instance": "i1", "job": "j", "version": "2.1"},
          value=1.0, timestamp=_ts(5)),
    ]
    samples = spark.createDataFrame(
        rows, "metric_name string, labels map<string,string>, "
              "value double, timestamp timestamp")
    out = eval_promql(samples, "info(svc_up)", _ts(6))
    got = {r["labels"]["instance"]: dict(r["labels"])
           for r in out.collect()}
    assert got["i1"]["cluster"] == "us" and got["i1"]["owner"] == "core"
    assert "cluster" not in got["i2"]       # no info series → unchanged
    # data-label selector: name + constrain (owner not named → dropped)
    out2 = eval_promql(
        samples, 'info(svc_up, {cluster=~"u.*"})', _ts(6))
    g2 = {r["labels"]["instance"]: dict(r["labels"])
          for r in out2.collect()}
    assert g2["i1"]["cluster"] == "us" and "owner" not in g2["i1"]
    # __name__ matcher picks another info metric
    out3 = eval_promql(
        samples, 'info(svc_up, {__name__="build_info"})', _ts(6))
    g3 = {r["labels"]["instance"]: dict(r["labels"])
          for r in out3.collect()}
    assert g3["i1"]["version"] == "2.1"
