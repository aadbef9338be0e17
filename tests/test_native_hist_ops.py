"""operators/native_hist.py — the histogram_count/sum/avg/stddev/stdvar
family and the NHCB le-mapping (Prometheus promql/functions.go
semantics; see the operator module docstring for the estimator)."""

import math

import pytest
from pyspark.sql import Row

from prom_etl_db_spark.operators import native_hist as NH
from prom_etl_db_spark.functions import remote_write as RW


def _nh_df(spark, rows):
    base = {
        "metric_name": "m", "labels": {}, "timestamp_ms": 0,
        "count": 0, "sum": None, "schema": 0, "zero_threshold": 0.0,
        "zero_count": 0, "pos_offset": 0, "pos_counts": [],
        "neg_offset": 0, "neg_counts": [], "custom_values": [],
    }
    data = []
    for r in rows:
        d = dict(base)
        d.update(r)
        data.append(Row(**d))
    return spark.createDataFrame(data, schema=RW.NATIVE_HIST_SCHEMA)


def test_histogram_stats_hand_vector(spark):
    # schema 1 -> base = 2^(1/2); buckets at indices 2,3 (counts 3,1),
    # one negative bucket at index 1 (count 2), zero bucket 4.
    # mids: +2^(1.5*0.5)=2^0.75, +2^(2.5*0.5)=2^1.25, -2^(0.5*0.5)=-2^0.25
    df = _nh_df(spark, [{
        "count": 10, "sum": 12.0, "schema": 1, "zero_count": 4,
        "pos_offset": 2, "pos_counts": [3, 1],
        "neg_offset": 1, "neg_counts": [2],
    }])
    (r,) = NH.histogram_stats(df).collect()
    mean = 12.0 / 10
    m1, m2, mn = 2 ** 0.75, 2 ** 1.25, -(2 ** 0.25)
    s0, s1 = 3 + 1 + 2 + 4, 3 * m1 + 1 * m2 + 2 * mn
    s2 = 3 * m1 * m1 + 1 * m2 * m2 + 2 * mn * mn
    var = (s2 - 2 * mean * s1 + mean * mean * s0) / 10
    assert r["hist_count"] == 10 and r["hist_sum"] == 12.0
    assert r["hist_avg"] == pytest.approx(mean)
    assert r["hist_stdvar"] == pytest.approx(var)
    assert r["hist_stddev"] == pytest.approx(math.sqrt(var))


def test_histogram_stats_empty_is_nan_and_nhcb_is_null(spark):
    df = _nh_df(spark, [
        {"count": 0, "sum": 0.0},
        {"count": 4, "sum": 2.0, "schema": -53,
         "pos_offset": 0, "pos_counts": [3, 1],
         "custom_values": [1.0]},
    ])
    rows = NH.histogram_stats(df).collect()
    empty = next(r for r in rows if r["count"] == 0)
    assert math.isnan(empty["hist_avg"]) and math.isnan(empty["hist_stdvar"])
    nhcb = next(r for r in rows if r["schema"] == -53)
    # count/sum/avg are geometry-free; stddev needs bucket geometry
    assert nhcb["hist_avg"] == pytest.approx(0.5)
    assert nhcb["hist_stdvar"] is None and nhcb["hist_stddev"] is None


def test_nhcb_le_mapping_appends_inf_and_forces_total(spark):
    df = _nh_df(spark, [
        # +Inf bucket omitted on the wire; count carries 2 extra obs
        {"count": 6, "schema": -53, "pos_offset": 0,
         "pos_counts": [3, 1], "custom_values": [0.5, 2.0]},
        # sender-encoded +Inf bucket UNDERCOUNTS vs count -> forced
        {"count": 9, "schema": -53, "pos_offset": 0,
         "pos_counts": [3, 1, 2], "custom_values": [0.5, 2.0]},
        # exponential row: filtered out
        {"count": 5, "schema": 2, "pos_offset": 0, "pos_counts": [5]},
    ])
    out = NH.nhcb_to_le_buckets(df).select(
        "count", "le_cum.le", "le_cum.cum").collect()
    by_count = {}
    for r in out:
        by_count.setdefault(r["count"], []).append((r["le"], r["cum"]))
    assert sorted(by_count) == [6, 9]
    assert sorted(by_count[6]) == [("+Inf", 6.0), ("0.5", 3.0), ("2.0", 4.0)]
    assert sorted(by_count[9]) == [("+Inf", 9.0), ("0.5", 3.0), ("2.0", 4.0)]


def test_nhcb_le_mapping_offset_and_empty(spark):
    # dense buckets starting past index 0, and a bucketless histogram
    df = _nh_df(spark, [
        {"count": 4, "schema": -53, "pos_offset": 1,
         "pos_counts": [4], "custom_values": [0.5, 2.0]},
        {"count": 3, "schema": -53, "pos_offset": 0,
         "pos_counts": [], "custom_values": [0.5]},
    ])
    out = NH.nhcb_to_le_buckets(df).select(
        "count", "le_cum.le", "le_cum.cum").collect()
    by_count = {}
    for r in out:
        by_count.setdefault(r["count"], []).append((r["le"], r["cum"]))
    assert sorted(by_count[4]) == [("+Inf", 4.0), ("2.0", 4.0)]
    # no finite buckets -> only the appended +Inf with the total
    assert by_count[3] == [("+Inf", 3.0)]


def _nh_rows_df(spark, rows):
    base = {
        "metric_name": "m", "labels": {}, "timestamp_ms": 0,
        "count": 0, "sum": None, "schema": 0, "zero_threshold": 0.001,
        "zero_count": 0, "pos_offset": 0, "pos_counts": [],
        "neg_offset": 0, "neg_counts": [], "custom_values": [],
    }
    return spark.createDataFrame(
        [dict(base, **r) for r in rows], schema=RW.NATIVE_HIST_SCHEMA)


def test_native_quantile_exponential_interpolation(spark):
    """Prometheus-3 native rule: log-uniform within a bucket. schema 0
    (base 2), bucket k=1 covers (1, 2]: q landing halfway INTO the
    bucket's count gives sqrt(1*2) = 2^0.5, not the linear 1.5."""
    df = _nh_rows_df(spark, [
        {"count": 4, "pos_offset": 1, "pos_counts": [4]},
    ])
    (r,) = NH.native_hist_quantile(df, 0.5).collect()
    assert r["quantile_value"] == pytest.approx(2 ** 0.5)
    # boundary agreement: q exactly at the bucket's top = upper bound,
    # where exponential and linear interpolation coincide
    (r1,) = NH.native_hist_quantile(df, 1.0).collect()
    assert r1["quantile_value"] == pytest.approx(2.0)


def test_native_quantile_conventions(spark):
    df = _nh_rows_df(spark, [
        # beyond all buckets (count > bucket sum) -> last upper 2^2
        {"count": 10, "pos_offset": 1, "pos_counts": [2, 2]},
        # inside the zero bucket: linear within (0, zero_threshold]
        {"count": 10, "zero_count": 8, "pos_offset": 1,
         "pos_counts": [1, 1]},
        # empty -> NaN
        {"count": 0},
    ])
    vals = [r["quantile_value"]
            for r in NH.native_hist_quantile(df, 0.5).orderBy(
                "count", "zero_count").collect()]
    assert math.isnan(vals[0])
    assert vals[1] == pytest.approx(4.0)            # count=10,zc=0
    assert vals[2] == pytest.approx(0.001 * 5 / 8)  # count=10,zc=8


def test_native_quantile_negative_direction(spark):
    """r9: negative buckets supported (previously refused). schema 0
    (base 2): neg bucket k covers [-2^k, -2^(k-1)); the walk runs in
    ascending VALUE order (reversed neg dense array → zero → pos) and
    a negative crossing interpolates exponentially in |value| from
    the more-negative end: value = -2^(k - frac)."""
    df = _nh_rows_df(spark, [
        {"count": 4, "neg_offset": 1, "neg_counts": [4]},
    ])
    # q=0.5 lands halfway into neg bucket k=1 ([-2,-1)): -2^(1-0.5)
    (r,) = NH.native_hist_quantile(df, 0.5).collect()
    assert r["quantile_value"] == pytest.approx(-(2 ** 0.5))
    # full three-region histogram: neg [k=0,k=1]=2 each, zero 2,
    # pos [k=1,k=2]=2 each -> walk cums [2,4,6,8,10]
    full = _nh_rows_df(spark, [
        {"count": 10, "zero_count": 2, "neg_offset": 0,
         "neg_counts": [2, 2], "pos_offset": 1, "pos_counts": [2, 2]},
    ])
    for q, want in [
        (0.1, -(2 ** 0.5)),     # neg k=1, frac 0.5
        (0.3, -(2 ** -0.5)),    # neg k=0, frac 0.5
        (0.5, 0.0),             # zero bucket midpoint: -zt + 2zt*0.5
        (0.7, 2 ** 0.5),        # pos k=1, frac 0.5
        (0.0, -2.0),            # infimum: -base^(neg kmax=1)
    ]:
        (r,) = NH.native_hist_quantile(full, q).collect()
        assert r["quantile_value"] == pytest.approx(want, abs=1e-12), q
    # beyond-all with ONLY negative buckets: last upper in walk order
    # is the negative side's top, -base^(neg_offset-1)
    negonly = _nh_rows_df(spark, [
        {"count": 5, "neg_offset": 0, "neg_counts": [2, 2]},
    ])
    (r2,) = NH.native_hist_quantile(negonly, 1.0).collect()
    assert r2["quantile_value"] == pytest.approx(-0.5)


def test_native_quantile_refusals(spark):
    nhcb = _nh_rows_df(spark, [
        {"count": 2, "schema": -53, "pos_counts": [2],
         "custom_values": [1.0]},
    ])
    with pytest.raises(Exception, match="classic linear rule"):
        NH.native_hist_quantile(nhcb, 0.5).collect()


def test_native_fraction_hand_vectors(spark):
    """r9: histogram_fraction over native histograms — clamp-sum CDF.
    schema 0 (base 2): neg [k=0,k=1]=2 each, zero 2 (zt=0.001),
    pos [k=1,k=2]=2 each, count 10."""
    df = _nh_rows_df(spark, [
        {"count": 10, "zero_count": 2, "neg_offset": 0,
         "neg_counts": [2, 2], "pos_offset": 1, "pos_counts": [2, 2]},
    ])

    def frac(lo, hi):
        (r,) = NH.native_hist_fraction(df, lo, hi).collect()
        return r["fraction_value"]

    assert frac(1.0, 2.0) == pytest.approx(0.2)       # whole pos k=1
    assert frac(-2.0, -1.0) == pytest.approx(0.2)     # whole neg k=1
    assert frac(0.0, 1e9) == pytest.approx(0.5)       # upper half
    assert frac(1.0, 2 ** 0.5) == pytest.approx(0.1)  # log-half of k=1
    assert frac(-1e9, 1e9) == pytest.approx(1.0)
    assert frac(5.0, 9.0) == pytest.approx(0.0)       # beyond buckets
    # count above bucket sum: the +Inf mass is unreachable finitely
    over = _nh_rows_df(spark, [
        {"count": 8, "pos_offset": 1, "pos_counts": [4]},
    ])
    (r,) = NH.native_hist_fraction(over, 0.0, 1e12).collect()
    assert r["fraction_value"] == pytest.approx(0.5)
    # empty -> NaN; bad bounds refuse eagerly
    empty = _nh_rows_df(spark, [{"count": 0}])
    (r0,) = NH.native_hist_fraction(empty, 0.0, 1.0).collect()
    assert math.isnan(r0["fraction_value"])
    with pytest.raises(ValueError, match="lower"):
        NH.native_hist_fraction(df, 2.0, 1.0)


def test_native_sum_by_merges_and_downscales(spark):
    """r9: sum by over native histograms — two series of one metric,
    DIFFERENT scales: the scale-2 series downscales (ceil(i/2) merge)
    to the group's coarsest scale 1 before offset-aligned addition.
    s1@scale2: pos [2,1,3] @ off 0 (k=0,1,2) -> @scale1: k=ceil(k/2):
    idx 0<-{0}, 1<-{1,2} => [2,4] @ off 0. s2@scale1: [5] @ off 1.
    merged: off 0, [2, 9]."""
    df = _nh_rows_df(spark, [
        {"metric_name": "m", "count": 7, "sum": 3.0, "schema": 2,
         "zero_count": 1, "pos_offset": 0, "pos_counts": [2, 1, 3]},
        {"metric_name": "m", "count": 7, "sum": 4.0, "schema": 1,
         "zero_count": 2, "pos_offset": 1, "pos_counts": [5]},
    ])
    (r,) = NH.native_hist_sum_by(df, ("metric_name",)).collect()
    assert r["schema"] == 1
    assert (r["pos_offset"], list(r["pos_counts"])) == (0, [2, 9])
    assert r["zero_count"] == 3 and r["count"] == 14 and r["sum"] == 7.0
    assert list(r["neg_counts"]) == []
    # missing sum anywhere nulls the merged sum
    df2 = _nh_rows_df(spark, [
        {"metric_name": "m", "count": 1, "sum": None, "schema": 1,
         "pos_offset": 0, "pos_counts": [1]},
        {"metric_name": "m", "count": 1, "sum": 2.0, "schema": 1,
         "pos_offset": 0, "pos_counts": [1]},
    ])
    (r2,) = NH.native_hist_sum_by(df2, ("metric_name",)).collect()
    assert r2["sum"] is None and list(r2["pos_counts"]) == [2]
    # the merged histogram feeds the native quantile directly
    q = NH.native_hist_quantile(
        NH.native_hist_sum_by(df, ("metric_name",)), 0.9)
    assert q.first()["quantile_value"] is not None


def test_native_sum_by_refusals(spark):
    df = _nh_rows_df(spark, [
        {"metric_name": "m", "count": 1, "schema": -53,
         "pos_offset": 0, "pos_counts": [1], "custom_values": [0.5]},
        {"metric_name": "m", "count": 1, "schema": 1,
         "pos_offset": 0, "pos_counts": [1]},
    ])
    with pytest.raises(Exception, match="bucket families"):
        NH.native_hist_sum_by(df, ("metric_name",)).collect()
    df2 = _nh_rows_df(spark, [
        {"metric_name": "m", "count": 1, "schema": -53,
         "pos_offset": 0, "pos_counts": [1], "custom_values": [0.5]},
        {"metric_name": "m", "count": 1, "schema": -53,
         "pos_offset": 0, "pos_counts": [1], "custom_values": [0.75]},
    ])
    with pytest.raises(Exception, match="custom_values differ"):
        NH.native_hist_sum_by(df2, ("metric_name",)).collect()
    df3 = _nh_rows_df(spark, [
        {"metric_name": "m", "count": 1, "schema": 1,
         "zero_threshold": 0.001, "pos_offset": 0, "pos_counts": [1]},
        {"metric_name": "m", "count": 1, "schema": 1,
         "zero_threshold": 0.01, "pos_offset": 0, "pos_counts": [1]},
    ])
    with pytest.raises(Exception, match="zero_threshold differs"):
        NH.native_hist_sum_by(df3, ("metric_name",)).collect()
    # NHCB groups with EQUAL boundaries sum index-wise
    df4 = _nh_rows_df(spark, [
        {"metric_name": "m", "count": 3, "schema": -53,
         "pos_offset": 0, "pos_counts": [2, 1], "custom_values": [0.5, 2.0]},
        {"metric_name": "m", "count": 4, "schema": -53,
         "pos_offset": 1, "pos_counts": [4], "custom_values": [0.5, 2.0]},
    ])
    (r,) = NH.native_hist_sum_by(df4, ("metric_name",)).collect()
    assert r["schema"] == -53
    assert (r["pos_offset"], list(r["pos_counts"])) == (0, [2, 5])
    assert list(r["custom_values"]) == [0.5, 2.0]


def test_native_rate_zero_window_is_null(spark):
    """r9: rate() over a zero-length window (both endpoints at one
    timestamp is impossible through increase's min_by/max_by — a
    single-sample series yields dt 0) is NULL, Prometheus's
    undefined-rate convention."""
    from datetime import datetime

    df = spark.createDataFrame(
        [{"labels": {"n": "s"}, "ts": datetime(2024, 1, 1),
          "schema": 0, "zero_count": 2, "pos_offset": 0,
          "pos_counts": [4]}],
        "labels map<string,string>, ts timestamp, schema int, "
        "zero_count long, pos_offset int, pos_counts array<long>")
    (r,) = NH.native_hist_rate(df).collect()
    assert r["zero_rate"] is None
    assert list(r["pos_rates"]) == [None]
    # a real 2-point window divides by dt
    df2 = spark.createDataFrame(
        [{"labels": {"n": "s"}, "ts": datetime(2024, 1, 1, 0, 0),
          "schema": 0, "zero_count": 1, "pos_offset": 0,
          "pos_counts": [4]},
         {"labels": {"n": "s"}, "ts": datetime(2024, 1, 1, 0, 5),
          "schema": 0, "zero_count": 3, "pos_offset": 0,
          "pos_counts": [10]}],
        "labels map<string,string>, ts timestamp, schema int, "
        "zero_count long, pos_offset int, pos_counts array<long>")
    (r2,) = NH.native_hist_rate(df2).collect()
    assert r2["zero_rate"] == pytest.approx(2 / 300)
    assert list(r2["pos_rates"]) == [pytest.approx(6 / 300)]
