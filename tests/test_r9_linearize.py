"""Round-9 linearization of the delta-histogram accumulation
operators (VERDICT r8 "What's wrong #1": the r8 running-collect_list
fold was quadratic in points-per-series) plus the r9 ADVICE fixes and
the duplicate-timestamp seam. Pins:

- the equal-scale exponential FAST path against a Python reference
  model (many points per series, offset drift, empty rows, negative
  buckets) — the grid+running-sum rewrite must equal the sequential
  merge exactly, including offset placement and union spans;
- the classic-histogram posexplode rewrite on deeper series;
- the new refusals: duplicate delta timestamps (all three operators),
  mid-series bucket_counts length change, the scale-change fold depth
  bound, the series index-span bomb guard;
- NULL-sum poisoning (a delta point without ``sum`` nulls the
  cumulative sum from that point on instead of contributing 0);
- attrs-aware default partitioning (two attr-series of one metric no
  longer interleave);
- hist_stdvar cancellation clamp and native_hist_quantile at q=0.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from prom_etl_db_spark.operators import native_hist as NH
from prom_etl_db_spark.operators import promql


def _exp_df(spark, rows):
    schema = ("metric_name string, temporality int, time_unix_nano long, "
              "scale int, pos_offset int, pos_counts array<long>, "
              "neg_offset int, neg_counts array<long>, zero_count long, "
              "count long, sum double")
    return spark.createDataFrame([Row(**r) for r in rows], schema)


def _exp_point(name, ts, po, pc, *, no=0, nc=(), scale=1, z=0, temp=1,
               sm=1.0):
    pc, nc = list(pc), list(nc)
    return dict(metric_name=name, temporality=temp, time_unix_nano=ts,
                scale=scale, pos_offset=po, pos_counts=pc, neg_offset=no,
                neg_counts=nc, zero_count=z,
                count=z + sum(pc) + sum(nc), sum=sm)


def _ref_accumulate(points):
    """Sequential reference: per-side offset-aligned add with per-side
    union spans — the semantics the r8 fold implemented via
    ``_nh_align_add`` on each side independently (equal scale)."""

    def side(seq, fallback_offsets):
        acc, lo, hi, out = {}, None, None, []
        for (off, counts), fb in zip(seq, fallback_offsets):
            for i, c in enumerate(counts):
                acc[off + i] = acc.get(off + i, 0) + c
            if counts:
                lo = off if lo is None else min(lo, off)
                hi = (off + len(counts)) if hi is None else max(
                    hi, off + len(counts))
            if lo is None:
                out.append((fb, []))
            else:
                out.append((lo, [acc.get(k, 0) for k in range(lo, hi)]))
        return out

    pos = side([(po, pc) for po, pc, _, _ in points],
               [po for po, _, _, _ in points])
    neg = side([(no, nc) for _, _, no, nc in points],
               [no for _, _, no, _ in points])
    return [(p[0], p[1], n[0], n[1]) for p, n in zip(pos, neg)]


def test_exp_fast_path_matches_reference_model(spark):
    """12 points/series with offset drift, empty rows, and negative
    buckets — well past the 2-point fixture depth the r8 probes used."""
    pts = [
        (0, [2, 1], 0, []),
        (1, [1, 3], -2, [4]),
        (3, [], 0, []),          # empty row mid-series
        (-1, [5], -1, [1, 1]),
        (2, [1, 1, 1], 0, []),
        (0, [], -3, [2]),
        (4, [7], 0, []),
        (1, [1], 1, [3]),
        (-2, [1, 0, 2], 0, []),
        (5, [], 0, []),          # empty again
        (0, [1], -2, [1]),
        (3, [2, 2], 2, [2]),
    ]
    rows = [
        _exp_point("m", 10 + i, po, pc, no=no, nc=nc, scale=2)
        for i, (po, pc, no, nc) in enumerate(pts)
    ]
    got = {
        r["time_unix_nano"]: r
        for r in promql.otlp_delta_exp_hist_to_cumulative(
            _exp_df(spark, rows)).collect()
    }
    ref = _ref_accumulate(pts)
    for i, (po, pc, no, nc) in enumerate(ref):
        r = got[10 + i]
        assert r["scale"] == 2 and r["temporality"] == 2
        assert (r["pos_offset"], r["pos_counts"]) == (po, pc), f"row {i}"
        assert (r["neg_offset"], r["neg_counts"]) == (no, nc), f"row {i}"
    # scalar running sums
    assert got[10 + 11]["count"] == sum(
        sum(pc) + sum(nc) for _, pc, _, nc in pts)


def test_exp_fast_path_all_empty_series_keeps_row_offset(spark):
    rows = [_exp_point("m", t, 7, [], no=3, nc=[]) for t in (1, 2)]
    out = {r["time_unix_nano"]: r for r in
           promql.otlp_delta_exp_hist_to_cumulative(
               _exp_df(spark, rows)).collect()}
    assert out[2]["pos_counts"] == [] and out[2]["pos_offset"] == 7
    assert out[2]["neg_counts"] == [] and out[2]["neg_offset"] == 3


def test_delta_dup_timestamp_refuses_everywhere(spark):
    sum_df = spark.createDataFrame(
        [Row(metric_name="m", temporality=1, time_unix_nano=1,
             value_double=1.0),
         Row(metric_name="m", temporality=1, time_unix_nano=1,
             value_double=2.0)],
        "metric_name string, temporality int, time_unix_nano long, "
        "value_double double")
    with pytest.raises(Exception, match="duplicate timestamp"):
        promql.otlp_delta_to_cumulative(sum_df).collect()
    hist_df = spark.createDataFrame(
        [Row(metric_name="m", temporality=1, data_type="histogram",
             time_unix_nano=1, count=1, sum=1.0, bucket_counts=[1],
             explicit_bounds=[0.5]) for _ in range(2)],
        "metric_name string, temporality int, data_type string, "
        "time_unix_nano long, count long, sum double, "
        "bucket_counts array<long>, explicit_bounds array<double>")
    with pytest.raises(Exception, match="duplicate timestamp"):
        promql.otlp_delta_hist_to_cumulative(hist_df).collect()
    exp_df = _exp_df(spark, [_exp_point("m", 5, 0, [1]),
                             _exp_point("m", 5, 0, [2])])
    with pytest.raises(Exception, match="duplicate timestamp"):
        promql.otlp_delta_exp_hist_to_cumulative(exp_df).collect()
    # CUMULATIVE ties are legal (passthrough has no accumulation order)
    cum_ok = spark.createDataFrame(
        [Row(metric_name="m", temporality=2, time_unix_nano=1,
             value_double=1.0) for _ in range(2)], sum_df.schema)
    assert promql.otlp_delta_to_cumulative(cum_ok).count() == 2


def test_classic_hist_deeper_series_and_length_guard(spark):
    deltas = [[1, 0, 2], [0, 3, 1], [2, 2, 0], [1, 1, 1], [0, 0, 5]]
    rows = [
        Row(metric_name="m", temporality=1, data_type="histogram",
            time_unix_nano=t, count=sum(d), sum=float(sum(d)),
            bucket_counts=d, explicit_bounds=[0.5, 2.0])
        for t, d in enumerate(deltas)
    ]
    schema = ("metric_name string, temporality int, data_type string, "
              "time_unix_nano long, count long, sum double, "
              "bucket_counts array<long>, explicit_bounds array<double>")
    out = {r["time_unix_nano"]: r for r in
           promql.otlp_delta_hist_to_cumulative(
               spark.createDataFrame(rows, schema)).collect()}
    run = [0, 0, 0]
    for t, d in enumerate(deltas):
        run = [a + b for a, b in zip(run, d)]
        assert out[t]["bucket_counts"] == run
        assert out[t]["count"] == sum(run)
    bad = spark.createDataFrame(
        [Row(metric_name="m", temporality=1, data_type="histogram",
             time_unix_nano=1, count=1, sum=1.0, bucket_counts=[1, 2],
             explicit_bounds=[0.5, 2.0]),
         Row(metric_name="m", temporality=1, data_type="histogram",
             time_unix_nano=2, count=1, sum=1.0, bucket_counts=[1],
             explicit_bounds=[0.5, 2.0])], schema)
    with pytest.raises(Exception, match="length"):
        promql.otlp_delta_hist_to_cumulative(bad).collect()


def test_classic_hist_null_sum_poisons_cumulative(spark):
    schema = ("metric_name string, temporality int, data_type string, "
              "time_unix_nano long, count long, sum double, "
              "bucket_counts array<long>, explicit_bounds array<double>")
    rows = [
        Row(metric_name="m", temporality=1, data_type="histogram",
            time_unix_nano=1, count=2, sum=4.0, bucket_counts=[2],
            explicit_bounds=[0.5]),
        Row(metric_name="m", temporality=1, data_type="histogram",
            time_unix_nano=2, count=1, sum=None, bucket_counts=[1],
            explicit_bounds=[0.5]),
        Row(metric_name="m", temporality=1, data_type="histogram",
            time_unix_nano=3, count=1, sum=2.0, bucket_counts=[1],
            explicit_bounds=[0.5]),
    ]
    out = {r["time_unix_nano"]: r for r in
           promql.otlp_delta_hist_to_cumulative(
               spark.createDataFrame(rows, schema)).collect()}
    assert out[1]["sum"] == 4.0
    assert out[2]["sum"] is None and out[3]["sum"] is None  # poisoned
    assert out[3]["bucket_counts"] == [4]  # buckets still accumulate


def test_scale_change_fold_depth_bound_refuses(spark):
    rows = [_exp_point("m", t, 0, [1], scale=2) for t in range(5)]
    rows.append(_exp_point("m", 99, 0, [1], scale=1))  # scale change
    with pytest.raises(Exception, match="scale-changing series longer"):
        promql.otlp_delta_exp_hist_to_cumulative(
            _exp_df(spark, rows), scale_change_fold_limit=4).collect()
    # under the bound the fold still runs
    out = promql.otlp_delta_exp_hist_to_cumulative(
        _exp_df(spark, rows), scale_change_fold_limit=16)
    assert out.where(F.col("time_unix_nano") == 99).first()["scale"] == 1


def test_index_span_bomb_guard_refuses(spark):
    rows = [_exp_point("m", 1, 0, [1]),
            _exp_point("m", 2, 9000, [1])]
    with pytest.raises(Exception, match="index span exceeds"):
        promql.otlp_delta_exp_hist_to_cumulative(
            _exp_df(spark, rows)).collect()


def test_attrs_key_separates_series_by_default(spark):
    """r9 ADVICE fix: two attr-distinct series of one metric must NOT
    interleave into a single running sum under the default
    series_cols."""
    df = spark.createDataFrame(
        [Row(metric_name="m", attrs={"pod": "a"}, temporality=1,
             time_unix_nano=1, value_double=1.0),
         Row(metric_name="m", attrs={"pod": "a"}, temporality=1,
             time_unix_nano=2, value_double=1.0),
         Row(metric_name="m", attrs={"pod": "b"}, temporality=1,
             time_unix_nano=1, value_double=10.0),
         Row(metric_name="m", attrs={"pod": "b"}, temporality=1,
             time_unix_nano=2, value_double=10.0)],
        "metric_name string, attrs map<string,string>, temporality int, "
        "time_unix_nano long, value_double double")
    out = promql.otlp_delta_to_cumulative(df)
    got = {(r["attrs"]["pod"], r["time_unix_nano"]): r["value_double"]
           for r in out.collect()}
    assert got[("a", 2)] == 2.0 and got[("b", 2)] == 20.0
    assert "__attrs_key" not in out.columns


def test_hist_stdvar_clamps_cancellation_to_zero(spark):
    """A single-bucket histogram's variance around the geometric mid
    is exactly 0; the expanded-moment form can cancel to a tiny
    negative double — stddev must come out 0, not NaN."""
    import math

    mid = 2.0 ** ((100 - 0.5) / 256.0)  # schema 8, offset 100, index 0
    df = spark.createDataFrame(
        [Row(count=3, sum=3.0 * mid, schema=8, zero_count=0,
             zero_threshold=0.0, pos_offset=100, pos_counts=[3],
             neg_offset=0, neg_counts=[], custom_values=[])],
        "count long, sum double, schema int, zero_count long, "
        "zero_threshold double, pos_offset int, pos_counts array<long>, "
        "neg_offset int, neg_counts array<long>, "
        "custom_values array<double>")
    r = NH.histogram_stats(df).first()
    assert 0.0 <= r["hist_stdvar"] < 1e-9
    assert not math.isnan(r["hist_stddev"]) and 0.0 <= r["hist_stddev"]


def test_native_quantile_q0_returns_infimum_not_null(spark):
    """q=0 returns the lower bound of the first populated walk bucket
    (not NULL as in r8, and not a blanket 0.0 — a positive-only
    histogram with an empty zero bucket observed nothing below its
    first bucket's lower bound)."""
    df = spark.createDataFrame(
        [Row(count=3, sum=3.0, schema=1, zero_count=0,
             zero_threshold=0.0, pos_offset=1, pos_counts=[3],
             neg_offset=0, neg_counts=[], custom_values=[])],
        "count long, sum double, schema int, zero_count long, "
        "zero_threshold double, pos_offset int, pos_counts array<long>, "
        "neg_offset int, neg_counts array<long>, "
        "custom_values array<double>")
    # first populated bucket k=1 (schema 1, base sqrt(2)): lower 2^0=1
    got = NH.native_hist_quantile(df, 0.0).first()["quantile_value"]
    assert got == pytest.approx(1.0)
    # with a populated zero bucket (and no negatives) the infimum is 0
    df_z = df.withColumn("zero_count", F.lit(2).cast("long")).withColumn(
        "zero_threshold", F.lit(0.001)).withColumn(
        "count", F.lit(5).cast("long"))
    assert NH.native_hist_quantile(df_z, 0.0).first()["quantile_value"] == 0.0


def test_null_series_key_accumulates(spark):
    """r9 review fix: a NULL attrs map canonicalizes to a NULL
    __attrs_key; windows partition NULL keys normally but a plain
    name-list join misses them (NULL != NULL), which silently zeroed
    the reassembled bucket arrays. The null-safe join-back must
    accumulate them like any series."""
    hist_df = spark.createDataFrame(
        [Row(metric_name="m", attrs=None, temporality=1,
             data_type="histogram", time_unix_nano=t, count=sum(d),
             sum=float(sum(d)), bucket_counts=d, explicit_bounds=[0.5])
         for t, d in [(1, [2]), (2, [3])]],
        "metric_name string, attrs map<string,string>, temporality int, "
        "data_type string, time_unix_nano long, count long, sum double, "
        "bucket_counts array<long>, explicit_bounds array<double>")
    out = {r["time_unix_nano"]: list(r["bucket_counts"]) for r in
           promql.otlp_delta_hist_to_cumulative(hist_df).collect()}
    assert out == {1: [2], 2: [5]}
    exp = spark.createDataFrame(
        [Row(metric_name="m", attrs=None, temporality=1, time_unix_nano=t,
             scale=1, pos_offset=0, pos_counts=c, neg_offset=0,
             neg_counts=[], zero_count=0, count=sum(c), sum=1.0)
         for t, c in [(1, [2, 1]), (2, [1, 1])]],
        "metric_name string, attrs map<string,string>, temporality int, "
        "time_unix_nano long, scale int, pos_offset int, "
        "pos_counts array<long>, neg_offset int, neg_counts array<long>, "
        "zero_count long, count long, sum double")
    out2 = {r["time_unix_nano"]: list(r["pos_counts"]) for r in
            promql.otlp_delta_exp_hist_to_cumulative(exp).collect()}
    assert out2 == {1: [2, 1], 2: [3, 2]}
