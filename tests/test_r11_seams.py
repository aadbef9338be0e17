"""Round-11 adversarial seam pass over ``promql_native.py`` (VERDICT
r10 task #4 — the r10 round's newest module: its modules are gated,
the seams between them are not). Each test pins one named seam:

1. ``offset`` on a native selector composed with RANGE mode;
2. a native selector whose matchers drop every series (empty
   HistVector through sum_by → quantile — empty, not NULL, contract);
3. NHCB and exponential rows under one selector in the SAME ``sum by``
   group — the custom_values family guard must fire through the
   string path;
4. ``avg by`` in range mode where a series drops at some instants
   (the denominator must be the PER-INSTANT surviving-series count);
5. h ± h matching where one side is empty (unmatched series drop —
   empty result, no error).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _ts(minutes):
    return datetime(2024, 1, 29, 0, 0) + timedelta(minutes=minutes)


NH_SCHEMA = (
    "metric_name string, labels map<string,string>, ts timestamp, "
    "schema int, zero_threshold double, zero_count long, "
    "count long, sum double, pos_offset int, "
    "pos_counts array<long>, neg_offset int, neg_counts array<long>"
)


def _nh(spark, rows, schema=NH_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _samples(spark):
    return spark.createDataFrame(
        [], "metric_name string, labels map<string,string>, "
            "value double, timestamp timestamp")


def _row(job, minutes, counts, *, schema=0, zero=0, name="h"):
    return Row(metric_name=name, labels={"job": job}, ts=_ts(minutes),
               schema=schema, zero_threshold=0.001, zero_count=zero,
               count=zero + sum(counts), sum=float(sum(counts)),
               pos_offset=0, pos_counts=list(counts), neg_offset=0,
               neg_counts=[])


def test_offset_on_native_selector_in_range_mode(spark):
    """``histogram_count(increase(h[10m] offset 10m))`` on a grid:
    the data sits at t0/t0+5m; with a 10m offset a grid instant at
    t0+15m reads the window [t0-5m, t0+5m] — both samples, count
    increase 4. Without the offset that instant's window holds only
    one (shifted) sample and drops."""
    from prom_etl_db_spark.operators.promql_native import (
        eval_native_range,
    )
    from prom_etl_db_spark.operators.promql_parser import parse

    nh = _nh(spark, [
        _row("a", 0, [1, 1]),
        _row("a", 5, [3, 3]),
    ])
    node = parse("histogram_count(increase(h[10m] offset 10m))")
    out = eval_native_range(
        nh, frozenset({"h"}), node,
        start=_ts(15), end=_ts(15), step="5m").collect()
    assert len(out) == 1
    assert out[0]["value"] == 4.0
    # sanity: without the offset the same instant yields nothing
    node2 = parse("histogram_count(increase(h[10m]))")
    out2 = eval_native_range(
        nh, frozenset({"h"}), node2,
        start=_ts(15), end=_ts(15), step="5m").collect()
    assert out2 == []


def test_empty_matcher_selector_yields_empty_vector(spark):
    """Matchers dropping every series must flow through
    sum by → quantile as an EMPTY result vector — not a NULL-valued
    row, not an error (Prometheus returns an empty instant vector)."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    nh = _nh(spark, [
        _row("a", 0, [1, 1]),
        _row("a", 5, [3, 3]),
    ])
    out = eval_promql(
        _samples(spark),
        'histogram_quantile(0.9, sum by (job) (rate(h{job="none"}[10m])))',
        _ts(6), native_hists=nh, native_metrics=frozenset({"h"}))
    assert out.collect() == []
    # the grouped-to-() form too: sum(...) over nothing is empty
    out2 = eval_promql(
        _samples(spark),
        'histogram_quantile(0.9, sum(rate(h{job="none"}[10m])))',
        _ts(6), native_hists=nh, native_metrics=frozenset({"h"}))
    assert out2.collect() == []


def test_nhcb_exp_mix_in_one_sum_by_group_refuses(spark):
    """Two SERIES (so increase's same-series guard can't fire) — one
    NHCB, one exponential — under one `sum by (grp)` group: the
    family guard must refuse through the STRING path, not silently
    merge index-wise across different bucket geometries."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    schema = NH_SCHEMA + ", custom_values array<double>"
    rows = [
        Row(metric_name="h", labels={"grp": "g", "i": "1"}, ts=_ts(0),
            schema=0, zero_threshold=0.001, zero_count=0, count=2,
            sum=2.0, pos_offset=0, pos_counts=[1, 1], neg_offset=0,
            neg_counts=[], custom_values=None),
        Row(metric_name="h", labels={"grp": "g", "i": "1"}, ts=_ts(5),
            schema=0, zero_threshold=0.001, zero_count=0, count=4,
            sum=4.0, pos_offset=0, pos_counts=[2, 2], neg_offset=0,
            neg_counts=[], custom_values=None),
        Row(metric_name="h", labels={"grp": "g", "i": "2"}, ts=_ts(0),
            schema=-53, zero_threshold=0.0, zero_count=0, count=2,
            sum=2.0, pos_offset=0, pos_counts=[1, 1], neg_offset=0,
            neg_counts=[], custom_values=[0.5, 1.0]),
        Row(metric_name="h", labels={"grp": "g", "i": "2"}, ts=_ts(5),
            schema=-53, zero_threshold=0.0, zero_count=0, count=5,
            sum=5.0, pos_offset=0, pos_counts=[2, 3], neg_offset=0,
            neg_counts=[], custom_values=[0.5, 1.0]),
    ]
    nh = _nh(spark, rows, schema)
    out = eval_promql(
        _samples(spark),
        "histogram_quantile(0.9, sum by (grp) (increase(h[10m])))",
        _ts(6), native_hists=nh, native_metrics=frozenset({"h"}))
    with pytest.raises(Exception, match="custom|famil|schema"):
        out.collect()


def test_avg_by_range_mode_per_instant_denominator(spark):
    """Range-mode ``avg by``: series b has samples only inside the
    SECOND instant's window, so instant 1 must average over 1 series
    and instant 2 over 2 — a global series count would be wrong."""
    from prom_etl_db_spark.operators.promql_native import (
        eval_native_range,
    )
    from prom_etl_db_spark.operators.promql_parser import parse

    nh = _nh(spark, [
        # series a: in both windows (increase 4 then 4)
        _row("a", 0, [1, 1]), _row("a", 4, [3, 3]),
        _row("a", 6, [4, 4]), _row("a", 9, [5, 5]),
        # series b: only the second window holds two samples
        _row("b", 6, [0, 1]), _row("b", 9, [4, 5]),
    ])
    node = parse(
        "histogram_count(avg by (job) (increase(h[5m])))")
    out = eval_native_range(
        nh, frozenset({"h"}), node,
        start=_ts(5), end=_ts(10), step="5m")
    got = {(r["labels"].get("job"), r["bucket_start"].minute):
           round(r["value"], 4) for r in out.collect()}
    # instant t0+5: only series a (window [0,5] holds a's 2 samples);
    # series b absent — no fabricated zero row
    assert got[("a", 5)] == 4.0 and ("b", 5) not in got
    # instant t0+10: each job its own group of ONE series — a's
    # window increase is 2, b's is 8; a cross-instant global count
    # would divide these wrongly
    assert got[("a", 10)] == 2.0
    assert got[("b", 10)] == 8.0


def test_avg_by_grouped_range_merges_per_instant(spark):
    """Same data, ONE group (both series share the group key): the
    merged per-instant average must use that instant's series count
    (1 at instant 1, 2 at instant 2)."""
    from prom_etl_db_spark.operators.promql_native import (
        eval_native_range,
    )
    from prom_etl_db_spark.operators.promql_parser import parse

    rows = []
    for job, pts in (("a", [(0, [1, 1]), (4, [3, 3]),
                            (6, [4, 4]), (9, [5, 5])]),
                     ("b", [(6, [0, 1]), (9, [4, 5])])):
        for m, c in pts:
            r = _row(job, m, c)
            d = r.asDict()
            d["labels"] = {"job": job, "g": "x"}
            rows.append(Row(**d))
    nh = _nh(spark, rows)
    node = parse("histogram_count(avg by (g) (increase(h[5m])))")
    out = eval_native_range(
        nh, frozenset({"h"}), node,
        start=_ts(5), end=_ts(10), step="5m")
    got = {r["bucket_start"].minute: round(r["value"], 4)
           for r in out.collect()}
    assert got[5] == 4.0          # only series a present → /1
    assert got[10] == 5.0         # (2 + 8) / 2


def test_hist_addsub_one_side_empty_drops(spark):
    """h1 - h2 with matching where one side has no series: unmatched
    series DROP (one-to-one matching) — empty result, no error."""
    from prom_etl_db_spark.operators.promql_parser import eval_promql

    nh = _nh(spark, [
        _row("a", 5, [2, 2], name="h1"),
    ])
    out = eval_promql(
        _samples(spark),
        "histogram_count(h1 - h2)",
        _ts(6), native_hists=nh,
        native_metrics=frozenset({"h1", "h2"}))
    assert out.collect() == []
    # and ignoring() matching with an empty side behaves the same
    out2 = eval_promql(
        _samples(spark),
        "histogram_count(h1 - ignoring(i) h2)",
        _ts(6), native_hists=nh,
        native_metrics=frozenset({"h1", "h2"}))
    assert out2.collect() == []


def test_grid_irate_differs_from_rate(spark):
    """Grid ``irate``: within one window holding 3 samples, irate
    reads the newest-two pair only — rate reads the endpoints. The
    fixture makes them differ (steps +2 then +8 per bucket)."""
    from prom_etl_db_spark.operators.promql_native import (
        eval_native_range,
    )
    from prom_etl_db_spark.operators.promql_parser import parse

    nh = _nh(spark, [
        _row("a", 0, [1, 1]),
        _row("a", 4, [3, 3]),
        _row("a", 8, [11, 11]),
    ])
    kw = dict(start=_ts(10), end=_ts(10), step="5m")
    irate = eval_native_range(
        nh, frozenset({"h"}),
        parse("histogram_count(irate(h[10m]))"), **kw).collect()
    rate = eval_native_range(
        nh, frozenset({"h"}),
        parse("histogram_count(rate(h[10m]))"), **kw).collect()
    # irate pair: ts 4 → 8, count increase 16 over 240 s
    assert round(irate[0]["value"], 6) == round(16 / 240, 6)
    # rate endpoints: ts 0 → 8, increase 20 over 480 s
    assert round(rate[0]["value"], 6) == round(20 / 480, 6)


def test_grid_idelta_gauge_semantics(spark):
    """Grid ``idelta``: newest-two signed difference, a drop is DATA
    (no reset snapshot)."""
    from prom_etl_db_spark.operators.promql_native import (
        eval_native_range,
    )
    from prom_etl_db_spark.operators.promql_parser import parse

    nh = _nh(spark, [
        _row("a", 0, [1, 1]),
        _row("a", 4, [9, 9]),
        _row("a", 8, [5, 6]),   # drops — gauge movement
    ])
    out = eval_native_range(
        nh, frozenset({"h"}),
        parse("histogram_count(idelta(h[10m]))"),
        start=_ts(10), end=_ts(10), step="5m").collect()
    # newest two: [9,9] → [5,6]: count delta = (5+6) − (9+9) = −7
    assert out[0]["value"] == -7.0


def test_grid_resets_changes_per_instant(spark):
    """Top-level resets()/changes() in range mode: pairs are walked
    INSIDE each window — instant 1's window misses the drop, instant
    2's window contains it."""
    from prom_etl_db_spark.operators.promql_native import (
        eval_native_range,
    )
    from prom_etl_db_spark.operators.promql_parser import parse

    nh = _nh(spark, [
        _row("a", 0, [2, 2]),
        _row("a", 3, [4, 4]),
        _row("a", 7, [1, 1]),   # reset
    ])
    kw = dict(start=_ts(5), end=_ts(10), step="5m")
    r = {x["bucket_start"].minute: x["value"] for x in eval_native_range(
        nh, frozenset({"h"}), parse("resets(h[5m])"), **kw).collect()}
    c = {x["bucket_start"].minute: x["value"] for x in eval_native_range(
        nh, frozenset({"h"}), parse("changes(h[5m])"), **kw).collect()}
    # window [0,5]: samples 0,3 → growth only
    assert r[5] == 0.0 and c[5] == 1.0
    # window [5,10]: sample 7 alone → 0 pairs
    assert r[10] == 0.0 and c[10] == 0.0
    # widen the frame so a window catches the drop pair
    r2 = {x["bucket_start"].minute: x["value"] for x in eval_native_range(
        nh, frozenset({"h"}), parse("resets(h[10m])"),
        start=_ts(10), end=_ts(10), step="5m").collect()}
    assert r2[10] == 1.0


def test_grid_stddev_collapse(spark):
    """r11: histogram_stddev/stdvar in RANGE mode (the instant path
    collapsed these since r8; the range path refused). Increase of 8
    observations in bucket index 0 (schema 0 → covers (0.5, 1],
    geometric mid 2^-0.5) with carried count/sum increases 8/8.0
    (mean 1): stdvar = (8·(2^-0.5)² − 2·1·8·2^-0.5 + 1²·8) / 8
    = 1.5 − √2 ≈ 0.085786 — the estimator centers on the STORED
    sum/count mean, Prometheus's rule."""
    import math

    from prom_etl_db_spark.operators.promql_native import (
        eval_native_range,
    )
    from prom_etl_db_spark.operators.promql_parser import parse

    nh = _nh(spark, [
        _row("a", 0, [2]),
        _row("a", 5, [10]),
    ])
    expected = 1.5 - math.sqrt(2)
    out = eval_native_range(
        nh, frozenset({"h"}),
        parse("histogram_stdvar(increase(h[10m]))"),
        start=_ts(10), end=_ts(10), step="5m").collect()
    assert len(out) == 1
    assert round(out[0]["value"], 9) == round(expected, 9)
    out2 = eval_native_range(
        nh, frozenset({"h"}),
        parse("histogram_stddev(increase(h[10m]))"),
        start=_ts(10), end=_ts(10), step="5m").collect()
    assert round(out2[0]["value"], 9) == round(math.sqrt(expected), 9)


def test_mixed_family_quantile_on_grid(spark):
    """r11: the mixed classic+native split on the RANGE path — a
    Grafana panel during migration. Native series via the grid
    combinators; classic le-series under the same name via the scalar
    grid increase + per-instant classic quantile; one result."""
    from prom_etl_db_spark.operators.promql_native import (
        eval_native_range,
    )
    from prom_etl_db_spark.operators.promql_parser import parse

    nh = _nh(spark, [
        # native: growth [0, 4] at idx 1..2 → q=0.5 → 2^1.5
        Row(metric_name="h", labels={"fam": "n"}, ts=_ts(0), schema=0,
            zero_threshold=0.001, zero_count=0, count=2, sum=2.0,
            pos_offset=1, pos_counts=[1, 1], neg_offset=0,
            neg_counts=[]),
        Row(metric_name="h", labels={"fam": "n"}, ts=_ts(5), schema=0,
            zero_threshold=0.001, zero_count=0, count=6, sum=10.0,
            pos_offset=1, pos_counts=[1, 5], neg_offset=0,
            neg_counts=[]),
    ])
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
    out = eval_native_range(
        nh, frozenset({"h"}),
        parse("histogram_quantile(0.5, rate(h[10m]))"),
        start=_ts(6), end=_ts(6), step="1m", samples=samples)
    got = {r["labels"]["fam"]: round(r["value"], 6)
           for r in out.collect()}
    assert got["n"] == round(2 ** 1.5, 6)
    # classic increases 2/4/4 → rank 2 ≤ r1 → 2/2*1 = 1.0
    assert got["c"] == 1.0
    # without a samples frame: native leg only (backward compatible)
    out2 = eval_native_range(
        nh, frozenset({"h"}),
        parse("histogram_quantile(0.5, rate(h[10m]))"),
        start=_ts(6), end=_ts(6), step="1m")
    assert {r["labels"]["fam"] for r in out2.collect()} == {"n"}
