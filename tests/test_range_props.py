"""Property tests for the sliding-window range family: random sample
sets, random frame/step, BOTH physical strategies (per-instant explode
and the difference-array events path) compared against an independent
brute-force Python evaluator that recomputes every window from the
definition — a sample at ts belongs to grid instant t iff
t − frame ≤ ts < t, grid = start..end inclusive at step multiples.

The existing unit tests pin hand-computed cases and cross-form equality;
this file drives the same code through adversarial shapes hypothesis
finds (samples exactly on grid edges, before the range start, equal
timestamps collapsing through resample-style dedup is avoided by
construction — offsets are distinct)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from prom_etl_db_spark.operators import promql

START = datetime(2024, 1, 1, 6, 0, 0)
END = datetime(2024, 1, 1, 12, 0, 0)

# distinct minute offsets (some BEFORE the range start to exercise the
# back-read) with small integer-ish values
_samples_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-120, max_value=360),  # minutes from START
        st.integers(min_value=-5, max_value=50),  # value
    ),
    min_size=1,
    max_size=24,
    unique_by=lambda t: t[0],
)
_frame_step = st.sampled_from([(30, 10), (60, 30), (120, 30), (90, 20)])


def _mk_df(spark, rows):
    data = [
        ("m", {"s": "a"}, float(v), START + timedelta(minutes=off))
        for off, v in rows
    ]
    return spark.createDataFrame(
        data,
        "metric_name string, labels map<string,string>, value double, "
        "timestamp timestamp",
    )


def _ref_windows(rows, frame_min, step_min):
    """{grid_instant: sorted [values]} for non-empty windows."""
    pts = sorted(
        (START + timedelta(minutes=off), float(v)) for off, v in rows
    )
    out = {}
    t = START
    while t <= END:
        lo = t - timedelta(minutes=frame_min)
        win = [(ts, v) for ts, v in pts if lo <= ts < t]
        if win:
            out[t] = win
        t += timedelta(minutes=step_min)
    return out


@pytest.mark.parametrize("method", ["explode", "events"])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_samples_strategy, fs=_frame_step)
def test_sliding_agg_matches_bruteforce(spark, method, rows, fs):
    frame_min, step_min = fs
    df = _mk_df(spark, rows)
    ref = _ref_windows(rows, frame_min, step_min)

    out = promql.agg_over_time_range(
        df,
        frame=f"{frame_min}m",
        step=f"{step_min}m",
        start=START,
        end=END,
        agg="sum",
        method=method,
    ).collect()
    got = {r["bucket_start"]: r["value"] for r in out}
    expected = {t: sum(v for _, v in win) for t, win in ref.items()}
    assert set(got) == set(expected)
    for t in expected:
        assert got[t] == pytest.approx(expected[t], abs=1e-9), (t, method)

    # stddev rides the two-sums identity — the numerically risky one
    out2 = promql.agg_over_time_range(
        df,
        frame=f"{frame_min}m",
        step=f"{step_min}m",
        start=START,
        end=END,
        agg="stddev",
        method=method,
    ).collect()
    got2 = {r["bucket_start"]: r["value"] for r in out2}
    for t, win in ref.items():
        vals = [v for _, v in win]
        mean = sum(vals) / len(vals)
        exp = math.sqrt(sum((v - mean) ** 2 for v in vals) / len(vals))
        assert got2[t] == pytest.approx(exp, abs=1e-6), (t, method)


@pytest.mark.parametrize("method", ["explode", "events"])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_samples_strategy, fs=_frame_step)
def test_sliding_increase_matches_bruteforce(spark, method, rows, fs):
    frame_min, step_min = fs
    df = _mk_df(spark, rows)
    ref = _ref_windows(rows, frame_min, step_min)

    out = promql.increase_range(
        df,
        frame=f"{frame_min}m",
        step=f"{step_min}m",
        start=START,
        end=END,
        method=method,
    ).collect()
    got = {r["bucket_start"]: r["value"] for r in out}
    expected = {}
    for t, win in ref.items():
        if len(win) < 2:
            continue  # windows with < 1 pair emit no row
        inc = 0.0
        for (_, v1), (_, v2) in zip(win, win[1:]):
            inc += v2 if v2 < v1 else v2 - v1  # reset correction
        expected[t] = inc
    assert set(got) == set(expected), method
    for t in expected:
        assert got[t] == pytest.approx(expected[t], abs=1e-9), (t, method)
