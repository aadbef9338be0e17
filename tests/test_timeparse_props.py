"""Property-based tests for the T1 relative-time DSL (hypothesis).

The reference's production incident was precisely a time-resolution bug
(`/root/reference/REPAIR.md:5`), so the resolver gets the heaviest
verification: invariants that must hold for EVERY expression and every
frozen now, not just the table-driven grid in test_timeparse.py.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from prom_etl_db_spark.timeparse import (
    RelativeTimeParser,
    TimeParseError,
    parse_duration,
    resolve_range,
)

nows = st.datetimes(
    min_value=datetime(1990, 1, 5), max_value=datetime(2100, 12, 25)
)

offsets = st.integers(min_value=0, max_value=10_000)


@given(nows, offsets, st.sampled_from("smhd"))
@settings(max_examples=200, deadline=None)
def test_offset_expressions_are_exact(now, n, unit):
    seconds = {"s": 1, "m": 60, "h": 3600, "d": 86400}[unit]
    p = RelativeTimeParser(now)
    assert p.parse(f"-{n}{unit}") == now - timedelta(seconds=n * seconds)
    assert p.parse(f"+{n}{unit}") == now + timedelta(seconds=n * seconds)


@given(nows)
@settings(max_examples=200, deadline=None)
def test_calendar_anchor_ordering(now):
    """Invariants across the whole keyword family for any now."""
    p = RelativeTimeParser(now)
    assert p.parse("today") <= now <= p.parse("today_end")
    assert p.parse("yesterday") < p.parse("today")
    assert p.parse("yesterday_end") < p.parse("today")
    assert p.parse("yesterday") == p.parse("today") - timedelta(days=1)
    assert p.parse("last_week") <= p.parse("yesterday")
    assert p.parse("last_month") < p.parse("today")
    assert p.parse("last_year") < p.parse("last_month")
    # anchors are day-aligned
    for kw in ("today", "yesterday", "last_week", "last_month", "last_year"):
        t = p.parse(kw)
        assert (t.hour, t.minute, t.second) == (0, 0, 0), kw


@given(nows, st.integers(0, 23), st.integers(0, 59), st.integers(0, 59))
@settings(max_examples=200, deadline=None)
def test_at_time_forms(now, hh, mm, ss):
    p = RelativeTimeParser(now)
    t = p.parse(f"today@{hh:02d}:{mm:02d}:{ss:02d}")
    assert (t.hour, t.minute, t.second) == (hh, mm, ss)
    assert t.date() == now.date()
    y = p.parse(f"yesterday@{hh:02d}:{mm:02d}")
    assert y.date() == (now - timedelta(days=1)).date()
    assert (y.hour, y.minute, y.second) == (hh, mm, 0)


@given(nows, offsets)
@settings(max_examples=100, deadline=None)
def test_resolve_range_orders(now, n):
    start, end = resolve_range(f"-{n + 1}h", "now", now)
    assert start <= end
    # inverted ranges must be rejected, matching parser.go:39-55
    if n > 0:
        try:
            resolve_range("now", f"-{n}h", now)
            raised = False
        except TimeParseError:
            raised = True
        assert raised


@given(st.integers(0, 10**6), st.sampled_from(["s", "m", "h", "d", "w"]))
@settings(max_examples=200, deadline=None)
def test_duration_roundtrip(n, unit):
    seconds = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}[unit]
    assert parse_duration(f"{n}{unit}").total_seconds() == n * seconds


@given(st.text(max_size=12))
@settings(max_examples=300, deadline=None)
def test_garbage_never_crashes_with_other_exceptions(s):
    """Anything outside the grammar raises TimeParseError — never an
    unhandled IndexError/AttributeError (the failure mode that silently
    froze the reference's ingestion)."""
    p = RelativeTimeParser(datetime(2024, 3, 15, 10, 0))
    try:
        p.parse(s)
    except TimeParseError:
        pass
    try:
        parse_duration(s)
    except TimeParseError:
        pass
