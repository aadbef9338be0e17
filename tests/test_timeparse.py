"""T1 grid tests (SURVEY.md §5.2 item 1): the full documented grammar
against a frozen now, including the doc/code divergences recorded in
SURVEY.md §2.A T1."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from prom_etl_db_spark.timeparse import (
    RelativeTimeParser,
    TimeParseError,
    parse_duration,
    resolve_range,
)

# Wednesday, mid-quarter, mid-month
NOW = datetime(2024, 1, 31, 0, 0, 0)
# A different anchor exercising month/quarter/week boundaries
NOW2 = datetime(2024, 3, 31, 15, 45, 30)

END = 999999


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("now", NOW),
        ("", NOW),
        ("  now  ", NOW),
        ("today", datetime(2024, 1, 31)),
        ("today_end", datetime(2024, 1, 31, 23, 59, 59, END)),
        ("yesterday", datetime(2024, 1, 30)),
        ("yesterday_end", datetime(2024, 1, 30, 23, 59, 59, END)),
        # jinzhu/now weeks start Sunday: week of Wed Jan 31 starts Sun Jan 28
        ("last_week", datetime(2024, 1, 21)),
        ("last_week_end", datetime(2024, 1, 27, 23, 59, 59, END)),
        ("last_month", datetime(2023, 12, 1)),
        ("last_month_end", datetime(2023, 12, 31, 23, 59, 59, END)),
        ("last_quarter", datetime(2023, 10, 1)),
        ("last_year", datetime(2023, 1, 1)),
        ("today@06:30", datetime(2024, 1, 31, 6, 30)),
        ("today@23:59:59", datetime(2024, 1, 31, 23, 59, 59)),
        ("yesterday@00:00", datetime(2024, 1, 30)),
        ("yesterday@12:05:07", datetime(2024, 1, 30, 12, 5, 7)),
        ("-1d", datetime(2024, 1, 30)),
        ("+1d", datetime(2024, 2, 1)),
        ("-1h30m", datetime(2024, 1, 30, 22, 30)),
        ("-90s", datetime(2024, 1, 30, 23, 58, 30)),
        ("+2h", datetime(2024, 1, 31, 2, 0)),
        # documented-superset forms (rejected by the Go parser; user-guide
        # documents them — SURVEY.md T1 note)
        ("now-1h", datetime(2024, 1, 30, 23, 0)),
        ("now+30m", datetime(2024, 1, 31, 0, 30)),
        ("-1w", datetime(2024, 1, 24)),
    ],
)
def test_grid(expr, expected):
    assert RelativeTimeParser(NOW).parse(expr) == expected


@pytest.mark.parametrize(
    "expr,expected",
    [
        # Sunday Mar 31: week starts that same day
        ("last_week", datetime(2024, 3, 24)),
        ("last_week_end", datetime(2024, 3, 30, 23, 59, 59, END)),
        # documented-superset clamping: Go AddDate would normalize Feb 31→Mar 2
        ("last_month", datetime(2024, 2, 1)),
        ("last_month_end", datetime(2024, 2, 29, 23, 59, 59, END)),
        ("last_quarter", datetime(2023, 10, 1)),
        ("today", datetime(2024, 3, 31)),
    ],
)
def test_grid_boundary_now(expr, expected):
    assert RelativeTimeParser(NOW2).parse(expr) == expected


@pytest.mark.parametrize(
    "expr",
    ["tomorrow", "nonsense", "today@25:00", "today@1", "yesterday@xx:yy", "--1d", "1d"],
)
def test_rejects(expr):
    with pytest.raises(TimeParseError):
        RelativeTimeParser(NOW).parse(expr)


def test_range_validation():
    start, end = resolve_range("yesterday", "yesterday_end", NOW)
    assert start < end
    with pytest.raises(TimeParseError):
        resolve_range("today", "yesterday", NOW)


@pytest.mark.parametrize(
    "s,secs",
    [
        ("30s", 30),
        ("120s", 120),
        ("1h30m", 5400),
        ("1d", 86400),
        ("2w", 14 * 86400),
        ("1.5h", 5400),
        ("100ms", 0.1),
    ],
)
def test_durations(s, secs):
    assert parse_duration(s) == timedelta(seconds=secs)


def test_duration_rejects():
    for bad in ("", "h", "1x", "-1h", "1h30"):
        with pytest.raises(TimeParseError):
            parse_duration(bad)
