"""Relative-time expression DSL (SURVEY.md §2.A row T1).

Pure-Python re-implementation of the reference's time-expression grammar
(`/root/reference/internal/timeparser/parser.go:58-247`), extended to the
*documented* superset (`/root/reference/docs/user-guide.md:132-167`):

- ``now``
- keywords: ``today``, ``today_end``, ``yesterday``, ``yesterday_end``,
  ``last_week``, ``last_week_end``, ``last_month``, ``last_month_end``,
  ``last_quarter``, ``last_year``
- ``today@HH:MM[:SS]`` / ``yesterday@HH:MM[:SS]``
- signed offsets: ``-1d``, ``+2h``, ``-1h30m``, ``-90s`` (Go-duration style
  combos of h/m/s plus a d unit; docs also use ``w`` for weeks — supported
  here as a documented-superset fix, see SURVEY.md T1 note)
- ``now±<offset>`` prefix form (``now-1h``) — documented but rejected by the
  Go parser; we accept it (documented superset).

Calendar-anchor semantics follow jinzhu/now defaults as the reference uses
them (`parser.go:71-93`): weeks start on **Sunday**; ``*_end`` anchors are
end-of-period at maximum sub-second precision (here µs: ``.999999``).

Divergence (recorded per SURVEY.md §2.A T1 note): Go's ``AddDate(0,-1,0)``
on e.g. Mar 31 normalizes to Mar 3 (no Feb 31); we clamp to the last day of
the target month instead (Feb 28/29), which is the intended calendar
semantics.  ``last_quarter``/``last_year`` anchor at period *start* so no
clamping arises there.

No Spark dependency — resolution happens before plan construction
(SURVEY.md §4.3).
"""

from __future__ import annotations

import calendar
import re
from dataclasses import dataclass
from datetime import datetime, timedelta

__all__ = ["TimeParseError", "RelativeTimeParser", "parse_duration", "resolve_range"]

_END_US = 999999  # µs analogue of jinzhu/now's .999999999 ns end-of-period

# Go-duration style: one or more <number><unit> groups. Units extended with
# d (reference's custom fallback, parser.go:210), w (docs
# user-guide.md:166), and y (PromQL's duration grammar: y = 365d exactly —
# the lexer admits it, so evaluation must too or rate(x[1y]) crashes with
# a TimeParseError that PromQLError handlers don't catch).
_DUR_GROUP = re.compile(r"(\d+(?:\.\d+)?)(ms|us|µs|ns|y|w|d|h|m|s)")
_DUR_FULL = re.compile(r"^(?:\d+(?:\.\d+)?(?:ms|us|µs|ns|y|w|d|h|m|s))+$")

_UNIT_SECONDS = {
    "y": 365 * 86400.0,
    "w": 7 * 86400.0,
    "d": 86400.0,
    "h": 3600.0,
    "m": 60.0,
    "s": 1.0,
    "ms": 1e-3,
    "us": 1e-6,
    "µs": 1e-6,
    "ns": 1e-9,
}


class TimeParseError(ValueError):
    """Raised for expressions outside the documented grammar."""


def parse_duration(s: str) -> timedelta:
    """Parse a Go-style duration string (``"1h30m"``, ``"120s"``, ``"1d"``).

    Mirrors ``time.ParseDuration`` (used at
    `/root/reference/internal/executor/executor.go:372` and
    `/root/reference/internal/prometheus/client.go:188`) plus the d/w units
    from the reference's custom fallback and docs.
    """
    s = s.strip()
    if not s:
        raise TimeParseError("empty duration")
    if not _DUR_FULL.match(s):
        raise TimeParseError(f"invalid duration: {s!r}")
    total = 0.0
    for num, unit in _DUR_GROUP.findall(s):
        total += float(num) * _UNIT_SECONDS[unit]
    return timedelta(seconds=total)


def _begin_of_day(t: datetime) -> datetime:
    return t.replace(hour=0, minute=0, second=0, microsecond=0)


def _end_of_day(t: datetime) -> datetime:
    return t.replace(hour=23, minute=59, second=59, microsecond=_END_US)


def _add_months(t: datetime, months: int) -> datetime:
    """Month arithmetic with end-clamping (documented-superset fix; see
    module docstring for the Go ``AddDate`` divergence)."""
    month_index = t.month - 1 + months
    year = t.year + month_index // 12
    month = month_index % 12 + 1
    day = min(t.day, calendar.monthrange(year, month)[1])
    return t.replace(year=year, month=month, day=day)


@dataclass
class RelativeTimeParser:
    """Resolver with an explicit frozen ``now`` (the reference's mutable-now
    design caused its production freeze bug, `/root/reference/REPAIR.md:5`;
    we require ``now`` at construction and never read the wall clock)."""

    now: datetime

    # -- public API ---------------------------------------------------------

    def parse(self, expr: str) -> datetime:
        """Resolve one expression → datetime (parser.go:58-111 grammar plus
        documented extensions)."""
        expr = (expr or "").strip()
        if expr == "" or expr == "now":
            return self.now

        keyword = self._keyword(expr)
        if keyword is not None:
            return keyword

        if expr.startswith("yesterday"):
            return self._day_at(expr, self.now - timedelta(days=1), "yesterday")
        if expr.startswith("today"):
            return self._day_at(expr, self.now, "today")

        # documented `now-1h` / `now+30m` prefix form (user-guide.md:153-158)
        if expr.startswith("now"):
            rest = expr[3:].strip()
            if rest and rest[0] in "+-":
                return self._relative(rest)
            raise TimeParseError(f"unsupported time expression: {expr}")

        if expr[0] in "+-":
            return self._relative(expr)

        raise TimeParseError(f"unsupported time expression: {expr}")

    def resolve_range(self, start_expr: str, end_expr: str) -> tuple[datetime, datetime]:
        """Resolve a (start, end) pair, validating start <= end
        (parser.go:39-55)."""
        start = self.parse(start_expr)
        end = self.parse(end_expr)
        if start > end:
            raise TimeParseError(
                f"start time ({start.isoformat()}) is after end time ({end.isoformat()})"
            )
        return start, end

    # -- internals ----------------------------------------------------------

    def _keyword(self, expr: str) -> datetime | None:
        n = self.now
        bod, eod = _begin_of_day(n), _end_of_day(n)
        # jinzhu/now: week starts Sunday. Python weekday(): Mon=0..Sun=6.
        days_since_sunday = (n.weekday() + 1) % 7
        begin_of_week = _begin_of_day(n) - timedelta(days=days_since_sunday)
        quarter_start_month = 3 * ((n.month - 1) // 3) + 1
        table = {
            "today": lambda: bod,
            "today_end": lambda: eod,
            "yesterday": lambda: bod - timedelta(days=1),
            "yesterday_end": lambda: eod - timedelta(days=1),
            "last_week": lambda: begin_of_week - timedelta(days=7),
            "last_week_end": lambda: _end_of_day(begin_of_week - timedelta(days=1)),
            "last_month": lambda: _add_months(bod.replace(day=1), -1),
            "last_month_end": lambda: _end_of_day(
                bod.replace(day=1) - timedelta(days=1)
            ),
            "last_quarter": lambda: _add_months(
                bod.replace(day=1, month=quarter_start_month), -3
            ),
            "last_year": lambda: bod.replace(month=1, day=1, year=n.year - 1),
        }
        fn = table.get(expr)
        return fn() if fn else None

    def _day_at(self, expr: str, date: datetime, prefix: str) -> datetime:
        """``today``/``yesterday`` with optional ``@HH:MM[:SS]``
        (parser.go:114-191)."""
        rest = expr[len(prefix):]
        if rest == "":
            return _begin_of_day(date)
        if rest == "_end":
            return _end_of_day(date)
        if not rest.startswith("@"):
            raise TimeParseError(f"invalid {prefix} expression: {expr}")
        parts = rest[1:].split(":")
        if not 2 <= len(parts) <= 3:
            raise TimeParseError(f"invalid time format: {rest[1:]}")
        try:
            nums = [int(p) for p in parts]
        except ValueError as e:
            raise TimeParseError(f"invalid time component in: {expr}") from e
        hour, minute = nums[0], nums[1]
        second = nums[2] if len(nums) == 3 else 0
        if not (0 <= hour < 24 and 0 <= minute < 60 and 0 <= second < 60):
            raise TimeParseError(f"time component out of range: {expr}")
        return date.replace(hour=hour, minute=minute, second=second, microsecond=0)

    def _relative(self, expr: str) -> datetime:
        """Signed offset: ``-1h30m``, ``+2d``, ``-3w`` (parser.go:194-247)."""
        sign = -1 if expr[0] == "-" else 1
        delta = parse_duration(expr[1:])
        return self.now + sign * delta


def resolve_range(start_expr: str, end_expr: str, now: datetime) -> tuple[datetime, datetime]:
    """Module-level convenience wrapper."""
    return RelativeTimeParser(now).resolve_range(start_expr, end_expr)
