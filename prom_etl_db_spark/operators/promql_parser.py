"""PromQL string → DataFrame evaluation over the combinator library.

The reference never evaluates PromQL itself — it ships query STRINGS to
Prometheus (`/root/reference/internal/prometheus/client.go:63-161`) and
its users author configs as strings (`/root/reference/scripts/
migrate.sql:105`, `docs/user-guide.md:63,88`). "Same query capability"
therefore includes accepting those strings: this module parses the
PromQL subset the reference's production surface exercises (plus the
extended functions in ``operators/promql.py``) and lowers it onto the
DataFrame combinators — the parser builds LOGICAL PLANS only; Catalyst
still owns optimization and execution.

Supported grammar (superset of every query string in the reference):

- selectors: ``metric``, ``metric{l="v", l2!="v", l3=~"re", l4!~"re"}``,
  range ``[24h]``, subquery ``[24h:1m]``, ``offset 1d`` (negative
  allowed), ``@ <epoch>`` pinning (either order with offset)
- aggregations (prefix or postfix grouping): ``sum by (a,b) (x)``,
  ``max without (c) (x)``, avg/min/count/stddev/stdvar/group,
  ``quantile(0.9, x)``, ``count_values("lbl", x)``, ``topk(5, x)``,
  ``bottomk(5, x)``, ``limitk(5, x)``, ``limit_ratio(0.3, x)``
  (deterministic pick/sample — DIVERGENCES.md)
- over-time: sum/avg/max/min/count/last/stddev/stdvar/mad/
  present_over_time and ``quantile_over_time(q, ...)`` over BOTH forms
  — a raw range vector
  (``x[1h]``: every raw sample aggregates) or a subquery
  (``x[1h:1m]``: step-aligned first)
- range functions: rate, increase, irate, idelta, delta, deriv,
  changes, resets, ``predict_linear(x[f], t)``
- functions: histogram_quantile, label_replace, label_join, clamp,
  clamp_min, clamp_max, absent, absent_over_time, round
  (to-nearest-multiple semantics), sort/sort_desc,
  sort_by_label(_desc), time, timestamp,
  minute/hour/day_of_week/day_of_month/days_in_month/month/year (UTC,
  session-timezone independent), abs, ceil, floor, exp, ln, sqrt, sgn,
  log2, log10
- binary ops with precedence: ``^``, ``* / %``, ``+ -``, comparisons
  (filtering or with ``bool``), set ops ``and`` / ``unless`` / ``or``
  (semi/anti/union joins on the match key); vector-vector matching via
  ``on(...)`` / ``ignoring(...)``; scalar-vector in both orders

Documented divergences (same policies as the combinators, tested):
- subquery inner expressions evaluate in "stream mode": point-wise ops
  map raw samples, cross-series aggregations regroup per exact step
  bucket, then last-per-bucket step alignment — no staleness LOCF
  across empty buckets (Prometheus would carry values ≤5 m forward).
- rate/increase are exact over stored samples, not extrapolated.
- ``@ start()`` / ``@ end()`` resolve to the executor range-mode
  [start, end] (both equal the eval instant on instant queries). ``group_left/right`` don't
  pre-validate one-side key uniqueness (Prometheus errors; we fan out
  like a join — see ``promql.vector_binop``).
"""

from __future__ import annotations

import calendar
import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prom_etl_db_spark.operators import promql
from prom_etl_db_spark.schema import epoch_seconds
from prom_etl_db_spark.timeparse import parse_duration

__all__ = ["parse", "evaluate", "eval_promql", "EvalContext", "PromQLError"]


class PromQLError(ValueError):
    pass


# -- lexer ------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<DURATION>\d+(?:\.\d+)?(?:ms|[smhdwy])(?:\d+(?:\.\d+)?(?:ms|[smhdwy]))*)
  | (?P<NUM>\d+\.\d+|\d+|\.\d+)
  | (?P<IDENT>[A-Za-z_][A-Za-z0-9_]*(?::[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*'|`[^`]*`)
  | (?P<OP>=~|!~|==|!=|<=|>=|[-+*/%^<>=])
  | (?P<PUNCT>[(){}\[\],:@])
    """,
    re.VERBOSE,
)

_KEYWORDS = {"by", "without", "bool", "offset", "on", "ignoring", "and", "or", "unless"}


@dataclass
class Tok:
    kind: str
    text: str
    pos: int


_ESCAPES = {
    "\\": "\\", '"': '"', "'": "'", "n": "\n", "t": "\t", "r": "\r",
    "a": "\a", "b": "\b", "f": "\f", "v": "\v",
}


def _take_digits(body: str, i: int, n: int, base: int, esc: str) -> int:
    """Read exactly ``n`` digits of ``base`` starting at ``body[i]``;
    Go's strconv rejects short runs (``"\\x4"`` is invalid, not ``\\x``
    + ``4``)."""
    run = body[i : i + n]
    digits = "01234567" if base == 8 else "0123456789abcdefABCDEF"
    if len(run) < n or any(d not in digits for d in run):
        raise PromQLError(f"invalid \\{esc} escape in string literal")
    return int(run, base)


def _unquote(text: str) -> str:
    """String literal token → value, applying Go strconv.Unquote rules
    (the family Prometheus strings use): the single-char escapes plus
    ``\\xNN``, ``\\uNNNN``, ``\\UNNNNNNNN`` and 3-digit octal, and
    backquoted raw strings (no escape processing at all). Bare
    ``text[1:-1]`` would keep raw backslashes — ``{job="a\\"b"}`` would
    then match the 3-char string ``a\\"b`` and regex matchers would
    double every escape. Unknown escapes raise, like Prometheus's parser
    (``"\\."`` is invalid there too — regexes spell it ``"\\\\."``).
    One documented divergence (DIVERGENCES.md): ``\\x``/octal values
    over 0x7F become the code point chr(N) where Go inserts a raw
    (non-UTF-8) byte Python strings cannot hold."""
    if text[0] == "`":
        return text[1:-1]  # Go raw string: backslashes are literal
    body = text[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            i += 1
            e = body[i]  # the lexer guarantees a char follows every \
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
            elif e == "x":
                out.append(chr(_take_digits(body, i + 1, 2, 16, "x")))
                i += 2
            elif e == "u":
                cp = _take_digits(body, i + 1, 4, 16, "u")
                if 0xD800 <= cp <= 0xDFFF:  # Go rejects surrogate runes
                    raise PromQLError("invalid \\u escape in string literal")
                out.append(chr(cp))
                i += 4
            elif e == "U":
                cp = _take_digits(body, i + 1, 8, 16, "U")
                if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                    raise PromQLError("invalid \\U escape in string literal")
                out.append(chr(cp))
                i += 8
            elif e in "01234567":
                v = _take_digits(body, i, 3, 8, e)
                if v > 255:
                    raise PromQLError("invalid octal escape in string literal")
                out.append(chr(v))
                i += 2
            else:
                raise PromQLError(f"unsupported escape \\{e} in string literal")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _lex(s: str) -> list[Tok]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise PromQLError(f"lex error at {i}: {s[i:i+20]!r}")
        kind = m.lastgroup
        text = m.group()
        if kind != "WS":
            if kind == "IDENT" and text in _KEYWORDS:
                kind = "KEYWORD"
            out.append(Tok(kind, text, i))
        i = m.end()
    out.append(Tok("EOF", "", len(s)))
    return out


# -- AST --------------------------------------------------------------------


@dataclass
class Num:
    value: float


@dataclass
class Selector:
    name: str | None
    matchers: list[tuple[str, str, str]]  # (label, op, value)
    range_: str | None = None       # "24h" for x[24h]
    step: str | None = None         # "1m" for x[24h:1m]
    offset: str | None = None       # may be sign-prefixed: "-1h"
    at_: "float | str | None" = None  # epoch seconds, or "start"/"end"


@dataclass
class Agg:
    op: str
    expr: "Node"
    by: list[str] | None = None
    without: list[str] | None = None
    param: "Node | str | None" = None


@dataclass
class Call:
    fn: str
    args: list["Node | str"] = field(default_factory=list)


@dataclass
class BinOp:
    op: str
    lhs: "Node"
    rhs: "Node"
    bool_mod: bool = False
    on: list[str] | None = None
    ignoring: list[str] | None = None
    group: str | None = None        # "left"/"right" for many-to-one matching
    carry: list[str] | None = None  # labels copied from the one side


Node = Num | Selector | Agg | Call | BinOp

_AGG_OPS = {
    "sum", "avg", "max", "min", "count", "stddev", "stdvar", "group",
    "quantile", "count_values", "topk", "bottomk", "limitk", "limit_ratio",
}
_CMP_OPS = {"==", "!=", ">", "<", ">=", "<="}
_SET_OPS = {"and", "or", "unless"}
# loosest → tightest, PromQL order: or < and/unless < comparisons < +- < */% < ^
_PRECEDENCE = [
    ["or"],
    ["and", "unless"],
    ["==", "!=", "<=", ">=", "<", ">"],
    ["+", "-"],
    ["*", "/", "%", "atan2"],  # atan2 binds like * (PromQL spec)
    ["^"],
]


class _Parser:
    def __init__(self, tokens: list[Tok]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise PromQLError(f"expected {text!r} at {t.pos}, got {t.text!r}")
        return t

    # expression with precedence climbing (level 0 = loosest)
    def parse_expr(self, level: int = 0) -> Node:
        if level >= len(_PRECEDENCE):
            return self.parse_unary()
        # ^ is right-associative in PromQL; the rest left
        ops = _PRECEDENCE[level]
        lhs = self.parse_expr(level + 1)
        while self.peek().text in ops:
            op = self.next().text
            bool_mod = False
            on = ignoring = None
            if op in _CMP_OPS and self.peek().text == "bool":
                self.next()
                bool_mod = True
            group = carry = None
            if self.peek().text in ("on", "ignoring"):
                which = self.next().text
                labels = self.parse_label_list()
                if which == "on":
                    on = labels
                else:
                    ignoring = labels
                if self.peek().text in ("group_left", "group_right"):
                    group = self.next().text.removeprefix("group_")
                    # the carry list is optional: group_left or group_left(v)
                    carry = (
                        self.parse_label_list() if self.peek().text == "(" else []
                    )
            right_level = level if op == "^" else level + 1
            rhs = self.parse_expr(right_level)
            lhs = BinOp(op, lhs, rhs, bool_mod, on, ignoring, group, carry)
        return lhs

    def parse_label_list(self) -> list[str]:
        self.expect("(")
        labels = []
        while self.peek().text != ")":
            t = self.next()
            if t.kind not in ("IDENT", "KEYWORD"):
                raise PromQLError(f"bad label {t.text!r} at {t.pos}")
            labels.append(t.text)
            if self.peek().text == ",":
                self.next()
        self.expect(")")
        return labels

    def parse_unary(self) -> Node:
        t = self.peek()
        if t.text == "-":
            self.next()
            # unary minus binds LOOSER than ^ in PromQL: -2^2 == -(2^2)
            inner = self.parse_expr(len(_PRECEDENCE) - 1)
            return BinOp("-", Num(0.0), inner)
        if t.text == "(":
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return self.maybe_range(e)
        if t.kind == "NUM":
            self.next()
            return Num(float(t.text))
        if t.kind == "IDENT":
            if t.text in _AGG_OPS:
                # the whole aggregation can be a subquery: agg(...)[f:s]
                return self.maybe_range(self.parse_agg())
            if self.toks[self.i + 1].text == "(":
                return self.parse_call()
            return self.parse_selector()
        if t.text == "{":
            # nameless selector {job="x"} — valid PromQL; the evaluation
            # layer already types Selector.name as str | None
            return self.parse_selector(named=False)
        raise PromQLError(f"unexpected {t.text!r} at {t.pos}")

    def parse_agg(self) -> Node:
        op = self.next().text
        by = without = None
        if self.peek().text in ("by", "without"):
            which = self.next().text
            labels = self.parse_label_list()
            by, without = (labels, None) if which == "by" else (None, labels)
        self.expect("(")
        param: Node | str | None = None
        if op in ("quantile", "topk", "bottomk", "limitk", "limit_ratio"):
            param = self.parse_expr()
            self.expect(",")
        elif op == "count_values":
            s = self.next()
            if s.kind != "STRING":
                raise PromQLError(f"count_values needs a string label at {s.pos}")
            param = _unquote(s.text)
            self.expect(",")
        expr = self.parse_expr()
        self.expect(")")
        if by is None and without is None and self.peek().text in ("by", "without"):
            which = self.next().text
            labels = self.parse_label_list()
            by, without = (labels, None) if which == "by" else (None, labels)
        return Agg(op, expr, by, without, param)

    def parse_call(self) -> Node:
        name = self.next().text
        self.expect("(")
        args: list[Node | str] = []
        while self.peek().text != ")":
            if self.peek().kind == "STRING":
                args.append(_unquote(self.next().text))
            else:
                args.append(self.parse_expr())
            if self.peek().text == ",":
                self.next()
        self.expect(")")
        return self.maybe_range(Call(name, args))

    def parse_selector(self, named: bool = True) -> Node:
        name = self.next().text if named else None
        matchers: list[tuple[str, str, str]] = []
        if self.peek().text == "{":
            self.next()
            while self.peek().text != "}":
                lbl = self.next()
                op = self.next()
                val = self.next()
                if lbl.kind not in ("IDENT", "KEYWORD") or val.kind != "STRING":
                    raise PromQLError(f"bad matcher near {lbl.pos}")
                if op.text not in ("=", "!=", "=~", "!~"):
                    raise PromQLError(f"bad matcher op {op.text!r}")
                matchers.append((lbl.text, op.text, _unquote(val.text)))
                if self.peek().text == ",":
                    self.next()
            self.expect("}")
        if name is None and not matchers:
            # Prometheus: "vector selector must contain at least one
            # non-empty matcher" — a bare {} would scan everything
            raise PromQLError("nameless selector needs at least one matcher")
        return self.maybe_range(Selector(name, matchers))

    def maybe_range(self, node: Node) -> Node:
        if self.peek().text == "[":
            self.next()
            rng = self.next()
            if rng.kind != "DURATION":
                raise PromQLError(f"bad range duration {rng.text!r}")
            step = None
            if self.peek().text == ":":
                self.next()
                st = self.next()
                if st.kind != "DURATION":
                    raise PromQLError(f"bad step duration {st.text!r}")
                step = st.text
            self.expect("]")
            if isinstance(node, Selector):
                node.range_, node.step = rng.text, step
            else:
                # subquery over a computed expression: wrap
                node = Call("__subquery__", [node, rng.text, step or ""])
        # offset and @ may follow in either order, like PromQL — but at
        # most once each (Prometheus rejects duplicates; silently keeping
        # the last one would compute a window the user did not write)
        while self.peek().text in ("offset", "@"):
            which = self.next().text
            if not isinstance(node, Selector):
                raise PromQLError(f"{which} only supported directly on selectors")
            if which == "offset":
                if node.offset is not None:
                    raise PromQLError("duplicate offset modifier")
                sign = ""
                if self.peek().text == "-":
                    self.next()
                    sign = "-"
                off = self.next()
                if off.kind != "DURATION":
                    raise PromQLError(f"bad offset {off.text!r}")
                node.offset = sign + off.text
            else:
                if node.at_ is not None:
                    raise PromQLError("duplicate @ modifier")
                sign = 1.0
                if self.peek().text == "-":
                    self.next()
                    sign = -1.0  # pre-1970 pins are legal PromQL
                t = self.next()
                if t.kind == "IDENT" and t.text in ("start", "end") and sign > 0:
                    # @ start() / @ end(): pin to the RANGE QUERY bounds
                    # (executor range mode); = the eval instant otherwise
                    self.expect("(")
                    self.expect(")")
                    node.at_ = t.text
                elif t.kind != "NUM":
                    raise PromQLError(f"@ needs an epoch timestamp, got {t.text!r}")
                else:
                    node.at_ = sign * float(t.text)
        return node


def parse(query: str) -> Node:
    p = _Parser(_lex(query))
    node = p.parse_expr()
    if p.peek().kind != "EOF":
        t = p.peek()
        raise PromQLError(f"trailing input at {t.pos}: {t.text!r}")
    return node


# -- evaluation -------------------------------------------------------------


@dataclass
class EvalContext:
    """samples: (metric_name, labels: map<string,string>, value, timestamp).
    ``at`` is the frozen evaluation time; instant selectors look back
    ``staleness``. ``frame`` bounds selector reads to [lo, hi] — applied
    inside ``_selector_stream`` AFTER any offset shift, never to the raw
    table up front."""

    samples: DataFrame
    at: datetime
    staleness: str = "5 minutes"
    frame: tuple[datetime, datetime] | None = None
    # the RANGE QUERY's [start, end] for @ start()/@ end() resolution —
    # distinct from ``frame``, which subquery evaluation overwrites; on
    # an instant query both resolve to the eval instant (PromQL rule)
    range_bounds: tuple[datetime, datetime] | None = None
    # Executor range-mode pins frame=[start, end] INCLUSIVE (both ends are
    # requested eval instants). Frames derived from _frame_bounds (subquery
    # / over-time windows) are half-open [lo, hi) to match _frame's
    # convention everywhere else — those paths set this False.
    frame_right_closed: bool = True
    # r10: NATIVE-HISTOGRAM reachability from query strings (the
    # reference's whole interface is query strings stored in config —
    # /root/reference/scripts/migrate.sql:105, internal/config/
    # database_config.go:11-91). ``native_hists`` is the wire decoders'
    # dense frame (metric_name, labels, ts timestamp, schema,
    # zero_threshold, zero_count, count, sum, pos_offset, pos_counts,
    # neg_offset, neg_counts); ``native_metrics`` names the metrics
    # that live there — selectors for those names route to the
    # native-histogram combinators instead of the scalar sample store.
    native_hists: "DataFrame | None" = None
    native_metrics: frozenset = frozenset()


def _dur(text: str) -> timedelta:
    return parse_duration(text)


def _log_like(base_fn):
    """PromQL log semantics: log(0) = -Inf, log(<0) = NaN — Spark's log
    functions return SQL NULL for both, and a NULL then silently vanishes
    from downstream aggregates instead of poisoning them like Prometheus.
    (NaN input falls to the NaN branch: NaN > 0 is false in SQL.)"""

    def f(c: Column) -> Column:
        return (
            F.when(c > 0, base_fn(c))
            .when(c == 0, F.lit(float("-inf")))
            .otherwise(F.lit(float("nan")))
        )

    return f


_MATH_FNS = {
    "abs": F.abs, "ceil": F.ceil, "floor": F.floor,
    "exp": F.exp, "ln": _log_like(F.log), "sqrt": F.sqrt,
    "sgn": F.signum, "log2": _log_like(F.log2), "log10": _log_like(F.log10),
    # trigonometric family (PromQL since v2.31) — all 1:1 Column fns
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "asinh": F.asinh, "acosh": F.acosh, "atanh": F.atanh,
    "deg": F.degrees, "rad": F.radians,
}

_OVER_TIME = {
    "sum_over_time": promql.sum_over_time,
    "avg_over_time": promql.avg_over_time,
    "max_over_time": promql.max_over_time,
    "min_over_time": promql.min_over_time,
    "count_over_time": promql.count_over_time,
    "last_over_time": promql.last_over_time,
    "stddev_over_time": promql.stddev_over_time,
    "stdvar_over_time": promql.stdvar_over_time,
    "mad_over_time": promql.mad_over_time,
    "present_over_time": promql.present_over_time,
    "ts_of_max_over_time": promql.ts_of_max_over_time,
    "ts_of_min_over_time": promql.ts_of_min_over_time,
    "first_over_time": promql.first_over_time,
    "ts_of_first_over_time": promql.ts_of_first_over_time,
    "ts_of_last_over_time": promql.ts_of_last_over_time,
}

_RANGE_FNS = {
    "rate", "increase", "delta", "deriv", "predict_linear",
    "changes", "resets", "irate", "idelta",
    "double_exponential_smoothing", "holt_winters",
}

# PromQL time-component functions: (Column form over epoch-second sample
# values, Python form over the eval instant). day_of_week is 0=Sunday in
# PromQL; Spark's dayofweek is 1=Sunday.
_TIME_COMPONENT_FNS = {
    "minute": (F.minute, lambda t: t.minute),
    "hour": (F.hour, lambda t: t.hour),
    "day_of_month": (F.dayofmonth, lambda t: t.day),
    "day_of_week": (lambda c: F.dayofweek(c) - 1, lambda t: (t.weekday() + 1) % 7),
    "day_of_year": (F.dayofyear, lambda t: t.timetuple().tm_yday),
    "days_in_month": (
        lambda c: F.dayofmonth(F.last_day(c)),
        lambda t: calendar.monthrange(t.year, t.month)[1],
    ),
    "month": (F.month, lambda t: t.month),
    "year": (F.year, lambda t: t.year),
}

# raw range-vector aggregates (x[1h] with no step — see _eval_call).
# Factories, not Columns: building a Column at import time needs an
# active session in classic mode
_RAW_OVER_TIME = {
    "sum_over_time": lambda: F.sum("value"),
    "avg_over_time": lambda: F.avg("value"),
    "max_over_time": lambda: F.max("value"),
    "min_over_time": lambda: F.min("value"),
    "count_over_time": lambda: F.count(F.lit(1)).cast("double"),
    "last_over_time": lambda: F.max_by("value", "timestamp"),
    "first_over_time": lambda: F.min_by("value", "timestamp"),
    "stddev_over_time": lambda: F.stddev_pop("value"),
    "stdvar_over_time": lambda: F.var_pop("value"),
    "present_over_time": lambda: F.lit(1.0),
    # ts_of family over RAW samples: argmax/argmin on the real sample
    # timestamp (ties to the latest, mirroring the step-grid forms); the
    # plain first/last timestamps are min/max — no struct key needed
    "ts_of_max_over_time": lambda: epoch_seconds(
        F.max_by("timestamp", F.struct(F.col("value"), F.col("timestamp")))
    ),
    "ts_of_min_over_time": lambda: epoch_seconds(
        F.max_by("timestamp", F.struct(-F.col("value"), F.col("timestamp")))
    ),
    "ts_of_first_over_time": lambda: epoch_seconds(F.min("timestamp")),
    "ts_of_last_over_time": lambda: epoch_seconds(F.max("timestamp")),
}


def _interval_str(text: str, *, allow_negative: bool = False) -> str:
    """Duration text → a Spark interval string, millisecond-exact (plain
    int(total_seconds()) would silently truncate '500ms' to zero).
    A leading ``-`` (negative offset: read the FUTURE relative to eval
    time, typically paired with @) is honored only where it makes sense."""
    sign = -1 if text.startswith("-") else 1
    ms = sign * round(_dur(text.lstrip("-")).total_seconds() * 1000)
    if ms == 0 or (ms < 0 and not allow_negative):
        raise PromQLError(f"invalid duration here: {text!r}")
    return f"{ms} milliseconds" if ms % 1000 else f"{ms // 1000} seconds"


def _apply_matchers(df: DataFrame, sel: Selector) -> DataFrame:
    if sel.name is not None:
        df = df.where(F.col("metric_name") == sel.name)
    for lbl, op, val in sel.matchers:
        # PromQL: a missing label IS the empty string — {k=""} matches
        # series without k, {k!=""} excludes them, {k=~".*"} keeps them.
        # __name__ is the metric name itself (stored as its own column,
        # not a labels entry) — {__name__=~"http_.*"} must probe there,
        # not silently match nothing in the labels map.
        if lbl == "__name__":
            c = F.coalesce(F.col("metric_name"), F.lit(""))
        else:
            c = F.coalesce(F.element_at(F.col("labels"), lbl), F.lit(""))
        if op == "=":
            df = df.where(c == val)
        elif op == "!=":
            df = df.where(c != val)
        elif op == "=~":
            df = df.where(c.rlike(f"^(?:{val})$"))
        else:
            df = df.where(~c.rlike(f"^(?:{val})$"))
    return df


def _selector_stream(ctx: EvalContext, sel: Selector) -> DataFrame:
    """Raw matched sample stream: matchers → offset shift → frame clip.
    Order matters: the offset shifts samples forward (selectors read the
    past), so any frame filter must apply AFTER the shift — clipping raw
    timestamps first would read the un-offset window."""
    df = _apply_matchers(ctx.samples, sel)
    if sel.name is None:
        # Nameless selector ({job="x"}) spans METRICS, but series
        # identity downstream is the labels map alone (A9 drops
        # __name__ at ingest) — two metrics with identical labels
        # would collapse into one series. Carry the metric name back
        # in as __name__, which is also Prometheus's wire shape for
        # raw selector results.
        df = df.withColumn(
            "labels",
            F.map_concat(
                F.map_filter(F.col("labels"), lambda k, _: k != "__name__"),
                F.create_map(
                    F.lit("__name__"),
                    F.coalesce(F.col("metric_name"), F.lit("")),
                ),
            ),
        )
    if sel.offset:
        df = promql.offset(df, _interval_str(sel.offset, allow_negative=True))
    if ctx.frame is not None:
        lo, hi = ctx.frame
        upper = (
            F.col("timestamp") <= F.lit(hi)
            if ctx.frame_right_closed
            else F.col("timestamp") < F.lit(hi)
        )
        df = df.where((F.col("timestamp") >= F.lit(lo)) & upper)
    return df


def _at_of(ctx: EvalContext, node: "Node | str") -> datetime:
    """A selector's @ modifier pins ITS evaluation instant; everything
    else uses the context's frozen time. (Naive datetime via the same
    fromtimestamp convention .timestamp() round-trips.)"""
    if isinstance(node, Selector) and node.at_ is not None:
        if node.at_ == "start":
            return ctx.range_bounds[0] if ctx.range_bounds else ctx.at
        if node.at_ == "end":
            return ctx.range_bounds[1] if ctx.range_bounds else ctx.at
        try:
            return datetime.fromtimestamp(node.at_)
        except (OverflowError, ValueError, OSError) as e:
            raise PromQLError(f"@ timestamp out of range: {node.at_}") from e
    return ctx.at


def _frame_bounds(at: datetime, rng: str) -> tuple[datetime, datetime]:
    return at - _dur(rng), at


def _eval_stream(ctx: EvalContext, node: Node, step: str) -> DataFrame:
    """Subquery "stream mode": return a step-aligned (labels, __series,
    bucket_start, value) frame for ``node`` (see module docstring for the
    divergence from per-step re-evaluation)."""
    step_str = _interval_str(step)
    if isinstance(node, Selector):
        if node.range_ is not None:
            raise PromQLError("nested ranges inside a subquery are unsupported")
        if node.at_ is not None:
            # the stream's frame is pinned by the OUTER range — silently
            # reading it at a different instant would be wrong, so refuse
            raise PromQLError("@ on a selector inside a subquery/range "
                              "evaluation is unsupported")
        # tiebreak on value: the generic samples table carries no unique
        # event column, so a duplicate (series, timestamp) pair would
        # otherwise make max_by pick arbitrarily — max value wins,
        # deterministically, and the registry oracles order
        # (ts DESC, value DESC) to match
        return promql.resample(
            _selector_stream(ctx, node), step_str, tiebreakers=["value"]
        )
    if isinstance(node, BinOp):
        if node.op in _SET_OPS:
            # would otherwise fall into the scalar-op dict as a KeyError
            raise PromQLError(f"{node.op} inside a subquery is unsupported")
        # scalar arithmetic / comparisons apply point-wise on the stream
        if isinstance(node.rhs, Num) and not isinstance(node.lhs, Num):
            stream = _eval_stream(ctx, node.lhs, step)
            return _scalar_binop_stream(stream, node, node.rhs.value, flipped=False)
        if isinstance(node.lhs, Num) and not isinstance(node.rhs, Num):
            stream = _eval_stream(ctx, node.rhs, step)
            return _scalar_binop_stream(stream, node, node.lhs.value, flipped=True)
        raise PromQLError("vector-vector ops inside subqueries are unsupported")
    if isinstance(node, Agg):
        if node.op not in ("sum", "avg", "max", "min", "count", "stddev", "stdvar"):
            raise PromQLError(f"{node.op} inside a subquery is unsupported")
        inner = _eval_stream(ctx, node.expr, step)
        agg = {
            "sum": F.sum("value"), "avg": F.avg("value"),
            "max": F.max("value"), "min": F.min("value"),
            "count": F.count(F.lit(1)).cast("double"),
            "stddev": F.stddev_pop("value"), "stdvar": F.var_pop("value"),
        }[node.op]
        by, without = node.by, node.without
        if by is None and without is None:
            by = []  # bare agg collapses every label, PromQL-style
        out = promql.group_by_labels(
            inner, agg, by=by, without=without, extra_keys=["bucket_start"]
        )
        return out.withColumn(
            "__series", F.array_sort(F.map_entries(F.col("labels")))
        )
    if isinstance(node, Call) and node.fn in _MATH_FNS:
        stream = _eval_stream(ctx, node.args[0], step)
        return stream.withColumn("value", _MATH_FNS[node.fn](F.col("value")).cast("double"))
    raise PromQLError(f"unsupported subquery expression: {type(node).__name__}")


class ScalarStream:
    """A PromQL ``scalar()`` carried LAZILY as a 1-row (value double)
    DataFrame instead of a driver-side float. Extracting the value
    eagerly would force an action mid-plan (the reason ``scalar()`` was
    previously rejected); instead the single row rides the plan and every
    binop against a vector becomes a broadcast ``crossJoin`` — a
    BroadcastNestedLoopJoin of exactly one row, free at any scale and
    fully visible to Catalyst."""

    __slots__ = ("df",)

    def __init__(self, df: DataFrame):
        self.df = df


# The native-histogram routing lives in its own module (r10 split at
# the 2,000-line threshold); re-exported here so callers keep one
# import surface. Deferred imports inside promql_native break the
# mutual recursion (the evaluator dispatches there; the lowering
# evaluates sub-expressions back here).
from prom_etl_db_spark.operators.promql_native import (  # noqa: E402
    HistVector,
    _hist_hist_addsub,
    _hist_scalar_scale,
    _hist_vector_scale,
    _native_agg,
    _native_instant_vector,
    _native_over_time,
    _native_range_fn,
    eval_native_range,
    mixed_classic_leg,
)


def _cmp_col(op: str, lhs: Column, rhs: Column) -> Column:
    """IEEE-754 comparison semantics (PromQL/Go): any NaN operand makes
    the comparison false — except ``!=``, which is true. Spark's SQL
    ordering instead treats NaN as equal to NaN and larger than every
    double, so the NaN case must be carved out explicitly."""
    base = {"==": lhs == rhs, "!=": lhs != rhs, ">": lhs > rhs,
            ">=": lhs >= rhs, "<": lhs < rhs, "<=": lhs <= rhs}[op]
    return F.when(F.isnan(lhs) | F.isnan(rhs), F.lit(op == "!=")).otherwise(base)


def _arith_col(node: BinOp, lhs: Column, rhs: Column) -> Column:
    # % is Spark's own modulo (sign of dividend — Go math.Mod/PromQL),
    # NOT pmod: fmod(-5, 3) = -2, pmod gives 1
    ariths = {"+": lhs + rhs, "-": lhs - rhs, "*": lhs * rhs,
              "/": lhs / rhs, "%": lhs % rhs, "^": F.pow(lhs, rhs),
              "atan2": F.atan2(lhs, rhs)}
    if node.op not in ariths:
        raise PromQLError(f"{node.op} is not a scalar-vector operator")
    return ariths[node.op]


def _apply_binop_cols(
    stream: DataFrame, node: BinOp, lhs: Column, rhs: Column, drop: tuple = ()
) -> DataFrame:
    """Apply one vector∘scalar binop where both operands are already
    Columns on ``stream`` — shared by the literal-scalar and
    ScalarStream paths so filter/bool/arith semantics can't diverge."""
    if node.op in _CMP_OPS:
        cmp = _cmp_col(node.op, lhs, rhs)
        if node.bool_mod:
            out = stream.withColumn("value", F.when(cmp, 1.0).otherwise(0.0))
        else:
            out = stream.where(cmp)
    else:
        out = stream.withColumn("value", _arith_col(node, lhs, rhs).cast("double"))
    return out.drop(*drop) if drop else out


def _scalar_binop_stream(stream: DataFrame, node: BinOp, scalar: float, *, flipped: bool) -> DataFrame:
    col = F.col("value")
    lhs, rhs = (F.lit(scalar), col) if flipped else (col, F.lit(scalar))
    return _apply_binop_cols(stream, node, lhs, rhs)


def _stream_scalar_stream(
    stream: DataFrame, node: BinOp, ss: ScalarStream, *, flipped: bool
) -> DataFrame:
    """vector ∘ scalar(expr): broadcast the 1-row scalar frame onto every
    vector row (one BroadcastNestedLoopJoin, no shuffle, no collect)."""
    one = F.broadcast(ss.df.select(F.col("value").alias("__scalar")))
    col, sc = F.col("value"), F.col("__scalar")
    lhs, rhs = (sc, col) if flipped else (col, sc)
    return _apply_binop_cols(stream.crossJoin(one), node, lhs, rhs, drop=("__scalar",))


def _scalar_pair_expr(node: BinOp, lhs: Column, rhs: Column) -> Column:
    """scalar ∘ scalar where at least one side is a ScalarStream column —
    mirrors _scalar_scalar's typing rule (comparison needs ``bool``)."""
    if node.op in _CMP_OPS:
        if not node.bool_mod:
            raise PromQLError("scalar comparison without bool is unsupported")
        return F.when(_cmp_col(node.op, lhs, rhs), 1.0).otherwise(0.0)
    return _arith_col(node, lhs, rhs)


def _scalar_stream_binop(node: BinOp, lhs, rhs) -> ScalarStream:
    """Combine two scalar operands (ScalarStream | float) into one lazy
    scalar: floats fold to literals; two streams broadcast-crossJoin
    their single rows."""
    if isinstance(lhs, ScalarStream) and isinstance(rhs, ScalarStream):
        a = lhs.df.select(F.col("value").alias("__l"))
        b = F.broadcast(rhs.df.select(F.col("value").alias("__r")))
        expr = _scalar_pair_expr(node, F.col("__l"), F.col("__r"))
        return ScalarStream(
            a.crossJoin(b).select(expr.cast("double").alias("value"))
        )
    base = lhs if isinstance(lhs, ScalarStream) else rhs
    lit = F.lit(rhs if isinstance(lhs, ScalarStream) else lhs)
    col = F.col("value")
    l, r = (col, lit) if isinstance(lhs, ScalarStream) else (lit, col)
    expr = _scalar_pair_expr(node, l, r)
    return ScalarStream(base.df.select(expr.cast("double").alias("value")))


def _subquery_parts(node: Node) -> tuple[Node, str, str]:
    """(inner expr, range, step) from a selector[f:s] or __subquery__."""
    if isinstance(node, Selector) and node.step is not None:
        inner = Selector(node.name, node.matchers, offset=node.offset)
        return inner, node.range_, node.step
    if isinstance(node, Call) and node.fn == "__subquery__":
        inner, rng, step = node.args
        if not step:
            raise PromQLError("subquery over an expression needs an explicit step")
        return inner, rng, step
    raise PromQLError("expected a subquery ( expr[frame:step] )")


def evaluate(ctx: EvalContext, node: Node) -> DataFrame | float:
    """Instant evaluation at ``ctx.at`` → (labels, value) DataFrame, or a
    Python float for scalar expressions."""
    if isinstance(node, Num):
        return node.value

    if isinstance(node, Selector):
        if node.name is not None and node.name in ctx.native_metrics:
            if node.range_ is not None:
                raise PromQLError(
                    f"range selector {node.name}[{node.range_}] needs a "
                    "range function"
                )
            return _native_instant_vector(ctx, node)
        if node.range_ is not None:
            raise PromQLError(
                f"range selector {node.name}[{node.range_}] needs a range function"
            )
        sel = promql.instant_selector(
            _selector_stream(ctx, node), None, _at_of(ctx, node),
            staleness=ctx.staleness,
        )
        # the sample timestamp rides along (reserved name) so
        # timestamp() can read it; eval_promql strips it at the boundary
        return sel.select("labels", "value", F.col("timestamp").alias("__ts"))

    if isinstance(node, Agg):
        return _eval_agg(ctx, node)

    if isinstance(node, Call):
        return _eval_call(ctx, node)

    if isinstance(node, BinOp):
        lhs = evaluate(ctx, node.lhs)
        rhs = evaluate(ctx, node.rhs)
        if isinstance(lhs, HistVector) or isinstance(rhs, HistVector):
            # the defined histogram algebra (Prometheus 3): h*k, h/k,
            # k*h, h+h, h-h. Everything else refuses loudly — adding a
            # scalar to a histogram or comparing histograms has no rule.
            if (isinstance(lhs, HistVector) and isinstance(rhs, float)
                    and node.op in ("*", "/")):
                k = rhs if node.op == "*" else (
                    1.0 / rhs if rhs != 0 else float("inf"))
                return _hist_scalar_scale(lhs, k)
            if (isinstance(rhs, HistVector) and isinstance(lhs, float)
                    and node.op == "*"):
                return _hist_scalar_scale(rhs, lhs)
            if (isinstance(lhs, HistVector) and isinstance(rhs, HistVector)
                    and node.op in ("+", "-")):
                if node.carry:
                    # label-carry modifiers stay out of scope, the
                    # histogram × vector scaling rule
                    raise PromQLError(
                        "histogram +/- group modifiers do not support "
                        "label carry (group_left(lbl, ...))")
                return _hist_hist_addsub(
                    lhs, rhs, node.op,
                    on=node.on, ignoring=node.ignoring,
                    group=node.group)
            # histogram × FLOAT VECTOR (h*v, v*h, h/v): matched
            # scaling — the normalize-by-gauge pattern; v/h undefined
            if (isinstance(lhs, HistVector) and isinstance(rhs, DataFrame)
                    and node.op in ("*", "/")):
                return _hist_vector_scale(
                    lhs, rhs, node.op, node, hist_is_lhs=True)
            if (isinstance(rhs, HistVector) and isinstance(lhs, DataFrame)
                    and node.op == "*"):
                return _hist_vector_scale(
                    rhs, lhs, node.op, node, hist_is_lhs=False)
            raise PromQLError(
                f"binary {node.op} over native-histogram vectors is "
                "undefined — supported: h*scalar, h/scalar, scalar*h, "
                "h+h, h-h; collapse with histogram_quantile/"
                "histogram_fraction/histogram_count/histogram_sum for "
                "anything else")
        if node.op in _SET_OPS:
            # must precede the scalar branches: `m and 2` is a type error,
            # not scalar arithmetic (and so is `m or scalar(v)`)
            if not (isinstance(lhs, DataFrame) and isinstance(rhs, DataFrame)):
                raise PromQLError(f"{node.op} requires vector operands")
            if node.group:
                raise PromQLError(f"group_{node.group} is invalid with {node.op}")
            return promql.vector_setop(
                lhs, rhs, node.op, on=node.on, ignoring=node.ignoring or ()
            )
        if isinstance(lhs, float) and isinstance(rhs, float):
            return _scalar_scalar(node, lhs, rhs)
        if isinstance(lhs, ScalarStream) or isinstance(rhs, ScalarStream):
            # lazy scalar() operand(s): scalar∘scalar stays a 1-row lazy
            # scalar; vector∘scalar broadcasts the row onto the vector
            if isinstance(lhs, DataFrame):
                return _stream_scalar_stream(lhs, node, rhs, flipped=False)
            if isinstance(rhs, DataFrame):
                return _stream_scalar_stream(rhs, node, lhs, flipped=True)
            return _scalar_stream_binop(node, lhs, rhs)
        if isinstance(rhs, float):
            return _scalar_binop_stream(lhs, node, rhs, flipped=False)
        if isinstance(lhs, float):
            return _scalar_binop_stream(rhs, node, lhs, flipped=True)
        if node.op in _CMP_OPS:
            raise PromQLError("vector-vector comparisons are unsupported")
        return promql.vector_binop(
            lhs,
            rhs,
            node.op,
            on=node.on,
            ignoring=node.ignoring or (),
            group=node.group,
            carry=node.carry or (),
        )

    raise PromQLError(f"cannot evaluate {type(node).__name__}")


def _scalar_scalar(node: BinOp, a: float, b: float) -> float:
    # IEEE-754 semantics via numpy (x/0 → ±Inf, 0/0 → NaN, 1000^2000 →
    # +Inf, fmod keeps the dividend's sign) — Python's operators raise
    # where PromQL/Go return Inf/NaN, and a dict literal would evaluate
    # every operator eagerly
    import numpy as np

    fa, fb = np.float64(a), np.float64(b)
    with np.errstate(all="ignore"):
        ops = {
            "+": lambda: fa + fb, "-": lambda: fa - fb, "*": lambda: fa * fb,
            "/": lambda: fa / fb, "%": lambda: np.fmod(fa, fb),
            "^": lambda: np.power(fa, fb),
            "atan2": lambda: np.arctan2(fa, fb),
        }
        if node.op in ops:
            return float(ops[node.op]())
    cmp = {"==": a == b, "!=": a != b, ">": a > b, ">=": a >= b,
           "<": a < b, "<=": a <= b}[node.op]
    if node.bool_mod:
        return 1.0 if cmp else 0.0
    raise PromQLError("scalar comparison without bool is unsupported")


def _vec_arg(ctx: EvalContext, node: "Node | str", fn: str) -> DataFrame:
    """Evaluate a function argument that must be an instant vector —
    ``abs(time())`` should be a typed PromQLError, not an AttributeError
    on a float."""
    if isinstance(node, str):
        raise PromQLError(f"{fn} needs a vector argument, got a string")
    v = evaluate(ctx, node)
    if isinstance(v, HistVector):
        raise PromQLError(
            f"{fn} is not defined over native-histogram vectors")
    if not isinstance(v, DataFrame):
        raise PromQLError(f"{fn} needs a vector argument, got a scalar")
    return v


def _vec_or_hist_arg(
    ctx: EvalContext, node: "Node | str", fn: str
) -> "DataFrame | HistVector":
    """Like ``_vec_arg`` but a native-histogram vector is also legal —
    for the functions with both a classic (le-bucket float vector) and
    a native form."""
    if isinstance(node, str):
        raise PromQLError(f"{fn} needs a vector argument, got a string")
    v = evaluate(ctx, node)
    if not isinstance(v, (DataFrame, HistVector)):
        raise PromQLError(f"{fn} needs a vector argument, got a scalar")
    return v


def _const(ctx: EvalContext, node: "Node | str") -> float:
    """Fold a constant parameter (handles unary minus: -2 parses as 0-2)."""
    v = evaluate(ctx, node) if not isinstance(node, str) else node
    if not isinstance(v, float):
        raise PromQLError("expected a scalar constant parameter")
    return v


def _eval_agg(ctx: EvalContext, node: Agg) -> DataFrame:
    if node.op in ("topk", "bottomk"):
        k = int(_const(ctx, node.param))
        vec = _vec_arg(ctx, node.expr, node.op)
        return promql.topk(vec, k, ascending=node.op == "bottomk")
    if node.op == "limitk":
        vec = _vec_arg(ctx, node.expr, node.op)
        return promql.limitk(vec, int(_const(ctx, node.param)))
    if node.op == "limit_ratio":
        vec = _vec_arg(ctx, node.expr, node.op)
        return promql.limit_ratio(vec, float(_const(ctx, node.param)))
    if node.op == "count_values":
        vec = _vec_arg(ctx, node.expr, node.op)
        return promql.count_values(vec, str(node.param))

    vec = evaluate(ctx, node.expr)
    if isinstance(vec, HistVector):
        return _native_agg(ctx, node, vec)
    if not isinstance(vec, DataFrame):
        raise PromQLError(f"{node.op} needs a vector argument")
    aggs = {
        "sum": F.sum("value"), "avg": F.avg("value"), "max": F.max("value"),
        "min": F.min("value"), "count": F.count(F.lit(1)).cast("double"),
        "stddev": F.stddev_pop("value"), "stdvar": F.var_pop("value"),
        "group": F.lit(1.0),
    }
    if node.op == "quantile":
        agg = F.percentile("value", _const(ctx, node.param))
    else:
        agg = aggs[node.op]
    by, without = node.by, node.without
    if by is None and without is None:
        by = []
    return promql.group_by_labels(vec, agg, by=by, without=without)


# (min, max) argument counts for the fixed-arity functions — checked up
# front so a short arg list raises PromQLError instead of escaping as a
# bare IndexError/ValueError from a tuple unpack deep in a branch
_ARITY = {
    "histogram_quantile": (2, 2),
    "histogram_fraction": (3, 3),
    "histogram_count": (1, 1),
    "histogram_sum": (1, 1),
    "histogram_avg": (1, 1),
    "histogram_stddev": (1, 1),
    "histogram_stdvar": (1, 1),
    "info": (1, 2),
    "label_replace": (5, 5),
    "label_join": (3, None),  # sep + dst + vector; src labels may be empty
    "clamp": (3, 3),
    "clamp_min": (2, 2),
    "clamp_max": (2, 2),
    "round": (1, 2),
    "predict_linear": (2, 2),
    "quantile_over_time": (2, 2),
    "double_exponential_smoothing": (3, 3),
    "holt_winters": (3, 3),
}


def _eval_call(ctx: EvalContext, node: Call) -> DataFrame:
    fn = node.fn
    spec = _ARITY.get(fn)
    if spec is not None:
        lo_n, hi_n = spec
        if len(node.args) < lo_n or (hi_n is not None and len(node.args) > hi_n):
            want = str(lo_n) if hi_n == lo_n else f"{lo_n}+" if hi_n is None else f"{lo_n}-{hi_n}"
            raise PromQLError(
                f"{fn} takes {want} argument(s), got {len(node.args)}"
            )

    if fn in _OVER_TIME or fn == "quantile_over_time":
        arg = node.args[-1]
        if (isinstance(arg, Selector) and arg.name is not None
                and arg.name in ctx.native_metrics):
            # r11: *_over_time over a NATIVE metric routes to the
            # histogram forms (sum/avg/count/last/first/present/
            # absent_over_time; the rest refuse loudly) — before, the
            # scalar stream silently matched nothing, so
            # absent_over_time(h[5m]) reported a live metric absent
            if not arg.range_ or arg.step:
                raise PromQLError(
                    f"{fn} over native-histogram metric {arg.name!r} "
                    "needs a plain range selector like h[5m]")
            return _native_over_time(ctx, fn, arg)
        if isinstance(arg, Selector) and arg.range_ and not arg.step:
            # RANGE-VECTOR form (x[1h], no step): aggregate the raw
            # samples in the window — Prometheus's common spelling; the
            # subquery form below step-aligns first
            lo, hi = _frame_bounds(_at_of(ctx, arg), arg.range_)
            raw = _selector_stream(
                ctx, Selector(arg.name, arg.matchers, offset=arg.offset)
            )
            if fn == "mad_over_time":
                # two-phase (medians don't nest) — not a single aggregate
                return promql.raw_mad_over_time(raw, frame_start=lo, frame_end=hi)
            if fn != "quantile_over_time" and fn not in _RAW_OVER_TIME:
                raise PromQLError(f"{fn} has no raw range-vector form")
            agg = (
                F.percentile("value", _const(ctx, node.args[0]))
                if fn == "quantile_over_time"
                else _RAW_OVER_TIME[fn]()
            )
            return promql.raw_agg_over_time(raw, agg, frame_start=lo, frame_end=hi)
        inner, rng, step = _subquery_parts(arg)
        # the frame rides the context and clips inside _selector_stream,
        # AFTER any offset shift (clipping raw ts first would make
        # `m[1h:1m] offset 2h` read the un-offset hour)
        frame_ctx = EvalContext(
            ctx.samples, ctx.at, ctx.staleness,
            frame=_frame_bounds(_at_of(ctx, arg), rng),
            frame_right_closed=False,  # _frame duality: [lo, hi) like x[1h]
            range_bounds=ctx.range_bounds,
        )
        stream = _eval_stream(frame_ctx, inner, step)
        if fn == "quantile_over_time":
            return promql.quantile_over_time(stream, _const(ctx, node.args[0]))
        return _OVER_TIME[fn](stream)

    if fn in _RANGE_FNS:
        sel = node.args[0]
        if (
            isinstance(sel, Selector)
            and sel.name is not None
            and sel.name in ctx.native_metrics
        ):
            if sel.range_ is None or sel.step:
                raise PromQLError(
                    f"{fn} over native-histogram metric {sel.name!r} "
                    "needs a plain range selector like h[5m]")
            return _native_range_fn(ctx, fn, sel)
        if (isinstance(sel, Selector) and sel.range_ is not None and sel.step) or (
            isinstance(sel, Call) and sel.fn == "__subquery__"
        ):
            # SUBQUERY form rate(x[30m:1m]) — Prometheus evaluates the
            # inner expr at every step inside the frame, then applies
            # the range function to the step-aligned points. Reuse the
            # *_over_time subquery stream (same step alignment and
            # half-open frame) with bucket_start as the sample time.
            inner, rng, step = _subquery_parts(sel)
            lo, hi = _frame_bounds(_at_of(ctx, sel), rng)
            frame_ctx = EvalContext(
                ctx.samples, ctx.at, ctx.staleness,
                frame=(lo, hi),
                frame_right_closed=False,
                range_bounds=ctx.range_bounds,
            )
            stream = _eval_stream(frame_ctx, inner, step).select(
                "labels", F.col("bucket_start").alias("timestamp"), "value"
            )
        elif isinstance(sel, Selector) and sel.range_ is not None:
            lo, hi = _frame_bounds(_at_of(ctx, sel), sel.range_)
            stream = _selector_stream(
                ctx, Selector(sel.name, sel.matchers, offset=sel.offset)
            )
        else:
            raise PromQLError(
                f"{fn} needs a range selector like x[5m] or a subquery x[30m:1m]"
            )
        if fn == "rate":
            return promql.rate(stream, frame_start=lo, frame_end=hi)
        if fn == "increase":
            return promql.increase(stream, frame_start=lo, frame_end=hi)
        if fn == "delta":
            return promql.delta(stream, frame_start=lo, frame_end=hi)
        if fn == "deriv":
            return promql.deriv(stream, frame_start=lo, frame_end=hi)
        if fn == "changes":
            return promql.changes(stream, frame_start=lo, frame_end=hi)
        if fn == "resets":
            return promql.resets(stream, frame_start=lo, frame_end=hi)
        if fn == "irate":
            return promql.irate(stream, frame_start=lo, frame_end=hi)
        if fn == "idelta":
            return promql.idelta(stream, frame_start=lo, frame_end=hi)
        if fn in ("double_exponential_smoothing", "holt_winters"):
            if len(node.args) != 3:
                raise PromQLError(f"{fn} takes (range-vector, sf, tf)")
            sf_ = _const(ctx, node.args[1])
            tf_ = _const(ctx, node.args[2])
            if not (0 < sf_ < 1 and 0 < tf_ < 1):
                raise PromQLError(f"{fn} factors must be in (0, 1)")
            return promql.double_exponential_smoothing(
                stream, sf_, tf_, frame_start=lo, frame_end=hi
            )
        horizon = _const(ctx, node.args[1])
        return promql.predict_linear(stream, horizon, frame_start=lo, frame_end=hi)

    if fn == "histogram_quantile":
        v = _vec_or_hist_arg(ctx, node.args[1], fn)
        if isinstance(v, HistVector):
            from prom_etl_db_spark.operators import native_hist as NH

            q = _const(ctx, node.args[0])
            df = v.df
            if "custom_values" in df.columns:
                # NHCB rows (schema −53) take the CLASSIC linear rule
                # via the le-mapping (their quantile is not the
                # exponential estimator — the native evaluator refuses
                # them by design); exponential rows keep the native
                # walk. Split → evaluate each family with its rule →
                # union. Both legs emit (labels, value).
                exp = df.where(F.col("schema") != F.lit(-53))
                nq = NH.native_hist_quantile(exp, q).select(
                    "labels", F.col("quantile_value").alias("value"))
                ble = NH.nhcb_to_le_buckets(
                    df.where(F.col("schema") == F.lit(-53)))
                buckets = ble.select(
                    F.map_concat(
                        F.col("labels"),
                        F.create_map(F.lit("le"), F.col("le_cum.le")),
                    ).alias("labels"),
                    F.col("le_cum.cum").alias("value"),
                )
                cq = promql.histogram_quantile(buckets, q)
                res = nq.unionByName(cq)
            else:
                res = NH.native_hist_quantile(df, q).select(
                    "labels", F.col("quantile_value").alias("value"))
            # MIXED family (r11): classic le-bucket series stored
            # under the SAME metric name evaluate with the classic
            # rule and union in — the migration-in-progress fleet
            classic = mixed_classic_leg(ctx, node.args[1])
            if classic is not None:
                res = res.unionByName(
                    promql.histogram_quantile(classic, q))
            return res
        return promql.histogram_quantile(v, _const(ctx, node.args[0]))
    if fn == "histogram_fraction":
        if len(node.args) != 3:
            raise PromQLError("histogram_fraction(lo, hi, vector)")
        v = _vec_or_hist_arg(ctx, node.args[2], fn)
        if isinstance(v, HistVector):
            from prom_etl_db_spark.operators import native_hist as NH

            flo = _const(ctx, node.args[0])
            fhi = _const(ctx, node.args[1])
            df = v.df
            if "custom_values" in df.columns:
                # same per-family split as histogram_quantile (r10):
                # NHCB rows take the classic linear CDF via the
                # le-mapping, exponential rows the native clamp-sum
                exp = df.where(F.col("schema") != F.lit(-53))
                nf = NH.native_hist_fraction(exp, flo, fhi).select(
                    "labels", F.col("fraction_value").alias("value"))
                ble = NH.nhcb_to_le_buckets(
                    df.where(F.col("schema") == F.lit(-53)))
                buckets = ble.select(
                    F.map_concat(
                        F.col("labels"),
                        F.create_map(F.lit("le"), F.col("le_cum.le")),
                    ).alias("labels"),
                    F.col("le_cum.cum").alias("value"),
                )
                cf = promql.histogram_fraction(buckets, flo, fhi)
                res = nf.unionByName(cf)
            else:
                res = NH.native_hist_fraction(df, flo, fhi).select(
                    "labels", F.col("fraction_value").alias("value"))
            # MIXED family (r11) — same split as histogram_quantile
            classic = mixed_classic_leg(ctx, node.args[2])
            if classic is not None:
                res = res.unionByName(
                    promql.histogram_fraction(classic, flo, fhi))
            return res
        return promql.histogram_fraction(
            v, _const(ctx, node.args[0]), _const(ctx, node.args[1])
        )
    if fn in ("histogram_count", "histogram_sum", "histogram_avg"):
        v = _vec_or_hist_arg(ctx, node.args[0], fn)
        if not isinstance(v, HistVector):
            raise PromQLError(
                f"{fn} needs a native-histogram vector argument")
        col = {
            "histogram_count": F.col("count").cast("double"),
            "histogram_sum": F.col("sum"),
            "histogram_avg": F.try_divide(
                F.col("sum"), F.col("count").cast("double")),
        }[fn]
        return v.df.select("labels", col.alias("value"))
    if fn in ("histogram_stddev", "histogram_stdvar"):
        v = _vec_or_hist_arg(ctx, node.args[0], fn)
        if not isinstance(v, HistVector):
            raise PromQLError(
                f"{fn} needs a native-histogram vector argument")
        from prom_etl_db_spark.operators import native_hist as NH

        stats = NH.histogram_stats(v.df)
        col = ("hist_stddev" if fn == "histogram_stddev"
               else "hist_stdvar")
        return stats.select("labels", F.col(col).alias("value"))
    if fn == "info":
        # Prometheus 3 experimental info(): enrich each sample's
        # labels with the DATA labels of the info series (default
        # target_info) sharing its identifying labels (instance, job)
        # — promql.info_enrich string-routed (r11). The optional
        # second argument is the data-label selector: a brace-only
        # matcher set; {__name__="build_info"} picks the info metric,
        # any other matcher both NAMES a data label to copy and
        # CONSTRAINS its value (non-matching labels simply don't
        # copy, Prometheus's rule).
        vec = _vec_arg(ctx, node.args[0], fn)
        info_name = "target_info"
        data_matchers: list = []
        if len(node.args) == 2:
            dls = node.args[1]
            if (not isinstance(dls, Selector) or dls.range_
                    or dls.name is not None):
                raise PromQLError(
                    "info() data-label selector must be a brace-only "
                    'matcher set like {k8s_cluster_name=~".+"}')
            for lbl, mop, val in dls.matchers:
                if lbl == "__name__":
                    if mop != "=":
                        raise PromQLError(
                            "info(): the __name__ matcher must be an "
                            "equality (it picks the info metric)")
                    info_name = val
                else:
                    data_matchers.append((lbl, mop, val))
        info_vec = evaluate(ctx, Selector(info_name, []))
        if not isinstance(info_vec, DataFrame):
            raise PromQLError("info(): info metric is not a vector")
        if data_matchers:
            names = [lbl for lbl, _, _ in data_matchers]

            def _entry_ok(k, v):
                keep = F.lit(False)
                for lbl, mop, val in data_matchers:
                    if mop == "=":
                        p = v == F.lit(val)
                    elif mop == "!=":
                        p = v != F.lit(val)
                    elif mop == "=~":
                        p = v.rlike(f"^(?:{val})$")
                    else:
                        p = ~v.rlike(f"^(?:{val})$")
                    keep = keep | ((k == F.lit(lbl)) & p)
                # identifying labels always survive for the join
                return keep | k.isin("instance", "job")

            info_vec = info_vec.withColumn(
                "labels", F.map_filter(F.col("labels"), _entry_ok))
            return promql.info_enrich(
                vec, info_vec, data_labels=names)
        return promql.info_enrich(vec, info_vec)
    if fn == "label_replace":
        vec = _vec_arg(ctx, node.args[0], fn)
        dst, repl, src, regex = (str(a) for a in node.args[1:5])
        return promql.label_replace(vec, dst, repl, src, regex)
    if fn == "label_join":
        vec = _vec_arg(ctx, node.args[0], fn)
        dst, sep = str(node.args[1]), str(node.args[2])
        srcs = [str(a) for a in node.args[3:]]
        return promql.label_join(vec, dst, sep, srcs)
    if fn == "clamp":
        vec = _vec_arg(ctx, node.args[0], fn)
        return promql.clamp(vec, _const(ctx, node.args[1]), _const(ctx, node.args[2]))
    if fn == "clamp_min":
        return promql.clamp_min(_vec_arg(ctx, node.args[0], fn), _const(ctx, node.args[1]))
    if fn == "clamp_max":
        return promql.clamp_max(_vec_arg(ctx, node.args[0], fn), _const(ctx, node.args[1]))
    if fn == "absent":
        # r11: absent() is defined over native-histogram vectors too
        # (alerting on a histogram that stopped being scraped) — it
        # only counts rows, so the HistVector's frame serves directly
        v = _vec_or_hist_arg(ctx, node.args[0], fn)
        return promql.absent(v.df if isinstance(v, HistVector) else v)
    if fn == "round":
        # PromQL round(v, to_nearest=1): nearest MULTIPLE of to_nearest,
        # ties rounding up — floor(v/to + 0.5) * to, not decimal places
        vec = _vec_arg(ctx, node.args[0], fn)
        to = _const(ctx, node.args[1]) if len(node.args) > 1 else 1.0
        if to <= 0:
            raise PromQLError("round() to_nearest must be positive")
        v = F.col("value")
        rounded = F.floor(v / F.lit(to) + F.lit(0.5)) * F.lit(to)
        # F.floor returns BIGINT: NaN would become 0 and huge QUOTIENTS
        # would saturate at 2^63 — the overflowing quantity is v/to (a
        # small to_nearest overflows ordinary values), so that is what
        # the guard must bound. Pass such values through: when |v/to| has
        # an ulp above 1, v IS its own nearest multiple of to.
        passthrough = F.isnan(v) | (F.abs(v / F.lit(to)) >= F.lit(2.0**62))
        return vec.withColumn(
            "value", F.when(passthrough, v).otherwise(rounded.cast("double"))
        )
    if fn in ("sort", "sort_desc"):
        # presentation-order only in PromQL; here a real ORDER BY with the
        # series key as tiebreaker so output order is deterministic
        vec = _vec_arg(ctx, node.args[0], fn)
        order = F.asc("value") if fn == "sort" else F.desc("value")
        return vec.orderBy(order, F.asc(F.array_sort(F.map_entries("labels"))))
    if fn in ("sort_by_label", "sort_by_label_desc"):
        # experimental PromQL: order by label VALUES (missing label = "",
        # like matchers), value+series as deterministic tiebreakers
        vec = _vec_arg(ctx, node.args[0], fn)
        labels = node.args[1:]
        if not labels or not all(isinstance(a, str) for a in labels):
            raise PromQLError(f"{fn} needs string label arguments")
        cols = [
            F.coalesce(F.element_at(F.col("labels"), lbl), F.lit(""))
            for lbl in labels
        ]
        cols = [c.asc() if fn == "sort_by_label" else c.desc() for c in cols]
        return vec.orderBy(
            *cols, F.asc("value"), F.asc(F.array_sort(F.map_entries("labels")))
        )
    if fn == "time":
        return float(ctx.at.timestamp())
    if fn == "pi":
        if node.args:
            raise PromQLError("pi() takes no arguments")
        import math

        return math.pi
    if fn == "scalar":
        # scalar(v): the single element of a 1-element vector, else NaN —
        # kept LAZY as a 1-row aggregate frame (ScalarStream) so no
        # driver action happens mid-plan; binops broadcast it
        vec = _vec_arg(ctx, node.args[0], fn)
        one = vec.agg(
            F.when(F.count(F.lit(1)) == 1, F.min("value"))
            .otherwise(F.lit(float("nan")))
            .cast("double")
            .alias("value")
        )
        return ScalarStream(one)
    if fn == "vector":
        # scalar → one-row label-less vector (PromQL vector(s))
        if len(node.args) != 1:
            raise PromQLError("vector() takes exactly one scalar argument")
        arg = node.args[0]
        v = evaluate(ctx, arg) if not isinstance(arg, str) else arg
        if isinstance(v, ScalarStream):
            # vector(scalar(x)): re-label the lazy 1-row scalar in place
            return v.df.select(
                F.create_map().cast("map<string,string>").alias("labels"),
                F.col("value").cast("double").alias("value"),
            )
        if not isinstance(v, float):
            raise PromQLError("vector() takes exactly one scalar argument")
        if ctx.samples is None:
            raise PromQLError("vector() needs a session (no samples bound)")
        return ctx.samples.sparkSession.createDataFrame(
            [(v,)], "value double"
        ).select(
            F.create_map().cast("map<string,string>").alias("labels"), "value"
        )
    if fn == "timestamp":
        arg = node.args[0]
        if not isinstance(arg, Selector) or arg.range_ is not None:
            # computed vectors may still CARRY a ride-along __ts column,
            # but PromQL's timestamp() over them means the eval time, not
            # the source sample's — be explicit rather than wrong
            raise PromQLError("timestamp() needs a plain instant selector")
        vec = _vec_arg(ctx, arg, fn)
        return vec.select(
            "labels", epoch_seconds(F.col("__ts")).alias("value")
        )
    if fn == "absent_over_time":
        arg = node.args[0]
        if not isinstance(arg, Selector) or not arg.range_ or arg.step:
            raise PromQLError("absent_over_time needs a range selector")
        if arg.name is not None and arg.name in ctx.native_metrics:
            # r11: count the NATIVE samples — the scalar stream
            # matching nothing reported a live histogram absent
            return _native_over_time(ctx, fn, arg)
        lo, hi = _frame_bounds(_at_of(ctx, arg), arg.range_)
        raw = _selector_stream(
            ctx, Selector(arg.name, arg.matchers, offset=arg.offset)
        ).where((F.col("timestamp") >= F.lit(lo)) & (F.col("timestamp") < F.lit(hi)))
        # half-open like _frame: absent must be the exact dual of
        # present/count_over_time on the same window
        return promql.absent(raw)
    if fn in _TIME_COMPONENT_FNS:
        if not node.args:
            # no-arg form = component of vector(time()): derive from the
            # SAME epoch time() returns, read as UTC — component-of-naive
            # ctx.at would disagree with the vector path off-UTC hosts
            from datetime import timezone

            utc_at = datetime.fromtimestamp(ctx.at.timestamp(), tz=timezone.utc)
            return float(_TIME_COMPONENT_FNS[fn][1](utc_at))
        vec = _vec_arg(ctx, node.args[0], fn)
        col_fn = _TIME_COMPONENT_FNS[fn][0]
        # PromQL components are UTC, but Spark's extractors read the
        # session-timezone wall clock — shift the instant by the session
        # offset so the rendered wall clock IS the UTC one
        ts = F.to_utc_timestamp(
            F.timestamp_seconds(F.col("value")), F.current_timezone()
        )
        return vec.select("labels", col_fn(ts).cast("double").alias("value"))
    if fn in _MATH_FNS:
        vec = _vec_arg(ctx, node.args[0], fn)
        return vec.withColumn("value", _MATH_FNS[fn](F.col("value")).cast("double"))

    raise PromQLError(f"unsupported function {fn!r}")


def eval_promql(
    samples: DataFrame,
    query: str,
    at: datetime,
    *,
    staleness: str = "5 minutes",
    native_hists: "DataFrame | None" = None,
    native_metrics: "frozenset | None" = None,
) -> DataFrame | float:
    """Parse and evaluate ``query`` against a stored-samples DataFrame at
    the frozen instant ``at``. Returns (labels, value) — or a float for
    literal scalar expressions. A scalar expression that needs DATA (a
    top-level ``scalar()``) stays lazy and comes back as a 1-row
    ``(value)`` DataFrame instead: collapsing it to a Python float would
    force a driver action inside what should be a pure plan builder.

    ``native_hists`` (r10) makes NATIVE-HISTOGRAM series reachable from
    query strings: the wire decoders' dense frame (metric_name, labels,
    ts, schema, zero_threshold, zero_count, count, sum,
    pos_offset/pos_counts, neg_offset/neg_counts). Selectors whose name
    lives there route to the gated native combinators —
    ``histogram_quantile(0.9, sum by (job) (rate(h[5m])))`` lowers onto
    native_hist_increase → native_hist_rate → native_hist_sum_by →
    native_hist_quantile. ``native_metrics`` (the routing set) defaults
    to the frame's distinct metric names — ONE tiny driver collect,
    broadcast-class (metric-name cardinality, not series); pass it
    explicitly to keep plan building collect-free."""
    nset = frozenset()
    if native_hists is not None:
        if native_metrics is not None:
            nset = frozenset(native_metrics)
        else:
            nset = frozenset(
                r[0] for r in
                native_hists.select("metric_name").distinct().collect()
                if r[0] is not None
            )
    out = evaluate(
        EvalContext(
            samples, at, staleness,
            native_hists=native_hists, native_metrics=nset,
        ),
        parse(query),
    )
    if isinstance(out, HistVector):
        raise PromQLError(
            "query returns a native-histogram vector — collapse it with "
            "histogram_quantile/histogram_fraction/histogram_count/"
            "histogram_sum/histogram_avg")
    if isinstance(out, ScalarStream):
        return out.df.select(F.col("value").cast("double").alias("value"))
    if isinstance(out, DataFrame) and "__ts" in out.columns:
        # the ride-along sample timestamp is internal (timestamp() reads
        # it); the public contract is (labels, value)
        out = out.drop("__ts")
    return out
