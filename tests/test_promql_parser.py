"""PromQL string parser + evaluator (operators/promql_parser.py).

Parse-structure tests are pure Python; evaluation tests run tiny sample
fixtures where every expected value is computable by eye. The flagship
string's end-to-end value correctness is oracle-gated in the registry
(promql_parsed_flagship)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from prom_etl_db_spark.operators.promql_parser import (
    Agg,
    BinOp,
    Call,
    EvalContext,
    Num,
    PromQLError,
    Selector,
    eval_promql,
    evaluate,
    parse,
)
from prom_etl_db_spark.schema import METRICS_SCHEMA

T0 = datetime(2024, 3, 15, 12, 0, 0)


def _samples(spark, rows):
    """rows: (metric, labels, value, ts_offset_seconds)"""
    data = [
        ("q", m, labels, float(v), T0 + timedelta(seconds=off), "instant", T0)
        for m, labels, v, off in rows
    ]
    return spark.createDataFrame(data, METRICS_SCHEMA)


# -- parsing ---------------------------------------------------------------


def test_parse_selector_matchers_range_offset():
    n = parse('http_requests{job="api", code!="500", path=~"/v1/.*"}[5m] offset 1h')
    assert isinstance(n, Selector)
    assert n.name == "http_requests"
    assert n.matchers == [
        ("job", "=", "api"), ("code", "!=", "500"), ("path", "=~", "/v1/.*"),
    ]
    assert n.range_ == "5m" and n.step is None and n.offset == "1h"


def test_parse_recording_rule_names_keep_colons():
    n = parse("job:http_inprogress:sum")
    assert isinstance(n, Selector) and n.name == "job:http_inprogress:sum"


def test_parse_agg_prefix_and_postfix_grouping_equal():
    a = parse("sum by (k) (x)")
    b = parse("sum(x) by (k)")
    assert isinstance(a, Agg) and isinstance(b, Agg)
    assert a.by == b.by == ["k"] and a.op == b.op == "sum"


def test_parse_precedence_arithmetic_before_comparison():
    n = parse("a + b * c > 4")
    assert isinstance(n, BinOp) and n.op == ">"
    assert isinstance(n.lhs, BinOp) and n.lhs.op == "+"
    assert isinstance(n.lhs.rhs, BinOp) and n.lhs.rhs.op == "*"


def test_parse_subquery_over_expression():
    n = parse("max without(u)(x != bool 20)[24h:1m]")
    assert isinstance(n, Call) and n.fn == "__subquery__"
    assert n.args[1:] == ["24h", "1m"]
    assert isinstance(n.args[0], Agg) and n.args[0].without == ["u"]


def test_parse_errors_are_loud():
    for bad in ("sum(", "x[5m", "x{k=}", "x offset", "1 +"):
        with pytest.raises(PromQLError):
            parse(bad)


# -- evaluation ------------------------------------------------------------


def test_eval_instant_selector_with_matchers(spark):
    df = _samples(
        spark,
        [
            ("m", {"h": "a"}, 1, -60),
            ("m", {"h": "a"}, 3, -30),   # latest for h=a
            ("m", {"h": "b"}, 9, -30),
            ("other", {"h": "a"}, 7, -30),
        ],
    )
    out = eval_promql(df, 'm{h="a"}', T0)
    assert [r["value"] for r in out.collect()] == [3.0]


def test_eval_scalar_expression_folds_to_float():
    assert eval_promql(None, "2 * 3 + 4", T0) == 10.0
    assert eval_promql(None, "2 ^ 3 ^ 2", T0) == 512.0  # right-assoc


def test_eval_agg_and_arith(spark):
    df = _samples(
        spark,
        [("m", {"k": "x", "u": "1"}, 2, -10), ("m", {"k": "x", "u": "2"}, 3, -10),
         ("m", {"k": "y", "u": "1"}, 5, -10)],
    )
    out = eval_promql(df, "sum(m) by (k) * 10", T0)
    got = {r["labels"]["k"]: r["value"] for r in out.collect()}
    assert got == {"x": 50.0, "y": 50.0}


def test_eval_comparison_filters_without_bool(spark):
    df = _samples(spark, [("m", {"h": "a"}, 2, -10), ("m", {"h": "b"}, 9, -10)])
    out = eval_promql(df, "m > 5", T0)
    assert [r["labels"]["h"] for r in out.collect()] == ["b"]
    flagged = eval_promql(df, "m > bool 5", T0)
    got = {r["labels"]["h"]: r["value"] for r in flagged.collect()}
    assert got == {"a": 0.0, "b": 1.0}


def test_eval_vector_binop_on_matching(spark):
    df = _samples(
        spark,
        [("num", {"k": "x", "side": "n"}, 10, -10),
         ("den", {"k": "x", "side": "d"}, 4, -10)],
    )
    out = eval_promql(df, "sum(num) by (k) / on(k) sum(den) by (k)", T0)
    assert out.collect()[0]["value"] == pytest.approx(2.5)


def test_eval_rate_string_matches_combinator(spark):
    from prom_etl_db_spark.operators import promql

    df = _samples(
        spark, [("c", {"h": "a"}, v, off) for v, off in [(0, -300), (60, -200), (30, -100)]]
    )
    via_string = eval_promql(df, "rate(c[10m])", T0).collect()[0]["value"]
    via_api = promql.rate(
        df, frame_start=T0 - timedelta(minutes=10), frame_end=T0
    ).collect()[0]["value"]
    assert via_string == pytest.approx(via_api)
    # reset-corrected increase 60+30=90 over 600s
    assert via_string == pytest.approx(90 / 600)


def test_eval_offset_shifts_the_read_window(spark):
    df = _samples(spark, [("m", {"h": "a"}, 5, -7200)])  # 2h ago
    assert eval_promql(df, "m", T0).count() == 0  # outside 5m staleness
    assert eval_promql(df, "m offset 2h", T0).collect()[0]["value"] == 5.0


def test_eval_math_and_clamp_functions(spark):
    df = _samples(spark, [("m", {"h": "a"}, -9, -10)])
    assert eval_promql(df, "abs(m)", T0).collect()[0]["value"] == 9.0
    assert eval_promql(df, "clamp(m, -2, 2)", T0).collect()[0]["value"] == -2.0


def test_eval_unsupported_constructs_raise(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1, -10)])
    with pytest.raises(PromQLError):
        eval_promql(df, "m[5m]", T0)  # bare range selector is not a vector
    # (m @ start() is supported now — resolves to the eval instant on an
    # instant query; see test_at_start_end_resolve_range_bounds)


# -- regressions from review findings --------------------------------------


def test_scalar_arithmetic_is_lazy_and_ieee():
    assert eval_promql(None, "1000 + 2000", T0) == 3000.0  # no eager ^ overflow
    assert eval_promql(None, "10 ^ 400", T0) == float("inf")
    assert eval_promql(None, "1 / 0", T0) == float("inf")
    import math

    assert math.isnan(eval_promql(None, "0 / 0", T0))
    assert eval_promql(None, "(0 - 5) % 3", T0) == -2.0  # fmod, not pmod


def test_unary_minus_binds_looser_than_pow():
    assert eval_promql(None, "-2 ^ 2", T0) == -4.0


def test_missing_label_is_empty_string_for_matchers(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1, -10), ("m", {"h": "b", "k": "x"}, 2, -10)])
    assert eval_promql(df, 'm{k=""}', T0).collect()[0]["value"] == 1.0
    got = {r["value"] for r in eval_promql(df, 'm{k=~".*"}', T0).collect()}
    assert got == {1.0, 2.0}  # empty-matching regex keeps label-less series
    assert eval_promql(df, 'm{k!=""}', T0).collect()[0]["value"] == 2.0


def test_vector_modulo_keeps_dividend_sign(spark):
    df = _samples(spark, [("m", {"h": "a"}, 5, -10)])
    assert eval_promql(df, "(0 - m) % 3", T0).collect()[0]["value"] == -2.0


def test_offset_inside_subquery_shifts_the_frame(spark):
    # samples 2-3h back; a 1h frame offset by 2h must read them. (Samples
    # sit strictly inside the shifted frame — one exactly at the shifted
    # frame's end would be excluded by the half-open [lo, hi) convention,
    # see test_subquery_frame_is_half_open_like_raw_range.)
    df = _samples(
        spark,
        [("m", {"h": "a"}, v, -7800 - i * 600) for i, v in enumerate([1, 2, 3])],
    )
    out = eval_promql(df, "sum_over_time(m[1h:10m] offset 2h)", T0)
    assert out.collect()[0]["value"] == 6.0
    assert eval_promql(df, "sum_over_time(m[1h:10m])", T0).count() == 0


def test_subsecond_durations_are_exact_not_truncated(spark):
    from prom_etl_db_spark.operators.promql_parser import _interval_str

    assert _interval_str("500ms") == "500 milliseconds"
    assert _interval_str("1s500ms") == "1500 milliseconds"
    assert _interval_str("2m") == "120 seconds"


def test_set_operator_precedence():
    # or < and < comparisons: "a > 1 and b or c" == ((a > 1) and b) or c
    n = parse("a > 1 and b or c")
    assert isinstance(n, BinOp) and n.op == "or"
    assert isinstance(n.lhs, BinOp) and n.lhs.op == "and"
    assert isinstance(n.lhs.lhs, BinOp) and n.lhs.lhs.op == ">"


def test_eval_set_operators(spark):
    df = _samples(
        spark,
        [("up", {"job": "api"}, 1, -10), ("up", {"job": "db"}, 1, -10),
         ("errs", {"job": "api"}, 7, -10)],
    )
    # and: up series whose (job) key also has errors
    got = [r["labels"]["job"] for r in
           eval_promql(df, "up and on(job) errs", T0).collect()]
    assert got == ["api"]
    # unless: up series with NO errors
    got = [r["labels"]["job"] for r in
           eval_promql(df, "up unless on(job) errs", T0).collect()]
    assert got == ["db"]
    # or: all up series plus err series not matching any up key
    assert eval_promql(df, "up or on(job) errs", T0).count() == 2
    only = eval_promql(df, 'up{job="db"} or on(job) errs', T0)
    vals = {(r["labels"]["job"], r["value"]) for r in only.collect()}
    assert vals == {("db", 1.0), ("api", 7.0)}  # rhs fills the missing key


def test_set_operator_rejects_scalars(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1, -10)])
    with pytest.raises(PromQLError, match="vector operands"):
        eval_promql(df, "m and 2", T0)


def test_group_left_info_metric_join(spark):
    # the canonical info-metric pattern: copy `version` onto every task
    # series of the same instance; many (tasks) x one (info)
    df = _samples(
        spark,
        [("tasks", {"instance": "i1", "task": "a"}, 10, -10),
         ("tasks", {"instance": "i1", "task": "b"}, 20, -10),
         ("info", {"instance": "i1", "version": "v7"}, 1, -10)],
    )
    out = eval_promql(df, "tasks * on(instance) group_left(version) info", T0)
    rows = {(r["labels"]["task"], r["labels"]["version"], r["value"])
            for r in out.collect()}
    assert rows == {("a", "v7", 10.0), ("b", "v7", 20.0)}


def test_group_right_operand_order(spark):
    # one (limit) op many (usage), with the many side on the RIGHT:
    # limit / on(pod) group_right usage — value must be limit/usage
    df = _samples(
        spark,
        [("limit", {"pod": "p"}, 100, -10),
         ("usage", {"pod": "p", "ctr": "c1"}, 20, -10),
         ("usage", {"pod": "p", "ctr": "c2"}, 50, -10)],
    )
    out = eval_promql(df, "limit / on(pod) group_right usage", T0)
    got = {r["labels"]["ctr"]: r["value"] for r in out.collect()}
    assert got == {"c1": 5.0, "c2": 2.0}


def test_group_left_invalid_with_set_ops(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1, -10)])
    with pytest.raises(PromQLError, match="invalid"):
        eval_promql(df, "m and on(h) group_left m", T0)


def test_set_op_inside_subquery_raises_promql_error(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1, -10)])
    with pytest.raises(PromQLError, match="subquery"):
        eval_promql(df, "sum_over_time((m and 2)[5m:1m])", T0)


def test_round_is_to_nearest_multiple_not_decimals(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1.3, -10), ("m", {"h": "b"}, 2.5, -10)])
    got = {r["labels"]["h"]: r["value"]
           for r in eval_promql(df, "round(m, 0.5)", T0).collect()}
    assert got == {"a": 1.5, "b": 2.5}
    got = {r["labels"]["h"]: r["value"]
           for r in eval_promql(df, "round(m)", T0).collect()}
    assert got == {"a": 1.0, "b": 3.0}  # ties round up, PromQL-style


def test_sgn_time_and_sort(spark):
    df = _samples(spark, [("m", {"h": "a"}, -9, -10), ("m", {"h": "b"}, 4, -10)])
    got = {r["labels"]["h"]: r["value"]
           for r in eval_promql(df, "sgn(m)", T0).collect()}
    assert got == {"a": -1.0, "b": 1.0}
    assert eval_promql(df, "time()", T0) == T0.timestamp()
    ordered = [r["value"] for r in eval_promql(df, "sort_desc(m)", T0).collect()]
    assert ordered == [4.0, -9.0]


def test_vector_functions_reject_scalar_arguments(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1, -10)])
    with pytest.raises(PromQLError, match="vector argument"):
        eval_promql(df, "abs(time())", T0)


def test_round_passes_nan_and_inf_through(spark):
    df = _samples(spark, [("m", {"h": "a"}, float("nan"), -10),
                          ("m", {"h": "b"}, float("inf"), -10)])
    got = {r["labels"]["h"]: r["value"]
           for r in eval_promql(df, "round(m)", T0).collect()}
    import math

    assert math.isnan(got["a"])  # floor's BIGINT would have made this 0
    assert got["b"] == float("inf")


def test_log_functions_follow_promql_not_sql_null(spark):
    df = _samples(spark, [("m", {"h": "zero"}, 0, -10),
                          ("m", {"h": "neg"}, -4, -10),
                          ("m", {"h": "pos"}, 8, -10)])
    got = {r["labels"]["h"]: r["value"]
           for r in eval_promql(df, "log2(m)", T0).collect()}
    import math

    assert got["zero"] == float("-inf")  # SQL NULL would vanish from aggs
    assert math.isnan(got["neg"])
    assert got["pos"] == 3.0


def test_raw_range_vector_over_time_vs_subquery_form(spark):
    # two samples within one step bucket: raw form sums both, the
    # subquery form keeps the bucket's last value only
    df = _samples(spark, [("m", {"h": "a"}, 5, -90), ("m", {"h": "a"}, 7, -80)])
    raw = eval_promql(df, "sum_over_time(m[1h])", T0).collect()[0]["value"]
    stepped = eval_promql(df, "sum_over_time(m[1h:1h])", T0).collect()[0]["value"]
    assert raw == 12.0 and stepped == 7.0


def test_subquery_frame_is_half_open_like_raw_range(spark):
    # DIVERGENCES.md: frames are half-open [t-f, t) EVERYWHERE. A sample
    # exactly at the eval instant must be excluded by BOTH the raw-range
    # form m[1h] and the subquery form m[1h:1m] (regression: the subquery
    # frame used an inclusive clip and disagreed with its raw dual).
    df = _samples(spark, [("m", {"h": "a"}, 3, -120), ("m", {"h": "a"}, 9, 0)])
    raw = eval_promql(df, "sum_over_time(m[1h])", T0).collect()[0]["value"]
    sub = eval_promql(df, "sum_over_time(m[1h:1m])", T0).collect()[0]["value"]
    assert raw == 3.0
    assert sub == 3.0


def test_changes_resets_from_query_text(spark):
    df = _samples(
        spark, [("c", {"h": "a"}, v, -600 + i * 10)
                for i, v in enumerate([1, 2, 2, 1])]
    )
    assert eval_promql(df, "changes(c[1h])", T0).collect()[0]["value"] == 2.0
    assert eval_promql(df, "resets(c[1h])", T0).collect()[0]["value"] == 1.0


def test_timestamp_and_time_components(spark):
    # sample at a known instant; value column carries an epoch too
    epoch = (T0 - timedelta(seconds=30)).timestamp()
    df = _samples(spark, [("m", {"h": "a"}, epoch, -30)])
    ts_out = eval_promql(df, "timestamp(m)", T0).collect()[0]["value"]
    assert ts_out == epoch  # the SAMPLE's own timestamp
    # component functions read the VALUE as an epoch (UTC)
    assert eval_promql(df, "hour(m)", T0).collect()[0]["value"] == float(
        (T0 - timedelta(seconds=30)).hour
    )
    # 2024-03-15 is a Friday → PromQL day_of_week 5 (0=Sunday)
    assert eval_promql(df, "day_of_week(m)", T0).collect()[0]["value"] == 5.0
    assert eval_promql(df, "days_in_month(m)", T0).collect()[0]["value"] == 31.0
    # no-arg form = component of time(), read as UTC — derive the
    # expectation the same way so the test passes on non-UTC hosts
    from datetime import timezone

    utc_t0 = datetime.fromtimestamp(T0.timestamp(), tz=timezone.utc)
    assert eval_promql(df, "hour()", T0) == float(utc_t0.hour)
    with pytest.raises(PromQLError, match="plain instant selector"):
        eval_promql(df, "timestamp(sum(m))", T0)


def test_absent_over_time(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1, -7200)])  # 2h old
    # nothing in the last hour → one {1.0} row; widen to 3h → empty
    assert eval_promql(df, "absent_over_time(m[1h])", T0).collect()[0]["value"] == 1.0
    assert eval_promql(df, "absent_over_time(m[3h])", T0).count() == 0


def test_double_exponential_smoothing_from_text(spark):
    df = _samples(
        spark, [("m", {"h": "a"}, 5 + 3 * i, -600 + i * 10) for i in range(6)]
    )
    got = eval_promql(
        df, "double_exponential_smoothing(m[1h], 0.4, 0.2)", T0
    ).collect()[0]["value"]
    assert got == pytest.approx(20.0)  # linear data → last value
    alias = eval_promql(df, "holt_winters(m[1h], 0.4, 0.2)", T0).collect()[0]["value"]
    assert alias == got


def test_smoothing_bad_args_raise_promql_error(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1, -10), ("m", {"h": "a"}, 2, -5)])
    with pytest.raises(PromQLError, match="takes"):
        eval_promql(df, "holt_winters(m[5m], 0.5)", T0)
    with pytest.raises(PromQLError, match="factors"):
        eval_promql(df, "double_exponential_smoothing(m[5m], 1.5, 0.5)", T0)


def test_at_modifier_pins_evaluation_time(spark):
    pinned = T0 - timedelta(hours=3)
    df = _samples(spark, [("m", {"h": "a"}, 42, -3 * 3600 - 30)])  # near pinned
    # at T0 the sample is hours stale → empty; @ pins the selector there
    assert eval_promql(df, "m", T0).count() == 0
    got = eval_promql(df, f"m @ {pinned.timestamp():.0f}", T0).collect()
    assert got[0]["value"] == 42.0
    # range function with @: the frame ends at the pinned instant
    cdf = _samples(
        spark, [("c", {"h": "a"}, v, -3 * 3600 - 300 + i * 100)
                for i, v in enumerate([0, 10, 30])]
    )
    r = eval_promql(cdf, f"increase(c[10m] @ {pinned.timestamp():.0f})", T0)
    assert r.collect()[0]["value"] == 30.0


def test_negative_offset_reads_forward(spark):
    df = _samples(spark, [("m", {"h": "a"}, 7, 3600 - 30)])  # 1h in the future
    assert eval_promql(df, "m", T0).count() == 0
    assert eval_promql(df, "m offset -1h", T0).collect()[0]["value"] == 7.0


def test_offset_and_at_combine_in_either_order(spark):
    a = parse("m @ 1700000000 offset 1h")
    b = parse("m offset 1h @ 1700000000")
    assert a.at_ == b.at_ == 1700000000.0
    assert a.offset == b.offset == "1h"


def test_vector_lifts_scalars(spark):
    df = _samples(spark, [("m", {"h": "a"}, 5, -10)])
    row = eval_promql(df, "vector(3 * 4)", T0).collect()[0]
    assert row["value"] == 12.0 and dict(row["labels"]) == {}
    # the lifted vector participates in binops (empty label set matches
    # on an empty on() key)
    out = eval_promql(df, "sum(m) / on() vector(2)", T0)
    assert out.collect()[0]["value"] == 2.5


def test_modifier_edge_hardening(spark):
    df = _samples(spark, [("m", {"h": "a"}, 1, -10)])
    with pytest.raises(PromQLError, match="duplicate offset"):
        parse("m offset 1h offset 2h")
    with pytest.raises(PromQLError, match="duplicate @"):
        parse("m @ 1 @ 2")
    with pytest.raises(PromQLError, match="out of range"):
        eval_promql(df, "m @ 99999999999999999", T0)
    with pytest.raises(PromQLError, match="exactly one"):
        eval_promql(df, "vector()", T0)
    # @ on the subquery's own selector pins the FRAME (supported)...
    pinned = (T0 - timedelta(hours=2)).timestamp()
    df2 = _samples(spark, [("m", {"h": "a"}, 4, -2 * 3600 - 60)])
    out = eval_promql(df2, f"sum_over_time((m @ {pinned:.0f})[1h:1m])", T0)
    assert out.collect()[0]["value"] == 4.0
    # ...but @ buried inside a COMPUTED subquery expression is refused
    # (the frame can't carry a per-selector pin there)
    with pytest.raises(PromQLError, match="subquery"):
        eval_promql(df, "sum_over_time((sum(m @ 1700000000))[1h:1m])", T0)
    # negative epochs parse (pre-1970 pins are legal PromQL)
    assert parse("m @ -100").at_ == -100.0


def test_mad_and_stdvar_over_time_both_forms(spark):
    # one series, values 1..5 in the last hour: median 3, |x-3| = [2,1,0,1,2]
    # -> MAD 1; var_pop = 2.0
    df = _samples(
        spark, [("m", {"k": "a"}, v, -60 * (6 - v)) for v in (1, 2, 3, 4, 5)]
    )
    assert eval_promql(df, "mad_over_time(m[1h])", T0).collect()[0]["value"] == 1.0
    assert (
        eval_promql(df, "mad_over_time(m[1h:1m])", T0).collect()[0]["value"] == 1.0
    )
    assert (
        eval_promql(df, "stdvar_over_time(m[1h])", T0).collect()[0]["value"] == 2.0
    )
    assert (
        eval_promql(df, "stdvar_over_time(m[1h:1m])", T0).collect()[0]["value"]
        == 2.0
    )


def test_limitk_and_limit_ratio(spark):
    df = _samples(
        spark, [("m", {"k": str(i)}, float(i), -60) for i in range(10)]
    )
    # limitk: deterministic k series (smallest canonical series keys:
    # k="0" and k="1" sort first)
    out = eval_promql(df, "limitk(2, m)", T0).collect()
    assert sorted(r["labels"]["k"] for r in out) == ["0", "1"]
    # limit_ratio partitions: r and -(1-r) together cover every series
    keep = eval_promql(df, "limit_ratio(0.3, m)", T0).collect()
    rest = eval_promql(df, "limit_ratio(-0.7, m)", T0).collect()
    assert len(keep) + len(rest) == 10
    assert {r["labels"]["k"] for r in keep}.isdisjoint(
        {r["labels"]["k"] for r in rest}
    )
    # determinism: same ratio, same series
    again = eval_promql(df, "limit_ratio(0.3, m)", T0).collect()
    assert {r["labels"]["k"] for r in again} == {r["labels"]["k"] for r in keep}


def test_at_start_end_resolve_range_bounds(spark):
    from prom_etl_db_spark.operators.promql_parser import EvalContext, evaluate, parse

    # samples at T0-2h (value 5) and T0-30s (value 9)
    df = _samples(
        spark,
        [("m", {"k": "a"}, 5.0, -7200), ("m", {"k": "a"}, 9.0, -30)],
    )
    ctx = EvalContext(
        df, T0, range_bounds=(T0 - timedelta(hours=2), T0)
    )
    # @ start(): instant read at T0-2h sees the old sample
    got = evaluate(ctx, parse("m @ start()")).collect()[0]["value"]
    assert got == 5.0
    # @ end(): reads at T0 -> the fresh sample
    assert evaluate(ctx, parse("m @ end()")).collect()[0]["value"] == 9.0
    # instant query (no range_bounds): both collapse to the eval instant
    ctx2 = EvalContext(df, T0)
    assert evaluate(ctx2, parse("m @ start()")).collect()[0]["value"] == 9.0


def test_at_start_requires_parens():
    from prom_etl_db_spark.operators.promql_parser import PromQLError, parse

    with pytest.raises(PromQLError):
        parse("m @ start")


def test_sort_by_label_orders_output(spark):
    df = _samples(
        spark,
        [
            ("m", {"env": "prod", "k": "2"}, 1.0, -30),
            ("m", {"env": "dev", "k": "1"}, 2.0, -30),
            ("m", {"env": "prod", "k": "1"}, 3.0, -30),
        ],
    )
    out = eval_promql(df, 'sort_by_label(m, "env", "k")', T0).collect()
    assert [(r["labels"]["env"], r["labels"]["k"]) for r in out] == [
        ("dev", "1"), ("prod", "1"), ("prod", "2"),
    ]
    out_d = eval_promql(df, 'sort_by_label_desc(m, "env")', T0).collect()
    assert [r["labels"]["env"] for r in out_d][0] == "prod"
    with pytest.raises(PromQLError):
        eval_promql(df, "sort_by_label(m)", T0)


def test_increase_range_sliding_windows_hand_computed(spark):
    from prom_etl_db_spark.operators.promql import increase_range

    # counter 0,10,4,6 at :00,:20,:40,:60 past T0-1h; reset at :40.
    df = _samples(
        spark,
        [
            ("m", {"k": "a"}, 0.0, -3600),
            ("m", {"k": "a"}, 10.0, -2400),
            ("m", {"k": "a"}, 4.0, -1200),  # reset: contributes 4
            ("m", {"k": "a"}, 6.0, 0),
        ],
    )
    out = increase_range(
        df,
        frame="40m",
        step="20m",
        start=T0 - timedelta(minutes=40),
        end=T0 + timedelta(minutes=20),
    )
    got = {
        r["bucket_start"]: r["value"]
        for r in out.collect()
    }
    # window (T0-80m, T0-40m]... i.e. [t-40m, t):
    # t=T0-40m: samples at -3600(-60m),-2400(-40m is EXCLUDED? window
    #   [t-40m, t) = [-80m, -40m): contains only -60m -> 1 sample, drops
    # t=T0-20m: [-60m, -20m): samples -60m,-40m -> increase 10
    # t=T0:     [-40m, 0): samples -40m,-20m -> reset -> 4
    # t=T0+20m: [-20m, +20m): samples -20m, 0 -> 6-4=2
    assert got[T0 - timedelta(minutes=20)] == 10.0
    assert got[T0] == 4.0
    assert got[T0 + timedelta(minutes=20)] == 2.0
    assert (T0 - timedelta(minutes=40)) not in got


def test_executor_range_mode_rate(spark):
    from prom_etl_db_spark.config import QueryConfig
    from prom_etl_db_spark.executor import evaluate_config_query

    df = _samples(
        spark,
        [("m", {"k": "a"}, float(v), -3600 + 600 * i) for i, v in enumerate([0, 6, 12, 18, 24, 30])],
    )
    cfg = QueryConfig(
        query_id="r", name="r", query="rate(m[30m])",
        time_range_type="range",
        time_range_start="now-1h", time_range_end="now",
        time_range_step="30m",
    )
    out, rtype = evaluate_config_query(df, cfg, now=T0)
    assert rtype == "range"
    rows = {r["timestamp"]: r["value"] for r in out.collect()}
    # steady +6 per 10m = 0.01/s; windows with 3 samples see +12 over 1800s
    assert rows and all(abs(v - 12.0 / 1800) < 1e-9 for v in rows.values())


def test_eval_trig_pi_and_histogram_fraction(spark):
    import math

    df = _samples(spark, [("m", {"h": "a"}, 0.5, -10)])
    assert eval_promql(df, "sin(m)", T0).collect()[0]["value"] == pytest.approx(
        math.sin(0.5)
    )
    assert eval_promql(df, "deg(m)", T0).collect()[0]["value"] == pytest.approx(
        math.degrees(0.5)
    )
    assert eval_promql(df, "rad(deg(m))", T0).collect()[0]["value"] == pytest.approx(0.5)
    assert eval_promql(None, "pi()", T0) == math.pi
    assert eval_promql(df, "m * pi()", T0).collect()[0]["value"] == pytest.approx(
        0.5 * math.pi
    )

    # histogram_fraction over bucket series parsed from text
    b = _samples(
        spark,
        [
            ("req_bucket", {"le": "10"}, 10, -10),
            ("req_bucket", {"le": "20"}, 30, -10),
            ("req_bucket", {"le": "+Inf"}, 40, -10),
        ],
    )
    out = eval_promql(b, "histogram_fraction(5, 15, req_bucket)", T0).collect()
    assert out[0]["value"] == pytest.approx(15 / 40)


def test_eval_atan2_all_three_paths(spark):
    import math

    assert eval_promql(None, "1 atan2 2", T0) == pytest.approx(math.atan2(1, 2))
    df = _samples(
        spark, [("m", {"h": "a"}, 3, -10), ("n", {"h": "a"}, 4, -10)]
    )
    assert eval_promql(df, "m atan2 3", T0).collect()[0]["value"] == pytest.approx(
        math.atan2(3, 3)
    )
    assert eval_promql(df, "m atan2 n", T0).collect()[0]["value"] == pytest.approx(
        math.atan2(3, 4)
    )
    # binds like * : 1 + 1 atan2 1 = 1 + atan2(1,1)
    assert eval_promql(None, "1 + 1 atan2 1", T0) == pytest.approx(
        1 + math.atan2(1, 1)
    )


def test_scalar_is_lazy_and_broadcast(spark):
    """scalar(v): 1-element vector -> its value, else NaN — carried as a
    1-row lazy frame, never a driver collect; vector binops against it
    plan a broadcast nested-loop join of exactly one row."""
    import math

    df = _samples(
        spark, [("m", {"h": "a"}, 5, -10), ("m", {"h": "b"}, 3, -20)]
    )
    # share-of-total: every series divided by the global sum, lazily
    out = eval_promql(df, "m / scalar(sum(m))", T0)
    vals = sorted(r["value"] for r in out.collect())
    assert vals == pytest.approx([3 / 8, 5 / 8])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan and "CartesianProduct" not in plan
    # scalar∘scalar composes without leaving the plan
    one = eval_promql(df, "100 * scalar(sum(m)) / scalar(count(m))", T0)
    assert [r["value"] for r in one.collect()] == [400.0]
    # multi-series argument -> NaN (PromQL), and NaN propagates arithmetic
    nan = eval_promql(df, "scalar(m) + 1", T0).collect()
    assert len(nan) == 1 and math.isnan(nan[0]["value"])
    # comparison filter against a data-dependent scalar
    kept = eval_promql(df, "m > scalar(min(m))", T0).collect()
    assert [(dict(r["labels"]), r["value"]) for r in kept] == [({"h": "a"}, 5.0)]
    # NaN comparisons are IEEE-false, not Spark's NaN-is-largest ordering
    assert eval_promql(df, "m > scalar(sum by (h) (m))", T0).collect() == []
    # vector(scalar(x)) re-labels the lazy row
    v = eval_promql(df, "vector(scalar(sum(m)))", T0).collect()
    assert dict(v[0]["labels"]) == {} and v[0]["value"] == 8.0
    # set ops stay type-errors with scalar operands
    with pytest.raises(PromQLError):
        eval_promql(df, "m or scalar(sum(m))", T0)


def test_first_and_ts_of_first_last_over_time(spark):
    df = _samples(
        spark,
        [("m", {"h": "a"}, 7, -1800), ("m", {"h": "a"}, 2, -600),
         ("m", {"h": "a"}, 9, -60)],
    )
    # raw range-vector forms
    assert eval_promql(df, "first_over_time(m[1h])", T0).collect()[0]["value"] == 7.0
    t0s = T0.timestamp()
    assert eval_promql(df, "ts_of_first_over_time(m[1h])", T0).collect()[0][
        "value"
    ] == t0s - 1800
    assert eval_promql(df, "ts_of_last_over_time(m[1h])", T0).collect()[0][
        "value"
    ] == t0s - 60
    # the raw ts_of extremes forms work too (regression: used to KeyError)
    assert eval_promql(df, "ts_of_max_over_time(m[1h])", T0).collect()[0][
        "value"
    ] == t0s - 60
    assert eval_promql(df, "ts_of_min_over_time(m[1h])", T0).collect()[0][
        "value"
    ] == t0s - 600
    # subquery (step-grid) form: 10m buckets, first bucket value is 7
    out = eval_promql(df, "first_over_time(m[1h:10m])", T0).collect()
    assert out[0]["value"] == 7.0


def test_inverse_hyperbolic_and_day_of_year(spark):
    import math

    df = _samples(spark, [("m", {"h": "a"}, 0.5, -10)])
    assert eval_promql(df, "asinh(m)", T0).collect()[0]["value"] == pytest.approx(
        math.asinh(0.5)
    )
    assert eval_promql(df, "atanh(m)", T0).collect()[0]["value"] == pytest.approx(
        math.atanh(0.5)
    )
    # acosh domain is [1, inf): 0.5 -> NaN like PromQL/Go
    assert math.isnan(eval_promql(df, "acosh(m)", T0).collect()[0]["value"])
    # day_of_year of the sample's own epoch value (1970-01-01 + 0.5s = day 1)
    assert eval_promql(df, "day_of_year(m)", T0).collect()[0]["value"] == 1.0
    # no-arg form: component of the eval instant (2024-03-15 = day 75)
    assert eval_promql(df, "day_of_year()", T0) == 75.0


# -- review-pass regressions ------------------------------------------------


def test_string_literals_unescape():
    s = parse(r'x{job="a\"b"}')
    assert s.matchers[0][2] == 'a"b'
    # PromQL regex a\.b is written "a\\.b" — one backslash must survive
    s2 = parse(r'x{l=~"a\\.b"}')
    assert s2.matchers[0][2] == r"a\.b"
    with pytest.raises(PromQLError, match="unsupported escape"):
        parse(r'x{l="a\.b"}')  # invalid in Prometheus too


def test_string_literals_numeric_escapes():
    # Go strconv.Unquote numeric forms: \xNN, \uNNNN, \UNNNNNNNN, \NNN
    assert parse(r'x{l="\x41é\U0001F600\101"}').matchers[0][2] == (
        "Aé\U0001F600A"
    )
    # exactly-N-digit rule: a short run is an error, not a shorter escape
    for bad in (r'x{l="\x4"}', r'x{l="\u00e"}', r'x{l="\U0001F60"}',
                r'x{l="\7"}', r'x{l="\xzz"}'):
        with pytest.raises(PromQLError, match="invalid"):
            parse(bad)
    with pytest.raises(PromQLError, match="invalid"):
        parse(r'x{l="\ud800"}')  # surrogate rune, rejected like Go
    with pytest.raises(PromQLError, match="invalid"):
        parse(r'x{l="\U00110000"}')  # beyond U+10FFFF
    with pytest.raises(PromQLError, match="invalid"):
        parse(r'x{l="\400"}')  # octal > 255


def test_string_literals_backquote_raw():
    # Go raw strings: no escape processing at all (Prometheus accepts
    # `...` anywhere a quoted string is valid)
    s = parse(r'x{l=~`a\.b`}')
    assert s.matchers[0][2] == r"a\.b"
    assert parse('x{l=`plain`}').matchers[0][2] == "plain"


def test_escaped_regex_matcher_matches_literal_dot(spark):
    df = _samples(
        spark,
        [("m", {"p": "a.b"}, 1, -10), ("m", {"p": "axb"}, 2, -10)],
    )
    out = eval_promql(df, r'm{p=~"a\\.b"}', T0).collect()
    assert len(out) == 1 and out[0]["labels"]["p"] == "a.b"


def test_nameless_selector_evaluates(spark):
    df = _samples(
        spark,
        [("m1", {"job": "x"}, 1, -10), ("m2", {"job": "x"}, 2, -10),
         ("m3", {"job": "y"}, 3, -10)],
    )
    out = eval_promql(df, '{job="x"}', T0).collect()
    assert sorted(r["value"] for r in out) == [1.0, 2.0]
    # the metric name rides back in as __name__ (Prometheus wire shape),
    # so same-labeled series from different metrics stay distinct
    assert {r["labels"]["__name__"] for r in out} == {"m1", "m2"}
    with pytest.raises(PromQLError, match="at least one matcher"):
        parse("{}")


def test_name_matcher_probes_metric_name(spark):
    df = _samples(
        spark,
        [("http_req", {"j": "a"}, 1, -10), ("grpc_req", {"j": "a"}, 2, -10)],
    )
    out = eval_promql(df, '{__name__=~"http_.*"}', T0).collect()
    assert len(out) == 1 and out[0]["value"] == 1.0


def test_short_arg_lists_raise_promql_error(spark):
    df = _samples(spark, [("x", {"h": "a"}, 1, -10)])
    for q in (
        'label_replace(x, "dst")',
        "clamp(x)",
        "histogram_quantile(x)",
        "predict_linear(x[5m])",
    ):
        with pytest.raises(PromQLError, match="takes"):
            eval_promql(df, q, T0)


def test_round_tiny_to_nearest_does_not_saturate(spark):
    df = _samples(spark, [("m", {"h": "a"}, 10, -10)])
    got = eval_promql(df, "round(m, 0.000000000000000001)", T0).collect()[0]["value"]
    assert got == pytest.approx(10.0)  # not ~9.22 (2^63 saturation)


def test_rate_over_subquery(spark):
    # counter rising 10/min sampled every minute; rate over the
    # step-aligned subquery ≈ 1/6 per second (exact: observed increase
    # over the 30m window / 1800 s)
    df = _samples(
        spark, [("c", {"h": "a"}, 10 * i, -3600 + 60 * i) for i in range(61)]
    )
    got = eval_promql(df, "rate(c[30m:1m])", T0).collect()[0]["value"]
    direct = eval_promql(df, "rate(c[30m])", T0).collect()[0]["value"]
    assert got == pytest.approx(direct, rel=0.05)
    # increase too, and the raw-range form still works
    inc = eval_promql(df, "increase(c[30m:1m])", T0).collect()[0]["value"]
    assert inc == pytest.approx(got * 1800.0, rel=1e-9)


def test_year_duration_unit(spark):
    from prom_etl_db_spark.timeparse import parse_duration

    assert parse_duration("1y").days == 365
    df = _samples(spark, [("m", {"h": "a"}, 5, -10), ("m", {"h": "a"}, 9, -5)])
    # must evaluate (not crash with TimeParseError)
    out = eval_promql(df, "max_over_time(m[1y])", T0).collect()
    assert out[0]["value"] == 9.0


def test_subquery_resample_duplicate_timestamps_deterministic(spark):
    # the generic samples table has no unique event column; duplicate
    # (series, ts) samples must resolve deterministically (max value
    # wins) rather than by partition luck — the registry oracles order
    # (ts DESC, value DESC) to match
    rows = [
        ("m", {"h": "a"}, 3, -1200),
        ("m", {"h": "a"}, 8, -1200),  # same ts, different value
        ("m", {"h": "a"}, 5, -300),
        ("m", {"h": "a"}, 2, -300),
    ]
    df = _samples(spark, rows).repartition(8)
    for _ in range(3):
        out = eval_promql(df, "sum_over_time(m[1h:10m])", T0).collect()
        assert out[0]["value"] == 13.0  # 8 (11:40 bucket) + 5 (11:55)
