"""Structured JSON logger (logger.py — reference internal/logger parity)."""

import io
import json

from prom_etl_db_spark.logger import (
    new_logger,
    with_component,
    with_count,
    with_duration,
    with_error,
    with_fields,
    with_query_id,
)


def _capture(level="info"):
    buf = io.StringIO()
    return new_logger(level, name="t_logger", stream=buf), buf


def _lines(buf):
    return [json.loads(x) for x in buf.getvalue().strip().splitlines()]


def test_json_envelope_and_source():
    lg, buf = _capture()
    lg.info("hello %s", "world")
    (rec,) = _lines(buf)
    assert rec["msg"] == "hello world" and rec["level"] == "INFO"
    assert rec["source"].startswith("test_logger.py:")
    assert rec["ts"].endswith("+00:00")


def test_level_filtering_and_unknown_level_defaults_to_info():
    lg, buf = _capture("warn")
    lg.info("hidden")
    lg.warning("shown")
    assert [r["msg"] for r in _lines(buf)] == ["shown"]

    lg2, buf2 = _capture("nonsense")
    lg2.info("visible")
    lg2.debug("hidden")
    assert [r["msg"] for r in _lines(buf2)] == ["visible"]


def test_bound_fields_accumulate_like_slog_with():
    lg, buf = _capture()
    bound = with_component(lg, "executor")
    bound = with_query_id(bound, "q7")
    bound = with_duration(bound, 123)
    bound = with_count(bound, 42)
    bound.info("ran")
    lg.info("unbound")  # binding must not leak back to the parent
    recs = _lines(buf)
    assert recs[0]["component"] == "executor" and recs[0]["query_id"] == "q7"
    assert recs[0]["duration_ms"] == 123 and recs[0]["count"] == 42
    assert "component" not in recs[1]


def test_with_error_and_field_collision_protection():
    lg, buf = _capture()
    with_error(lg, ValueError("boom")).error("failed")
    with_fields(lg, msg="shadow", user="u1").info("real message")
    recs = _lines(buf)
    assert recs[0]["error"] == "boom" and recs[0]["level"] == "ERROR"
    # a bound field named like an envelope key must not clobber it
    assert recs[1]["msg"] == "real message" and recs[1]["user"] == "u1"


def test_reconfigure_is_idempotent_no_duplicate_lines():
    buf = io.StringIO()
    new_logger("info", name="t_idem", stream=buf)
    lg = new_logger("info", name="t_idem", stream=buf)
    lg.info("once")
    assert len(_lines(buf)) == 1


def test_warn_level_matches_go_slog():
    import io
    import json

    from prom_etl_db_spark.logger import new_logger

    buf = io.StringIO()
    log = new_logger("warn", stream=buf)
    log.warning("careful")
    line = json.loads(buf.getvalue().splitlines()[-1])
    assert line["level"] == "WARN"  # slog parity, not Python's "WARNING"
