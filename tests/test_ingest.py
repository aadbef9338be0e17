"""Ingest normalization chain tests (SURVEY.md §2.A rows A7-A13).

Covers the matrix explode, malformed-row quarantine, __name__ fallback and
label drop, string→double / epoch→timestamp casts, and the A13
day-truncation special-case matrix (instant/range × same-day/cross-day ×
yesterday/yesterday_end) from SURVEY.md §5.2 item 1.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from prom_etl_db_spark.ingest import normalize_matrix, normalize_vector
from prom_etl_db_spark.schema import WIRE_MATRIX_SCHEMA, WIRE_VECTOR_SCHEMA

NOW = datetime(2024, 3, 15, 10, 30, 0)


def _matrix_df(spark, rows):
    return spark.createDataFrame(rows, WIRE_MATRIX_SCHEMA)


def _vector_df(spark, rows):
    return spark.createDataFrame(rows, WIRE_VECTOR_SCHEMA)


@pytest.fixture(scope="module")
def wire_matrix(spark):
    # two series; series B carries one malformed pair (arity 1) and one
    # unparseable value — both must be quarantined, not crash (A12).
    ts0 = datetime(2024, 3, 14, 0, 0).timestamp()
    return _matrix_df(
        spark,
        [
            (
                {"__name__": "cpu", "host": "a"},
                [[str(ts0), "1.5"], [str(ts0 + 60), "2.5"]],
            ),
            (
                {"host": "b"},  # no __name__ → metric_name falls back to query_id
                [[str(ts0)], [str(ts0 + 60), "oops"], [str(ts0 + 120), "7"]],
            ),
        ],
    )


def test_matrix_explode_and_quarantine(spark, wire_matrix):
    records, bad = normalize_matrix(wire_matrix, "q1", now=NOW)
    assert records.count() == 3  # 2 good + 1 good
    assert bad.count() == 2  # arity-1 pair + unparseable value


def test_name_fallback_and_label_drop(spark, wire_matrix):
    records, _ = normalize_matrix(wire_matrix, "q1", now=NOW)
    rows = {r["metric_name"]: r for r in records.collect()}
    assert set(rows) == {"cpu", "q1"}  # fallback to query_id (executor.go:232)
    # __name__ never appears in stored labels (A9, executor.go:259-264)
    for r in records.collect():
        assert "__name__" not in r["labels"]
    assert rows["cpu"]["labels"] == {"host": "a"}


def test_casts(spark, wire_matrix):
    records, _ = normalize_matrix(wire_matrix, "q1", now=NOW)
    r = records.where("metric_name = 'cpu'").orderBy("timestamp").first()
    assert isinstance(r["value"], float) and r["value"] == 1.5  # A10
    assert r["timestamp"] == datetime(2024, 3, 14, 0, 0)  # A11


# -- A13 day-truncation matrix (executor.go:404-461) ------------------------


def _one_point_matrix(spark, ts: datetime):
    return _matrix_df(
        spark, [({"host": "a"}, [[str(ts.timestamp()), "1"]])]
    )


def test_collected_at_range_same_day(spark):
    # same-day range window → every point buckets to that day's start
    df = _one_point_matrix(spark, datetime(2024, 3, 14, 17, 45))
    records, _ = normalize_matrix(
        df, "q", now=NOW, time_range_type="range",
        start_expr="yesterday", end_expr="yesterday_end",
    )
    r = records.first()
    assert r["collected_at"] == datetime(2024, 3, 14, 0, 0)
    assert r["result_type"] == "range"


def test_collected_at_range_cross_day(spark):
    # cross-day range → each point keeps its own day start
    df = _one_point_matrix(spark, datetime(2024, 3, 10, 23, 59))
    records, _ = normalize_matrix(
        df, "q", now=NOW, time_range_type="range",
        start_expr="-3d", end_expr="now",
    )
    assert records.first()["collected_at"] == datetime(2024, 3, 10, 0, 0)


@pytest.mark.parametrize("expr", ["yesterday", "yesterday_end"])
def test_collected_at_instant_yesterday(spark, expr):
    # instant query at yesterday[_end] → bucket to yesterday's day start
    # even if the data point's own timestamp drifts (executor.go:441-453)
    df = _vector_df(spark, [({"host": "a"}, NOW.timestamp(), "3.0")])
    records = normalize_vector(df, "q", now=NOW, time_expr=expr)
    assert records.first()["collected_at"] == datetime(2024, 3, 14, 0, 0)


def test_collected_at_instant_default(spark):
    # plain instant ('now') → point's own day
    df = _vector_df(spark, [({"h": "x"}, datetime(2024, 3, 15, 9, 0).timestamp(), "2")])
    records = normalize_vector(df, "q", now=NOW, time_expr="now")
    r = records.first()
    assert r["collected_at"] == datetime(2024, 3, 15, 0, 0)
    assert r["collected_date"] == datetime(2024, 3, 15, 0, 0).date()


def test_vector_malformed_value_skipped(spark):
    df = _vector_df(spark, [({"h": "x"}, NOW.timestamp(), "NaN-ish-garbage")])
    assert normalize_vector(df, "q", now=NOW).count() == 0


def test_nan_inf_survive(spark):
    # Prometheus emits NaN/±Inf; unlike MySQL double we store them
    # (SURVEY.md §4.3 NaN policy — documented divergence).
    df = _vector_df(
        spark,
        [({"h": "a"}, NOW.timestamp(), "NaN"), ({"h": "b"}, NOW.timestamp(), "+Inf")],
    )
    vals = [r["value"] for r in normalize_vector(df, "q", now=NOW).collect()]
    assert len(vals) == 2
    assert any(v != v for v in vals)  # NaN
    assert any(v == float("inf") for v in vals)


def test_parse_real_prometheus_api_shapes(spark):
    # the exact JSON the HTTP API returns (prometheus.io/docs/prometheus/
    # latest/querying/api/#expression-query-result-formats)
    from prom_etl_db_spark.sources.prometheus import parse_api_response

    vec = {
        "status": "success",
        "data": {
            "resultType": "vector",
            "result": [
                {"metric": {"__name__": "up", "job": "api"},
                 "value": [1704067200.123, "1"]},
                {"metric": {"__name__": "up", "job": "db"},
                 "value": [1704067200.123, "0"]},
            ],
        },
    }
    df, rt = parse_api_response(spark, vec)
    assert rt == "vector" and df.count() == 2
    assert df.where("metric['job'] = 'api'").first()["value"] == "1"

    mat = {
        "status": "success",
        "data": {
            "resultType": "matrix",
            "result": [
                {"metric": {"job": "api"},
                 "values": [[1704067200, "10"], [1704067260, "11.5"]]},
            ],
        },
    }
    df, rt = parse_api_response(spark, mat)
    assert rt == "matrix"
    assert df.first()["values"] == [["1704067200", "10"], ["1704067260", "11.5"]]

    sca = {"status": "success",
           "data": {"resultType": "scalar", "result": [1704067200.5, "42"]}}
    df, rt = parse_api_response(spark, sca)
    assert rt == "scalar" and df.first()["value"] == "42"


def test_parse_api_error_envelope_raises(spark):
    import pytest as _pytest

    from prom_etl_db_spark.sources.prometheus import parse_api_response

    bad = {"status": "error", "errorType": "bad_data",
           "error": "invalid parameter"}
    with _pytest.raises(ValueError, match="bad_data"):
        parse_api_response(spark, bad)


def test_http_source_builds_reference_shaped_urls(spark):
    from datetime import datetime

    from prom_etl_db_spark.sources.prometheus import PrometheusHTTPSource

    src = PrometheusHTTPSource(spark, "http://prom:9090/")
    u = src.instant_url("up", datetime(2024, 1, 1))
    assert u.startswith("http://prom:9090/api/v1/query?")
    assert "query=up" in u and "time=" in u
    r = src.range_url("rate(x[5m])", datetime(2024, 1, 1), datetime(2024, 1, 2), "60s")
    assert r.startswith("http://prom:9090/api/v1/query_range?")
    assert "step=60s" in r and "start=" in r and "end=" in r


def test_api_payload_through_full_normalize_chain(spark):
    # real wire JSON → parse (A4) → normalize (A7-A13) → MetricRecords:
    # the complete reference ingest path with no Prometheus server
    from datetime import datetime

    from prom_etl_db_spark.ingest import normalize_matrix
    from prom_etl_db_spark.sources.prometheus import parse_api_response

    payload = {
        "status": "success",
        "data": {
            "resultType": "matrix",
            "result": [
                {"metric": {"__name__": "cpu", "host": "a"},
                 "values": [[1704067200, "1.5"], [1704070800, "oops"],
                            [1704074400, "2.5"]]},
            ],
        },
    }
    wire, rt = parse_api_response(spark, payload)
    assert rt == "matrix"
    records, quarantined = normalize_matrix(
        wire, "q1", now=datetime(2024, 1, 2), time_range_type="range",
        start_expr="-1d", end_expr="now",
    )
    rows = records.orderBy("timestamp").collect()
    assert [r["value"] for r in rows] == [1.5, 2.5]  # "oops" quarantined
    assert quarantined.count() == 1
    assert all(r["metric_name"] == "cpu" for r in rows)
    assert all("__name__" not in r["labels"] for r in rows)  # A9 drop
    assert rows[0]["collected_date"] == rows[0]["timestamp"].date()  # A13


def test_parse_api_lenient_on_malformed_rows(spark):
    from prom_etl_db_spark.sources.prometheus import parse_api_response

    # vector: a bad timestamp drops only that series
    vec = {"status": "success", "data": {"resultType": "vector", "result": [
        {"metric": {"j": "ok"}, "value": [1704067200, "1"]},
        {"metric": {"j": "bad"}, "value": ["not-a-ts", "2"]},
        {"metric": {"j": "short"}, "value": []},
    ]}}
    df, _ = parse_api_response(spark, vec)
    assert [r["metric"]["j"] for r in df.collect()] == ["ok"]

    # matrix: a wrong-arity pair survives the parse and is judged by the
    # A12 quarantine downstream, not by the parser
    mat = {"status": "success", "data": {"resultType": "matrix", "result": [
        {"metric": {}, "values": [[1704067200, "1", "extra"], [1704067260, "2"]]},
    ]}}
    df, _ = parse_api_response(spark, mat)
    assert df.first()["values"] == [["1704067200", "1", "extra"], ["1704067260", "2"]]


def test_events_props_carrying_user_id_do_not_fail_batch(spark):
    # map_concat with a duplicate key throws under Spark's default
    # EXCEPTION dedup policy — a props JSON that itself contains
    # "user_id" must not abort the whole batch; the typed column wins
    from prom_etl_db_spark.ingest import events_as_metric_records

    rows = [
        ("e1", "click", "u7", 1.0, datetime(2024, 3, 1, 10, 0, 0),
         '{"user_id": "evil-override", "page": "home"}'),
        ("e2", "click", "u8", 2.0, datetime(2024, 3, 1, 11, 0, 0), None),
    ]
    df = spark.createDataFrame(
        rows, "event_id string, event_type string, user_id string, "
              "value double, ts timestamp, props string"
    )
    rows_out = events_as_metric_records(df).collect()  # must not raise
    # DUPLICATED_MAP_KEY; the typed user_id column wins over the props copy
    labels = {r["labels"]["user_id"] for r in rows_out}
    assert labels == {"u7", "u8"}
    pages = {r["labels"].get("page") for r in rows_out}
    assert "home" in pages  # the rest of the props map survives


def test_http_error_with_non_json_body_surfaces_status_and_url(spark):
    # JSONDecodeError IS a ValueError: a proxy's HTML 502 page must
    # surface "HTTP 502 from <url>", not "Expecting value: line 1..."
    import io
    from unittest import mock
    from urllib.error import HTTPError

    from prom_etl_db_spark.sources.prometheus import PrometheusHTTPSource

    src = PrometheusHTTPSource(spark, "http://prom:9090")
    err = HTTPError(
        "http://prom:9090/api/v1/query", 502, "Bad Gateway", None,
        io.BytesIO(b"<html>upstream connect error</html>"),
    )
    with mock.patch(
        "urllib.request.urlopen", side_effect=err
    ), pytest.raises(ValueError, match="HTTP 502 from http://prom:9090"):
        src.query_instant("up", datetime(2024, 1, 1))
