"""Prometheus-shaped source adapters (SURVEY.md §2.A rows A1-A6).

The reference fetches PromQL evaluations over HTTP
(`/root/reference/internal/prometheus/client.go:63-161`) and normalizes the
API value into one envelope (`client.go:233-298`). Here the same roles are
played by DataFrame constructors:

- ``vector_response_df`` / ``matrix_response_df`` build wire-shaped
  DataFrames (A4-A6 normalization is the schema itself — ``from_json`` is
  unnecessary when rows are born typed).
- ``FixturePrometheusSource`` derives instant-vector / range-matrix
  responses from the ``events`` fixture table, standing in for a live
  Prometheus (FIXTURES.md §2): event_type→metric_name, props JSON + user_id
  →labels, value→sample value.

A real HTTP fetcher would produce the same wire rows on the driver and feed
``spark.createDataFrame`` — everything downstream is shared.
"""

from __future__ import annotations

import json
from collections.abc import Iterable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prom_etl_db_spark.schema import WIRE_MATRIX_SCHEMA, WIRE_VECTOR_SCHEMA


def vector_response_df(
    spark: SparkSession,
    samples: Iterable[tuple[dict[str, str], float, str]],
) -> DataFrame:
    """Instant-vector envelope: one row per series — (metric-labels, ts,
    string-encoded value), mirroring ``VectorResult``
    (`/root/reference/internal/models/models.go:21-27`)."""
    return spark.createDataFrame(list(samples), WIRE_VECTOR_SCHEMA)


def matrix_response_df(
    spark: SparkSession,
    series: Iterable[tuple[dict[str, str], list[list[str]]]],
) -> DataFrame:
    """Range-matrix envelope: one row per series with [[ts, "val"], ...]
    pairs, mirroring ``MatrixResult`` (`models.go:30-36`). Pairs stay loose
    string arrays so malformed entries reach the A12 quarantine filter."""
    return spark.createDataFrame(list(series), WIRE_MATRIX_SCHEMA)


class FixturePrometheusSource:
    """Fixture-backed stand-in for the Prometheus client (A1/A2/A3).

    Instant queries return the latest sample per series within the
    staleness window before ``at`` (matching PromQL instant-selector
    semantics, SURVEY.md §2.B B1); range queries return every raw sample in
    [start, end] — step alignment happens downstream in
    ``operators.promql.resample`` just as Prometheus evaluates subqueries.
    """

    def __init__(self, spark: SparkSession, sf_dir: str, staleness: str = "5 minutes"):
        self.spark = spark
        self.sf_dir = sf_dir
        self.staleness = staleness

    def _samples(self, metric_name: str) -> DataFrame:
        # Predicate on event_type is pushed into the parquet scan.
        ev = self.spark.read.parquet(f"{self.sf_dir}/events.parquet")
        return (
            ev.where(F.col("event_type") == metric_name)
            .select(
                F.col("event_type").alias("metric_name"),
                F.map_concat(
                    # drop a props-carried "user_id" first — map_concat
                    # with a duplicate key throws under Spark's default
                    # EXCEPTION dedup policy (typed column wins)
                    F.map_filter(
                        F.from_json(F.col("props"), "map<string,string>"),
                        lambda k, _: k != "user_id",
                    ),
                    F.create_map(F.lit("user_id"), F.col("user_id").cast("string")),
                ).alias("labels"),
                F.col("value"),
                F.col("ts").alias("timestamp"),
            )
        )

    def query_instant(self, metric_name: str, at: datetime) -> DataFrame:
        """A1: latest point per series in [at - staleness, at]."""
        from pyspark.sql.window import Window

        from prom_etl_db_spark.schema import series_key

        df = (
            self._samples(metric_name)
            .where(
                (F.col("timestamp") <= F.lit(at))
                & (F.col("timestamp") >= F.lit(at) - F.expr(f"INTERVAL {self.staleness}"))
            )
            .withColumn("series_key", series_key(F.col("labels")))
        )
        w = Window.partitionBy("series_key").orderBy(F.desc("timestamp"))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "series_key")
        )

    def query_range(self, metric_name: str, start: datetime, end: datetime) -> DataFrame:
        """A2: all raw samples in [start, end]; resampling is downstream."""
        return self._samples(metric_name).where(
            (F.col("timestamp") >= F.lit(start)) & (F.col("timestamp") <= F.lit(end))
        )

    def query_with_time_range(
        self,
        metric_name: str,
        time_range_type: str | None,
        *,
        at: datetime | None = None,
        start: datetime | None = None,
        end: datetime | None = None,
    ) -> DataFrame:
        """A3 unified dispatch: unknown/absent type defaults to instant
        (`/root/reference/internal/prometheus/client.go:206-230`)."""
        if time_range_type == "range" and start is not None and end is not None:
            return self.query_range(metric_name, start, end)
        if at is None:
            raise ValueError("instant query requires `at`")
        return self.query_instant(metric_name, at)


def parse_api_response(
    spark: SparkSession, payload: "str | dict"
) -> tuple[DataFrame, str]:
    """A4: the REAL Prometheus HTTP-API envelope → wire DataFrame.

    Accepts the exact JSON shape ``GET /api/v1/query[_range]`` returns
    (``{"status": "success", "data": {"resultType": ..., "result":
    [...]}}``) and normalizes every result type onto the two wire
    schemas, mirroring ``convertToPrometheusResponse``
    (`/root/reference/internal/prometheus/client.go:233-298`):

    - ``vector`` → one row per series (metric, ts, string value)
    - ``matrix`` → one row per series with its [[ts, "v"], ...] pairs
    - ``scalar`` / ``string`` → a 1-row vector with empty labels
      (`client.go:287-298`; the string form survives to the A12
      quarantine, exactly like a malformed sample)

    Returns (df, result_type). Error envelopes raise with the server's
    errorType/error fields, like the reference's non-2xx handling.
    """
    import json

    data = json.loads(payload) if isinstance(payload, str) else payload
    if data.get("status") != "success":
        raise ValueError(
            f"prometheus error ({data.get('errorType', 'unknown')}): "
            f"{data.get('error', 'no detail')}"
        )
    rt = data["data"]["resultType"]
    result = data["data"]["result"]

    if rt == "vector":
        # lenient per-row: a malformed timestamp or short value pair drops
        # that series; the batch survives (the same stance A12 takes for
        # values — one bad scrape must not fail the whole response)
        rows = []
        for r in result:
            pair = r.get("value", [])
            try:
                rows.append((dict(r.get("metric", {})), float(pair[0]), str(pair[1])))
            except (TypeError, ValueError, IndexError):
                continue
        return vector_response_df(spark, rows), "vector"
    if rt == "matrix":
        # pairs stay loose string lists at WHATEVER arity arrived — the
        # A12 quarantine filter judges them, not the parser
        rows = [
            (
                dict(r.get("metric", {})),
                [[str(x) for x in pair] for pair in r.get("values", [])],
            )
            for r in result
        ]
        return matrix_response_df(spark, rows), "matrix"
    if rt in ("scalar", "string"):
        ts, v = result
        return vector_response_df(spark, [({}, float(ts), str(v))]), rt
    raise ValueError(f"unknown resultType {rt!r}")


class PrometheusHTTPSource:
    """A1/A2 over a live server: builds the same ``/api/v1/query`` and
    ``/api/v1/query_range`` requests as the reference client
    (`client.go:63-161`) and parses responses via ``parse_api_response``.
    URL construction is pure (offline-testable); the fetch itself uses
    urllib at call time — this container has no network, so tests cover
    the request/parse halves and ``FixturePrometheusSource`` stands in
    for the transport."""

    def __init__(self, spark: SparkSession, base_url: str, timeout_s: float = 30.0):
        self.spark = spark
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s  # PROMETHEUS_TIMEOUT default, config.go:56

    def instant_url(self, query: str, at: datetime) -> str:
        from urllib.parse import urlencode

        q = urlencode({"query": query, "time": f"{at.timestamp():.3f}"})
        return f"{self.base_url}/api/v1/query?{q}"

    def range_url(self, query: str, start: datetime, end: datetime, step: str) -> str:
        from urllib.parse import urlencode

        q = urlencode(
            {
                "query": query,
                "start": f"{start.timestamp():.3f}",
                "end": f"{end.timestamp():.3f}",
                "step": step,
            }
        )
        return f"{self.base_url}/api/v1/query_range?{q}"

    def _fetch(self, url: str) -> tuple[DataFrame, str]:
        from urllib.error import HTTPError
        from urllib.request import urlopen

        try:
            with urlopen(url, timeout=self.timeout_s) as resp:  # noqa: S310
                return parse_api_response(self.spark, resp.read().decode())
        except HTTPError as e:
            # Prometheus returns errors with non-2xx status AND a JSON
            # error envelope in the body — surface errorType/error rather
            # than a bare "Bad Request"
            body = e.read().decode(errors="replace")
            try:
                return parse_api_response(self.spark, body)
            except json.JSONDecodeError:
                # must precede ValueError — JSONDecodeError IS a
                # ValueError, and a non-JSON body (proxy HTML error page)
                # should surface the HTTP status + body, not a bare
                # "Expecting value: line 1 column 1"
                raise ValueError(f"HTTP {e.code} from {url}: {body[:500]}") from e
            except ValueError as parsed:
                raise ValueError(str(parsed)) from e
            except Exception:
                raise ValueError(f"HTTP {e.code} from {url}: {body[:500]}") from e

    def query_instant(self, query: str, at: datetime) -> tuple[DataFrame, str]:
        return self._fetch(self.instant_url(query, at))

    def query_range(
        self, query: str, start: datetime, end: datetime, step: str
    ) -> tuple[DataFrame, str]:
        return self._fetch(self.range_url(query, start, end, step))
