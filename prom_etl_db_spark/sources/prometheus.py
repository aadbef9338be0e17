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
                    F.from_json(F.col("props"), "map<string,string>"),
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
