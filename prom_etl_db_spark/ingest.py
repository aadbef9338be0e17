"""Ingest normalization chain (SURVEY.md §2.A rows A7-A13).

The reference flattens Prometheus wire results into ``MetricRecord`` rows in
Go loops (`/root/reference/internal/executor/executor.go:230-363`); here the
same semantics are one declarative DataFrame chain so Catalyst fuses the
whole thing into a single whole-stage-codegen pass — explode, projection,
casts, label cleanup and day-truncation never materialize intermediates.

Pipeline (wire matrix → stored records):

    explode(values)              A7  executor.go:287-363
    arity/parse validation       A12 executor.go:305-342 (skip, count)
    name fallback / projection   A8  executor.go:230-284
    drop __name__ label          A9  executor.go:259-264
    string→double cast           A10 executor.go:253,334
    epoch→timestamp cast         A11 executor.go:273,280,345
    collected_at day-truncation  A13 executor.go:404-461
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prom_etl_db_spark.timeparse import RelativeTimeParser

INTERNAL_LABELS = ("__name__",)


def drop_internal_labels(labels: Column) -> Column:
    """A9: remove ``__name__`` (and any future internal labels) from the
    label map — `executor.go:259-264`."""
    return F.map_filter(labels, lambda k, _: ~k.isin(*INTERNAL_LABELS))


def explode_matrix(matrix_df: DataFrame) -> DataFrame:
    """A7: one row per (series, timestep) from wire-shape
    ``(metric, values=[[ts,"val"],...])``."""
    return matrix_df.select(
        F.col("metric"), F.explode(F.col("values")).alias("pair")
    )


def quarantine_malformed(pairs_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A12: split exploded pairs into (valid, quarantined).

    The reference logs-and-skips rows with wrong arity or unparseable
    ts/value (`executor.go:305-342`); we keep the rejects as a DataFrame so
    the audit record can count them (parity with its warn-log visibility).
    """
    # try_cast: ANSI-mode cast of a malformed string throws; the reference
    # warn-logs and skips instead, which is exactly try_cast-to-null + filter.
    ok = (
        (F.size(F.col("pair")) == 2)
        & F.col("pair")[1].try_cast("double").isNotNull()
        & F.col("pair")[0].try_cast("double").isNotNull()
    )
    return pairs_df.where(ok), pairs_df.where(~ok)


def collected_at_col(
    ts: Column,
    time_range_type: str | None,
    *,
    now: datetime,
    time_expr: str | None = None,
    start_expr: str | None = None,
    end_expr: str | None = None,
) -> Column:
    """A13: the reference's ``calculateCollectedAt`` (`executor.go:404-461`)
    as a Column expression, with ``now`` always explicit (the mutable-now
    design caused the reference's production freeze, SURVEY.md §7.3).

    - range + same-day window  → that day's start for every point
    - range + cross-day window → each point's own day start
    - instant + yesterday[_end] → yesterday's day start
    - otherwise                → each point's own day start
    """
    parser = RelativeTimeParser(now)
    point_day = F.date_trunc("DAY", ts)

    if time_range_type == "range" and start_expr and end_expr:
        try:
            start, end = parser.resolve_range(start_expr, end_expr)
        except Exception:
            return point_day
        if start.date() == end.date():
            return F.lit(datetime.combine(start.date(), datetime.min.time()))
        return point_day

    if time_range_type == "instant" and time_expr in ("yesterday", "yesterday_end"):
        q = parser.parse(time_expr)
        return F.lit(datetime.combine(q.date(), datetime.min.time()))

    return point_day


def normalize_matrix(
    matrix_df: DataFrame,
    query_id: str,
    *,
    now: datetime,
    time_range_type: str | None = "range",
    time_expr: str | None = None,
    start_expr: str | None = None,
    end_expr: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full wire-matrix → MetricRecord chain (A7..A13).

    Returns (records, quarantined). ``records`` matches METRICS_SCHEMA plus
    the derived ``collected_date`` partition column.
    """
    exploded = explode_matrix(matrix_df)
    valid, bad = quarantine_malformed(exploded)

    ts = F.timestamp_seconds(F.col("pair")[0].try_cast("double"))  # A11
    records = valid.select(
        F.lit(query_id).alias("query_id"),
        # A8: __name__ fallback to query_id (executor.go:232-235)
        F.coalesce(F.element_at(F.col("metric"), "__name__"), F.lit(query_id)).alias(
            "metric_name"
        ),
        drop_internal_labels(F.col("metric")).alias("labels"),  # A9
        F.col("pair")[1].try_cast("double").alias("value"),  # A10
        ts.alias("timestamp"),
        F.lit("range" if time_range_type == "range" else "instant").alias("result_type"),
        collected_at_col(
            ts,
            time_range_type,
            now=now,
            time_expr=time_expr,
            start_expr=start_expr,
            end_expr=end_expr,
        ).alias("collected_at"),
    ).withColumn("collected_date", F.to_date(F.col("collected_at")))
    return records, bad


def normalize_vector(
    vector_df: DataFrame,
    query_id: str,
    *,
    now: datetime,
    time_expr: str | None = None,
    result_type: str = "instant",
) -> DataFrame:
    """Wire-vector → MetricRecord chain (A8..A13; vector path of
    `executor.go:122-129`). Scalar results are a 1-row vector with
    ``result_type='scalar'`` (A4, `client.go:287-298`)."""
    ts = F.timestamp_seconds(F.col("ts"))
    valid = vector_df.where(F.col("value").try_cast("double").isNotNull())  # A12
    return valid.select(
        F.lit(query_id).alias("query_id"),
        F.coalesce(F.element_at(F.col("metric"), "__name__"), F.lit(query_id)).alias(
            "metric_name"
        ),
        drop_internal_labels(F.col("metric")).alias("labels"),
        F.col("value").try_cast("double").alias("value"),
        ts.alias("timestamp"),
        F.lit(result_type).alias("result_type"),
        collected_at_col(ts, "instant", now=now, time_expr=time_expr).alias(
            "collected_at"
        ),
    ).withColumn("collected_date", F.to_date(F.col("collected_at")))


def events_as_metric_records(events_df: DataFrame, query_id: str = "events_ingest") -> DataFrame:
    """Map the driver's ``events`` fixture into the MetricRecord shape
    (FIXTURES.md §2): event_type→metric_name, props JSON + user_id→labels,
    value→value, ts→timestamp; collected_at = each point's day start (the
    A13 default branch — no time-range config)."""
    # null props would null the whole map_concat — treat missing props as {};
    # and a props JSON that itself contains "user_id" must be dropped first:
    # map_concat with a duplicate key throws under Spark's default
    # EXCEPTION dedup policy, failing the whole batch for one such row
    # (the typed user_id column is authoritative)
    labels = F.map_concat(
        F.map_filter(
            F.from_json(
                F.coalesce(F.col("props"), F.lit("{}")), "map<string,string>"
            ),
            lambda k, _: k != "user_id",
        ),
        F.create_map(F.lit("user_id"), F.col("user_id").cast("string")),
    )
    return events_df.select(
        F.lit(query_id).alias("query_id"),
        F.col("event_type").alias("metric_name"),
        labels.alias("labels"),
        F.col("value").try_cast("double").alias("value"),
        F.col("ts").alias("timestamp"),
        F.lit("instant").alias("result_type"),
        F.date_trunc("DAY", F.col("ts")).alias("collected_at"),
    ).withColumn("collected_date", F.to_date(F.col("collected_at")))
