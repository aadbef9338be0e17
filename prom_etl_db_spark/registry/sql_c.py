"""SURVEY.md §2.C — the documented downstream SQL surface (label
extraction, rollups, reports, success rates)."""

from __future__ import annotations

from datetime import datetime, timedelta  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from prom_etl_db_spark import store  # noqa: F401
from prom_etl_db_spark.functions import (  # noqa: F401
    clustering,
    decontam,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
from prom_etl_db_spark.operators import analytics, promql  # noqa: F401
from prom_etl_db_spark.registry.core import (  # noqa: F401
    FLAGSHIP_DAY,
    NOW,
    _event_samples,
    _events,
    _t,
    register,
)
from prom_etl_db_spark.timeparse import RelativeTimeParser  # noqa: F401


# =========================================================================
# C — downstream SQL surface
# =========================================================================


@register(
    "label_extract",
    oracle="""
SELECT event_id, event_type, json_extract_string(props,'$.k') AS label_k, value
FROM events
""",
)
def label_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: JSON_UNQUOTE(JSON_EXTRACT(labels,'$.k'))."""
    return analytics.label_extract(_events(spark, sf_dir))


@register(
    "label_filter_slice",
    oracle="""
SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
WHERE json_extract_string(props,'$.k') = '42'
""",
)
def label_filter_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: equality filter on an extracted JSON label."""
    return analytics.label_filter_slice(_events(spark, sf_dir), "k", "42")


@register(
    "substring_prefix",
    oracle="""
SELECT p_partkey,
       array_to_string((string_split(p_name, ' '))[1:2], ' ') AS name_prefix
FROM part
""",
)
def substring_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: SUBSTRING_INDEX(name, ' ', 2)."""
    return analytics.substring_index_prefix(_t(spark, sf_dir, "part"))


@register(
    "hourly_rollup",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY CAST(date_trunc('hour', ts) AS TIMESTAMP), event_type
""",
)
def hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3+C4: hourly per-type rollup (user-guide.md:248-257)."""
    return analytics.hourly_rollup(_events(spark, sf_dir))


@register(
    "time_window_scan",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
WHERE ts >= TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 24 HOUR
""",
)
def time_window_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: timestamp >= now() - INTERVAL 24 HOUR (frozen now)."""
    return analytics.time_window_scan(_events(spark, sf_dir), NOW, 24)


@register(
    "daily_report",
    oracle="""
SELECT k, day, round(total_value, 3) AS total_value FROM (
  SELECT json_extract_string(props,'$.k') AS k,
         CAST(ts AS DATE) AS day, sum(value) AS total_value
  FROM events GROUP BY json_extract_string(props,'$.k'), CAST(ts AS DATE)
) aaa
""",
)
def daily_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7+C9+C11: the GPU-daily report shape (query_gpu_daily.sql:1-28) —
    derived-table subquery, SUM, ROUND."""
    return analytics.daily_report(_events(spark, sf_dir))


@register(
    "success_rate",
    oracle="""
SELECT event_type, count(*) AS total,
       count(CASE WHEN value > 10.0 THEN 1 END) AS high_value,
       round(100.0 * count(CASE WHEN value > 10.0 THEN 1 END) / count(*), 2)
         AS high_value_pct
FROM events GROUP BY event_type
""",
)
def success_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: conditional aggregation + percentage (user-guide.md:333-346)."""
    return analytics.success_rate(_events(spark, sf_dir))


@register(
    "per_key_stats",
    oracle="""
SELECT event_type, count(*) AS records, CAST(min(ts) AS TIMESTAMP) AS earliest,
       CAST(max(ts) AS TIMESTAMP) AS latest,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type
""",
)
def per_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12+C13: per-key freshness & stats (user-guide.md:277-285)."""
    return analytics.per_key_stats(_events(spark, sf_dir))




# --- r6: range-join binning + SCD2 ------------------------------------------

from prom_etl_db_spark.operators.joins import interval_overlap_join, scd2_intervals  # noqa: E402


@register(
    "sessions_incident_overlap",
    oracle="""
WITH s AS (
  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS s_start,
         min(CAST(ts AS TIMESTAMP)) + ((user_id % 5) + 1) * INTERVAL 1 HOUR AS s_end
  FROM events GROUP BY user_id
), i AS (
  SELECT event_id AS incident_id,
         CAST(ts AS TIMESTAMP) - INTERVAL 2 HOUR AS i_start,
         CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS i_end
  FROM events WHERE event_id % 97 = 0
)
SELECT s.user_id, i.incident_id,
  CAST(floor(epoch(least(s.s_end, i.i_end)) - epoch(greatest(s.s_start, i.i_start)))
       AS BIGINT) AS overlap_seconds
FROM s JOIN i ON s.s_start < i.i_end AND i.i_start < s.s_end
""",
)
def sessions_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-extension (r6): interval-OVERLAP join by the range-join
    binning technique — per-user activity windows × global incident
    windows. Catalyst can only run an inequality join as
    BroadcastNestedLoop (quadratic); here both interval sets replicate
    onto day chunks, chunk equality is the JOIN KEY, the exact overlap
    predicate filters within chunks, and each true pair survives only
    in the chunk holding max(starts) — dedup as a filter, not a
    DISTINCT over the fan-out. The oracle is the definitional
    nested-loop overlap join (DuckDB handles it at fixture scale);
    overlap lengths are exact integer seconds. See
    operators/joins.interval_overlap_join."""
    ev = _events(spark, sf_dir)
    t = F.col("ts")
    sessions = ev.groupBy("user_id").agg(F.min("ts").alias("s_start")).select(
        "user_id",
        "s_start",
        F.expr(
            "s_start + make_interval(0, 0, 0, 0, CAST(user_id % 5 + 1 AS INT), 0, 0)"
        ).alias("s_end"),
    )
    incidents = ev.where(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("incident_id"),
        F.expr("ts - make_interval(0, 0, 0, 0, 2, 0, 0)").alias("i_start"),
        F.expr("ts + make_interval(0, 0, 0, 0, 2, 0, 0)").alias("i_end"),
    )
    from prom_etl_db_spark.schema import epoch_seconds

    pairs = interval_overlap_join(
        sessions, incidents,
        left_start="s_start", left_end="s_end",
        right_start="i_start", right_end="i_end",
    )
    return pairs.select(
        "user_id",
        "incident_id",
        F.floor(
            epoch_seconds(F.least("s_end", "i_end"))
            - epoch_seconds(F.greatest("s_start", "i_start"))
        ).cast("long").alias("overlap_seconds"),
    )


@register(
    "events_scd2_intervals",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), runs AS (
  SELECT user_id, event_type, ts, event_id FROM o
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type,
  ts AS valid_from,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM runs
""",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-extension (r6): Type-2 slowly-changing-dimension intervals —
    per user, consecutive same-state rows collapse into runs, each run
    becomes [valid_from, valid_to) with the open current row flagged
    (the warehouse pattern every dimension table ships). Two per-key
    windows (lag change detection, lead interval close), deterministic
    (ts, event_id) tiebreak; output compresses to the number of actual
    state CHANGES. Oracle replays both windows verbatim. See
    operators/joins.scd2_intervals."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    out = scd2_intervals(
        ev,
        key_cols=("user_id",),
        ts_col="ts",
        state_cols=("event_type",),
        tiebreak_cols=("event_id",),
    )
    return out.select(
        "user_id", "event_type", "valid_from", "valid_to", "is_current"
    )
