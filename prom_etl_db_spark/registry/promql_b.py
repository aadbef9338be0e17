"""SURVEY.md §2.B — PromQL combinators (instant vectors, by/without
regrouping, subquery resample, bool/scalar arithmetic, LOCF step grids)."""

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
# B — PromQL combinators
# =========================================================================


@register(
    "promql_instant_vector",
    oracle="""
WITH windowed AS (
  SELECT event_type AS metric_name, user_id, json_extract_string(props,'$.k') AS k,
         value, ts,
         row_number() OVER (
           PARTITION BY event_type, user_id, json_extract_string(props,'$.k')
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE ts <= TIMESTAMP '2024-01-30 12:00:00'
    AND ts > TIMESTAMP '2024-01-30 06:00:00'
)
SELECT metric_name, user_id, k, value, CAST(ts AS TIMESTAMP) AS ts FROM windowed WHERE rn = 1
""",
)
def promql_instant_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: latest point per series within the staleness window (6 h here —
    the fixture is sparser than real Prometheus's 5 m)."""
    samples = _event_samples(spark, sf_dir)
    sel = promql.instant_selector(
        samples,
        None,
        datetime(2024, 1, 30, 12, 0, 0),
        staleness="6 hours",
        tiebreakers=["event_id"],
    )
    return sel.select(
        F.col("metric_name"),
        F.element_at("labels", "user_id").cast("long").alias("user_id"),
        F.element_at("labels", "k").alias("k"),
        F.col("value"),
        F.col("timestamp").alias("ts"),
    )


@register(
    "promql_sum_by",
    oracle="""
SELECT json_extract_string(props,'$.k') AS k, round(sum(value), 4) AS sum_value
FROM events GROUP BY json_extract_string(props,'$.k')
""",
)
def promql_sum_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: ``sum by (k)`` across all series."""
    samples = _event_samples(spark, sf_dir)
    out = promql.sum_by(samples, ["k"])
    return out.select(
        F.element_at("labels", "k").alias("k"), F.round("value", 4).alias("sum_value")
    )


@register(
    "promql_max_without",
    oracle="""
SELECT event_type AS name, json_extract_string(props,'$.k') AS k, max(value) AS max_value
FROM events GROUP BY event_type, json_extract_string(props,'$.k')
""",
)
def promql_max_without(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: ``max without (user_id)`` — collapse the user dimension."""
    samples = _event_samples(spark, sf_dir)
    out = promql.max_without(samples, ["user_id"])
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.col("value").alias("max_value"),
    )


@register(
    "promql_avg_by",
    oracle="""
SELECT CAST(user_id AS VARCHAR) AS user_id,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       count(*) AS n
FROM events GROUP BY CAST(user_id AS VARCHAR)
""",
)
def promql_avg_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: ``avg by (user_id)`` — hash-compared as exact decimal sum +
    count (avg = sum/n): a rounded double avg can land on a round-half
    boundary where the engines round apart (sf0.1 hits avg exactly
    56.20875; same policy as promql_avg_over_time). The avg itself is
    unit-tested in test_promql.py."""
    samples = _event_samples(spark, sf_dir)
    out = promql.group_by_labels(
        samples,
        F.struct(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        ),
        by=["user_id"],
    )
    return out.select(
        F.element_at("labels", "user_id").alias("user_id"),
        F.col("value.s").alias("sum_value"),
        F.col("value.n").alias("n"),
    )


@register(
    "promql_sum_over_time",
    oracle="""
WITH resampled AS (
  SELECT event_type AS name, json_extract_string(props,'$.k') AS k,
         time_bucket(INTERVAL '1 hour', ts) AS bucket_start, value,
         row_number() OVER (
           PARTITION BY event_type, json_extract_string(props,'$.k'),
                        time_bucket(INTERVAL '1 hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT name, k, round(sum(value), 4) AS sot_value
FROM resampled WHERE rn = 1 GROUP BY name, k
""",
)
def promql_sum_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: step-align to 1 h (last value per bucket), then sum the aligned
    series — ``sum_over_time(x[<frame>:1h])`` with the frame = full range."""
    samples = _event_samples(spark, sf_dir, keys=("name", "k"))
    stepped = promql.resample(samples, "1 hour", tiebreakers=["event_id"])
    out = promql.sum_over_time(stepped)
    return out.select(
        F.element_at("labels", "name").alias("name"),
        F.element_at("labels", "k").alias("k"),
        F.round("value", 4).alias("sot_value"),
    )


@register(
    "promql_bool_scalar_arith",
    oracle="""
SELECT event_type AS name,
       sum(CASE WHEN value > 15.0 THEN 1.0 ELSE 0.0 END) * 60 / 3600 AS busy_hours
FROM events GROUP BY event_type
""",
)
def promql_bool_scalar_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6+B7: ``sum by (name) (value > bool 15) * 60 / 3600``."""
    samples = _event_samples(spark, sf_dir, keys=("name",))
    flagged = promql.bool_cmp(samples, ">", 15.0)
    out = promql.sum_by(flagged, ["name"])
    return out.select(
        F.element_at("labels", "name").alias("name"),
        (F.col("value") * 60 / 3600).alias("busy_hours"),
    )


@register(
    "promql_gapfill_locf",
    oracle="""
WITH buckets AS (
  SELECT event_type AS name,
         time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS bucket_start,
         value,
         row_number() OVER (
           PARTITION BY event_type, time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP))
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type IN ('error', 'signup')
), stepped AS (
  SELECT name, bucket_start, value FROM buckets WHERE rn = 1
), bounds AS (
  SELECT name, min(bucket_start) AS lo, max(bucket_start) AS hi FROM stepped GROUP BY name
), grid AS (
  SELECT name, unnest(generate_series(lo, hi, INTERVAL '6 hours')) AS bucket_start
  FROM bounds
)
SELECT g.name, g.bucket_start,
       last_value(s.value IGNORE NULLS) OVER (
         PARTITION BY g.name ORDER BY g.bucket_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
FROM grid g LEFT JOIN stepped s ON s.name = g.name AND s.bucket_start = g.bucket_start
""",
)
def promql_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: densify a 6 h step grid per series and forward-fill gaps
    (PromQL staleness / last-observation-carried-forward)."""
    samples = _event_samples(spark, sf_dir, keys=("name",)).where(
        F.col("metric_name").isin("error", "signup")
    )
    stepped = promql.resample(samples, "6 hours", tiebreakers=["event_id"])
    filled = promql.gapfill_locf(stepped, "6 hours")
    return filled.select(
        F.element_at("labels", "name").alias("name"),
        F.col("bucket_start"),
        F.col("value"),
    )




@register(
    "promql_info_enrich",
    oracle="""
SELECT event_id,
  round(user_id * 0.5e0, 4) AS value,
  'i' || CAST(user_id % 50 AS VARCHAR) AS instance,
  'j' || CAST(user_id % 3 AS VARCHAR) AS job,
  CASE WHEN (user_id % 50) % 4 <> 3
       THEN 'c' || CAST((user_id % 50) % 5 AS VARCHAR) END AS cluster,
  CASE WHEN (user_id % 50) % 4 <> 3
       THEN 'e' || CAST((user_id % 50) % 2 AS VARCHAR) END AS env
FROM events
""",
)
def promql_info_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``info()`` (later r8 — Prometheus 3.x experimental,
    previously the ``* on(instance) group_left(...) target_info``
    idiom): samples join the info metric's DATA labels (cluster, env)
    through their identifying label; instances ≡ 3 (mod 4) carry no
    info series and pass through with NULL payload labels — info
    enrichment must never drop data. Conflicting info payloads and
    payload labels colliding with existing sample labels refuse loudly
    inside the operator (unit-pinned). Plan: one small distinct-agg on
    the info side → BROADCAST left join (info is per-target metadata,
    broadcast-class by construction) → map_concat."""
    ev = _events(spark, sf_dir).select("event_id", "user_id")
    u = F.col("user_id")
    inst = F.concat(F.lit("i"), (u % 50).cast("string"))
    samples = ev.select(
        "event_id",
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("instance"), F.lit("job")),
            F.array(
                F.lit("up"),
                inst,
                F.concat(F.lit("j"), (u % 3).cast("string")),
            ),
        ).alias("labels"),
        (u.cast("double") * 0.5).alias("value"),
    )
    info = (
        ev.select((u % 50).alias("i"))
        .where(F.col("i") % 4 != 3)
        .distinct()
        .select(
            F.map_from_arrays(
                F.array(F.lit("__name__"), F.lit("instance"),
                        F.lit("cluster"), F.lit("env")),
                F.array(
                    F.lit("target_info"),
                    F.concat(F.lit("i"), F.col("i").cast("string")),
                    F.concat(F.lit("c"), (F.col("i") % 5).cast("string")),
                    F.concat(F.lit("e"), (F.col("i") % 2).cast("string")),
                ),
            ).alias("labels"),
            F.lit(1.0).alias("value"),
        )
    )
    out = promql.info_enrich(samples, info, identifying=("instance",))
    return out.select(
        "event_id",
        F.round("value", 4).alias("value"),
        F.col("labels")["instance"].alias("instance"),
        F.col("labels")["job"].alias("job"),
        F.col("labels")["cluster"].alias("cluster"),
        F.col("labels")["env"].alias("env"),
    )
