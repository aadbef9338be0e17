"""Flagship (entry smoke): the reference's production GPU-utilization query
re-expressed natively (migrate.sql:105)."""

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
# Flagship (entry smoke): the reference's production GPU-utilization query
# re-expressed natively (migrate.sql:105 — sum by(sum_over_time(max
# without(...)(m != bool T)[24h:1m])) * 60 / 3600).
# =========================================================================


@register(
    "flagship_gpu_utilization",
    oracle=f"""
WITH samples AS (
  SELECT json_extract_string(props, '$.k') AS k, user_id,
         date_trunc('minute', ts) AS bucket_start,
         CASE WHEN value != 20.0 THEN 1.0 ELSE 0.0 END AS v
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-30 00:00:00'
    AND ts < TIMESTAMP '2024-01-31 00:00:00'
), stepmax AS (
  SELECT k, bucket_start, max(v) AS v FROM samples GROUP BY k, bucket_start
), sot AS (
  SELECT k, sum(v) AS v FROM stepmax GROUP BY k
)
SELECT k, v * 60 / 3600 AS utilization_hours FROM sot
""",
)
def flagship_gpu_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2+B3+B5+B6+B7 composite over one day at 1-minute steps.

    'purchase' plays kpanda_gpu_pod_utilization; `!= bool 20` plays the
    sentinel filter; `max without (user_id)` collapses the per-user series;
    sum_over_time over the [24h:1m] frame; regroup by k; * 60 / 3600.
    """
    day0, day1 = FLAGSHIP_DAY, FLAGSHIP_DAY + timedelta(days=1)
    samples = _event_samples(spark, sf_dir, keys=("k", "user_id")).where(
        (F.col("metric_name") == "purchase")
        & (F.col("timestamp") >= F.lit(day0))
        & (F.col("timestamp") < F.lit(day1))
    )
    flagged = promql.bool_cmp(samples, "!=", 20.0)
    bucketed = flagged.withColumn(
        "bucket_start", F.window(F.col("timestamp"), "1 minute")["start"]
    )
    stepmax = promql.max_without(bucketed, ["user_id"], extra_keys=["bucket_start"])
    sot = promql.sum_over_time(stepmax)
    total = promql.sum_by(sot, ["k"])
    return total.select(
        F.element_at("labels", "k").alias("k"),
        (F.col("value") * 60 / 3600).alias("utilization_hours"),
    )


