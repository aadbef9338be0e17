"""Registry section: OTLP Summary data points (r9 — the last OTLP
point shape; it previously refused).

Reference tie-in: the reference's Prometheus backend is fed by
client_golang instrumentations (internal/prometheus/client.go:63-161
pulls whatever those expose), and client_golang Summaries bridged
through an OTLP exporter arrive as SummaryDataPoint — an engine
claiming the ingestion surface must decode them.

Semantics boundary (mirrors functions/otlp.py): the φ-quantile
(quantile, value) pairs are the SENDER's sketch output — data rows,
never inputs to rate/rollup algebra (quantiles of quantiles are not
quantiles, and averaging φ-values across series is statistically
meaningless — the classic summary-vs-histogram caveat). count/sum,
by contrast, are cumulative monotonic counters and ride the same
counter-increase algebra as any other counter — the second query
proves that composition with Prometheus's reset rule."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from prom_etl_db_spark.registry.core import _events_wide, register

_T0NS = 1706572800_000_000_000


def _summary_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two cumulative summary points per event: count/sum grow
    monotonically except the u%5==0 slice, whose second point RESETS
    (process restart) — exercising the counter-reset rule in the
    composition query. Quantile values are closed-form in user_id so
    the DuckDB oracle replays them exactly."""
    from prom_etl_db_spark.functions import otlp as O

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(name: pd.Series, eid: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, e, u in zip(name, eid, user):
            u = int(u)
            c1, s1 = u % 9 + 1, float(u % 9 + 1) * 1.5
            if u % 5 == 0:  # reset: the process restarted
                c2, s2 = u % 3 + 1, float(u % 3 + 1) * 1.5
            else:
                c2, s2 = c1 + u % 4, s1 + float(u % 4) * 1.5
            pts = []
            for i, (c, s) in enumerate(((c1, s1), (c2, s2))):
                pts.append({
                    "attrs": {"eid": str(int(e))},
                    "time_unix_nano": _T0NS + i * 1_000_000_000,
                    "start_time_unix_nano": _T0NS - 1_000_000_000,
                    "count": c,
                    "sum": s,
                    "quantiles": [
                        (0.5, float(u % 7) * 0.25),
                        (0.9, float(u % 7) * 0.25 + float(u % 3) * 0.5),
                        (0.99, float(u % 7) * 0.25 + float(u % 3) * 0.5
                         + float(i)),
                    ],
                })
            out.append(O.encode_export_metrics([{
                "resource": {},
                "scopes": [{"name": "app", "version": "1", "metrics": [{
                    "name": n, "unit": "s", "type": "summary",
                    "points": pts,
                }]}],
            }]))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    return ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "event_id", "user_id").alias("body"),
    )


@register(
    "otlp_summary_decode",
    oracle="""
WITH q AS (
  SELECT event_id, event_type, user_id,
    CAST(user_id % 7 AS DOUBLE) * 0.25 AS q50,
    CAST(user_id % 7 AS DOUBLE) * 0.25
      + CAST(user_id % 3 AS DOUBLE) * 0.5 AS q90
  FROM events
)
SELECT event_id AS push_id, event_type AS metric_name,
  CAST(1706572801000000000 AS BIGINT) AS ts_nano,
  CAST(CASE WHEN user_id % 5 = 0 THEN user_id % 3 + 1
       ELSE user_id % 9 + 1 + user_id % 4 END AS BIGINT) AS scnt,
  round(CAST(CASE WHEN user_id % 5 = 0 THEN user_id % 3 + 1
        ELSE user_id % 9 + 1 + user_id % 4 END AS DOUBLE) * 1.5,
        4) AS ssum,
  unnest([0.5e0, 0.9e0, 0.99e0]) AS phi,
  unnest([round(q50, 4), round(q90, 4), round(q90 + 1.0, 4)]) AS qvalue
FROM q
""",
)
def otlp_summary_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary decode end-to-end: the LAST point per series surfaces
    count/sum plus its exploded φ-quantile pairs as typed rows —
    proto fields SummaryDataPoint.{count=4,sum=5,quantile_values=6}
    via the shared wire walk. Plan: one mapInPandas decode → pure
    Column explode, zero shuffle."""
    from prom_etl_db_spark.functions import otlp as O

    pts = O.otlp_samples(_summary_payloads(spark, sf_dir))
    last = pts.where(
        (F.col("data_type") == "summary")
        & (F.col("time_unix_nano") == _T0NS + 1_000_000_000)
    )
    return last.select(
        F.col("push_id"),
        "metric_name",
        F.col("time_unix_nano").alias("ts_nano"),
        F.col("count").alias("scnt"),
        F.round("sum", 4).alias("ssum"),
        F.explode("quantile_values").alias("qv"),
    ).select(
        "push_id", "metric_name", "ts_nano", "scnt", "ssum",
        F.col("qv.quantile").alias("phi"),
        F.round(F.col("qv.value"), 4).alias("qvalue"),
    )


@register(
    "otlp_summary_count_rate",
    oracle="""
WITH c AS (
  SELECT event_id, event_type,
    CAST(user_id % 9 + 1 AS BIGINT) AS c1,
    CAST(CASE WHEN user_id % 5 = 0 THEN user_id % 3 + 1
         ELSE user_id % 9 + 1 + user_id % 4 END AS BIGINT) AS c2
  FROM events
)
SELECT event_id AS push_id, event_type AS metric_name,
  CASE WHEN c2 < c1 THEN c2 ELSE c2 - c1 END AS inc_count,
  round(CAST(CASE WHEN c2 < c1 THEN c2 ELSE c2 - c1 END AS DOUBLE)
        * 1.5, 4) AS inc_sum
FROM c
""",
)
def otlp_summary_count_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition the decode enables: summary count/sum ARE
    cumulative counters, so ``increase()`` applies with Prometheus's
    reset rule (a drop means restart → the increase is the last value
    verbatim). The u%5==0 slice resets mid-window; the oracle replays
    the DETECTION rule (c2 < c1), not the generating intent — a reset
    that lands at-or-above the prior value is invisible to any
    counter algebra (Prometheus's own blind spot, kept honestly). The φ-quantile columns are
    deliberately absent here — they do not rate (module docstring).
    Plan: decode → one hash agg (min_by/max_by struct argmin/argmax
    over the series) — a single shuffle."""
    from prom_etl_db_spark.functions import otlp as O

    pts = O.otlp_samples(_summary_payloads(spark, sf_dir)).where(
        F.col("data_type") == "summary"
    )
    agg = pts.groupBy("push_id", "metric_name").agg(
        F.min_by(
            F.struct("count", "sum"), "time_unix_nano"
        ).alias("first"),
        F.max_by(
            F.struct("count", "sum"), "time_unix_nano"
        ).alias("last"),
    )
    reset = F.col("last.count") < F.col("first.count")
    inc_count = F.when(reset, F.col("last.count")).otherwise(
        F.col("last.count") - F.col("first.count")
    )
    inc_sum = F.when(reset, F.col("last.sum")).otherwise(
        F.col("last.sum") - F.col("first.sum")
    )
    return agg.select(
        "push_id",
        "metric_name",
        inc_count.alias("inc_count"),
        F.round(inc_sum, 4).alias("inc_sum"),
    )
