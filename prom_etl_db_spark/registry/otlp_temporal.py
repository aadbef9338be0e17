"""Registry section: OTLP aggregation-temporality normalization
(later r8) — the delta→cumulative conversion Prometheus's own OTLP
endpoint performs behind its ``otlp-deltatocumulative`` feature flag.

Reference tie-in: the reference persists cumulative counters from its
Prometheus backend (internal/executor/executor.go); an engine
ingesting OTLP directly meets DELTA sums on the wire (the default for
several OTel SDK runtimes) and must normalize them before any
rate/increase math — silently treating deltas as cumulative halves or
inflates every downstream rate."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from prom_etl_db_spark.operators import promql
from prom_etl_db_spark.registry.core import _events, register

_T0NS = 1706572800_000_000_000


@register(
    "otlp_delta_to_cumulative",
    oracle="""
SELECT event_id AS push_id, event_type AS metric_name,
  unnest([CAST(1706572800000000000 AS BIGINT),
          CAST(1706572801000000000 AS BIGINT),
          CAST(1706572802000000000 AS BIGINT)]) AS ts_nano,
  unnest([round(CAST(user_id % 7 + 1 AS DOUBLE), 4),
          round(CAST(user_id % 7 + 1 AS DOUBLE)
                + CAST(user_id % 3 AS DOUBLE), 4),
          round(CAST(user_id % 7 + 1 AS DOUBLE)
                + CAST(user_id % 3 AS DOUBLE)
                + CAST(user_id % 4 AS DOUBLE), 4)]) AS cum_value
FROM events
""",
)
def otlp_delta_to_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporality normalization, differential by construction: the
    u-even slice pushes DELTA sums (temporality=1, point values a, b,
    c) and the u-odd slice pushes the equivalent CUMULATIVE series
    (temporality=2, values a, a+b, a+b+c). After
    ``otlp_delta_to_cumulative`` both slices must read identically —
    one uniform oracle covers the accumulate path and the passthrough
    path, so a bug in either (double-accumulating a cumulative stream,
    passing a delta stream through) breaks the hash. Plan: one
    mapInPandas decode → two window functions over ONE series
    partitioning (a single shuffle)."""
    from prom_etl_db_spark.functions import otlp as O

    ev = _events(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(name: pd.Series, eid: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, e, u in zip(name, eid, user):
            u = int(u)
            a, b, c = float(u % 7 + 1), float(u % 3), float(u % 4)
            if u % 2 == 0:
                temp, vals = 1, [a, b, c]  # deltas
            else:
                temp, vals = 2, [a, a + b, a + b + c]  # cumulative
            out.append(O.encode_export_metrics([{
                "resource": {},
                "scopes": [{"name": "app", "version": "1", "metrics": [{
                    "name": n, "unit": "1", "type": "sum",
                    "temporality": temp, "is_monotonic": True,
                    "points": [
                        {"attrs": {"eid": str(int(e))},
                         "time_unix_nano": _T0NS + i * 1_000_000_000,
                         "value": v}
                        for i, v in enumerate(vals)
                    ],
                }]}],
            }]))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "event_id", "user_id").alias("body"),
    )
    pts = O.otlp_samples(payloads)
    cum = promql.otlp_delta_to_cumulative(
        pts, series_cols=("push_id", "metric_name"))
    return cum.select(
        "push_id",
        "metric_name",
        F.col("time_unix_nano").alias("ts_nano"),
        F.round("value_double", 4).alias("cum_value"),
    )
