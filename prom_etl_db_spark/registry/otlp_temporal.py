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
from prom_etl_db_spark.registry.core import _events_wide, register

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

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

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


@register(
    "otlp_delta_hist_quantile",
    oracle="""
WITH h AS (
  SELECT event_id, event_type, user_id,
    CAST(user_id % 3 + 1 AS DOUBLE) * 0.5 AS le0,
    5.0 + CAST(user_id % 4 AS DOUBLE) AS le1,
    CAST(user_id % 3 + 1 AS BIGINT) + CAST(user_id % 2 + 1 AS BIGINT) AS c0,
    CAST(user_id % 4 AS BIGINT) + CAST(user_id % 3 AS BIGINT) AS c1,
    CAST(user_id % 2 AS BIGINT) + 1 AS c2
  FROM events
), b AS (
  SELECT event_id, event_type,
    unnest([le0, le1, 'inf'::DOUBLE]) AS le,
    unnest([c0, c0 + c1, c0 + c1 + c2]) AS cum
  FROM h
), w AS (
  SELECT *,
    lag(cum) OVER (PARTITION BY event_id ORDER BY le) AS prev_cum,
    lag(le)  OVER (PARTITION BY event_id ORDER BY le) AS prev_le,
    max(cum) OVER (PARTITION BY event_id) * 0.5 AS target
  FROM b
), crossing AS (
  SELECT * FROM w
  WHERE cum >= target AND (prev_cum IS NULL OR prev_cum < target)
)
SELECT event_id AS push_id, event_type AS metric_name,
  round(CASE WHEN le = 'inf'::DOUBLE THEN prev_le
        ELSE coalesce(prev_le, 0.0)
             + (le - coalesce(prev_le, 0.0))
               * (target - coalesce(prev_cum, 0.0))
               / (cum - coalesce(prev_cum, 0.0)) END, 6) AS p50
FROM crossing
""",
)
def otlp_delta_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta CLASSIC histograms end-to-end: two delta points per
    series accumulate bucket-wise (``otlp_delta_hist_to_cumulative``),
    then the LAST point's cumulative le-buckets feed
    ``histogram_quantile`` at q=0.5 — the full path a Prometheus-side
    reader needs for an OTel SDK exporting delta histograms. The
    oracle replays the summed bucket cumulatives + interpolation.
    Plan: one mapInPandas decode → one window partitioning (running
    zip_with fold) → le posexplode → one window per histogram."""
    from prom_etl_db_spark.functions import otlp as O

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(name: pd.Series, eid: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, e, u in zip(name, eid, user):
            u = int(u)
            bounds = [(u % 3 + 1) * 0.5, 5.0 + (u % 4)]
            p1 = [u % 3 + 1, u % 4, u % 2]
            p2 = [u % 2 + 1, u % 3, 1]
            pts = []
            for i, counts in enumerate((p1, p2)):
                pts.append({
                    "attrs": {"eid": str(int(e))},
                    "time_unix_nano": _T0NS + i * 1_000_000_000,
                    "count": sum(counts),
                    "sum": float(sum(counts)) * 2.0,
                    "bucket_counts": counts,
                    "explicit_bounds": bounds,
                })
            out.append(O.encode_export_metrics([{
                "resource": {},
                "scopes": [{"name": "app", "version": "1", "metrics": [{
                    "name": n, "unit": "s", "type": "histogram",
                    "temporality": 1,
                    "points": pts,
                }]}],
            }]))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "event_id", "user_id").alias("body"),
    )
    pts = O.otlp_samples(payloads)
    cum = promql.otlp_delta_hist_to_cumulative(
        pts, series_cols=("push_id", "metric_name"))
    last = cum.where(F.col("time_unix_nano") == _T0NS + 1_000_000_000)
    les = F.concat(
        F.transform(
            F.col("explicit_bounds"), lambda b: b.cast("string")),
        F.array(F.lit("+Inf")),
    )
    cums = F.slice(
        F.aggregate(
            F.col("bucket_counts"),
            F.array(F.lit(0).cast("double")),
            lambda acc, x: F.concat(
                acc, F.array(F.element_at(acc, -1) + x.cast("double"))),
        ),
        2,
        F.size("bucket_counts").cast("int"),
    )
    buckets = last.select(
        "metric_name",
        F.col("push_id").cast("string").alias("eid"),
        F.explode(F.arrays_zip(les.alias("le"), cums.alias("cum"))).alias("z"),
    ).select(
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("eid"), F.lit("le")),
            F.array(
                F.concat(F.col("metric_name"), F.lit("_bucket")),
                F.col("eid"),
                F.col("z.le"),
            ),
        ).alias("labels"),
        F.col("z.cum").cast("double").alias("value"),
    )
    hq = promql.histogram_quantile(buckets, 0.5)
    return hq.select(
        F.col("labels")["eid"].cast("long").alias("push_id"),
        F.regexp_replace(
            F.col("labels")["__name__"], "_bucket$", ""
        ).alias("metric_name"),
        F.round("value", 6).alias("p50"),
    )


@register(
    "otlp_delta_exp_quantile",
    oracle="""
WITH h AS (
  SELECT event_id, event_type, user_id,
    CAST(user_id % 3 AS INT) AS s,
    CAST(user_id % 4 - 1 AS INT) AS o,
    CAST(user_id % 3 + 1 AS BIGINT) + CAST(user_id % 2 + 1 AS BIGINT) AS c1,
    CAST(user_id % 4 AS BIGINT) + CAST(user_id % 3 AS BIGINT) AS c2,
    CAST(user_id % 2 AS BIGINT) + 1 AS z
  FROM events
), b AS (
  SELECT event_id, event_type,
    unnest([power(2.0, (o + 0) * power(2.0, -s)),
            power(2.0, (o + 1) * power(2.0, -s)),
            power(2.0, (o + 2) * power(2.0, -s)),
            'inf'::DOUBLE]) AS le,
    unnest([z, z + c1, z + c1 + c2, z + c1 + c2]) AS cum
  FROM h
), w AS (
  SELECT *,
    lag(cum) OVER (PARTITION BY event_id ORDER BY le) AS prev_cum,
    lag(le)  OVER (PARTITION BY event_id ORDER BY le) AS prev_le,
    max(cum) OVER (PARTITION BY event_id) * 0.9 AS target
  FROM b
), crossing AS (
  SELECT * FROM w
  WHERE cum >= target AND (prev_cum IS NULL OR prev_cum < target)
)
SELECT event_id AS push_id, event_type AS metric_name,
  round(CASE WHEN le = 'inf'::DOUBLE THEN prev_le
        ELSE coalesce(prev_le, 0.0)
             + (le - coalesce(prev_le, 0.0))
               * (target - coalesce(prev_cum, 0.0))
               / (cum - coalesce(prev_cum, 0.0)) END, 6) AS p90
FROM crossing
""",
)
def otlp_delta_exp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta EXPONENTIAL histograms end-to-end: two delta points per
    series accumulate with the scale-aware merge
    (``otlp_delta_exp_hist_to_cumulative`` — this gate fixture keeps
    scales equal so the oracle stays closed-form; the scale-CHANGE
    downscale path is unit-pinned in tests/test_adversarial_r8_late),
    then the last cumulative point maps onto classic le-buckets
    (base = 2^(2^-scale), the OTLP convention) for
    ``histogram_quantile`` at q=0.9. Plan: decode (mapInPandas) → one
    window partitioning (struct fold) → le posexplode → one window per
    histogram."""
    from prom_etl_db_spark.functions import otlp as O

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(name: pd.Series, eid: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, e, u in zip(name, eid, user):
            u = int(u)
            pts = []
            for i, (counts, z) in enumerate((
                ([u % 3 + 1, u % 4], u % 2),
                ([u % 2 + 1, u % 3], 1),
            )):
                pts.append({
                    "attrs": {"eid": str(int(e))},
                    "time_unix_nano": _T0NS + i * 1_000_000_000,
                    "count": z + sum(counts),
                    "scale": u % 3,
                    "zero_count": z,
                    "pos_offset": u % 4 - 1,
                    "pos_counts": counts,
                })
            out.append(O.encode_export_metrics([{
                "resource": {},
                "scopes": [{"name": "app", "version": "1", "metrics": [{
                    "name": n, "type": "exponential_histogram",
                    "temporality": 1, "points": pts,
                }]}],
            }]))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "event_id", "user_id").alias("body"),
    )
    pts = O.otlp_samples(payloads)
    cum = promql.otlp_delta_exp_hist_to_cumulative(
        pts, series_cols=("push_id", "metric_name"))
    last = cum.where(F.col("time_unix_nano") == _T0NS + 1_000_000_000)
    inv = F.pow(F.lit(2.0), -F.col("scale").cast("double"))
    les = F.concat(
        F.transform(
            F.sequence(F.lit(0), F.size("pos_counts")),
            lambda i: F.pow(
                F.lit(2.0),
                (F.col("pos_offset").cast("double") + i.cast("double"))
                * inv,
            ).cast("string"),
        ),
        F.array(F.lit("+Inf")),
    )
    cums = F.concat(
        F.aggregate(
            F.col("pos_counts"),
            F.array(F.col("zero_count")),
            lambda acc, x: F.concat(
                acc, F.array(F.try_element_at(acc, F.lit(-1)) + x)
            ),
        ),
        F.array(F.col("count")),
    )
    buckets = last.select(
        "metric_name",
        F.col("push_id").cast("string").alias("eid"),
        F.explode(F.arrays_zip(les.alias("le"), cums.alias("cum"))).alias("z"),
    ).select(
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("eid"), F.lit("le")),
            F.array(
                F.concat(F.col("metric_name"), F.lit("_bucket")),
                F.col("eid"),
                F.col("z.le"),
            ),
        ).alias("labels"),
        F.col("z.cum").cast("double").alias("value"),
    )
    hq = promql.histogram_quantile(buckets, 0.9)
    return hq.select(
        F.col("labels")["eid"].cast("long").alias("push_id"),
        F.regexp_replace(
            F.col("labels")["__name__"], "_bucket$", ""
        ).alias("metric_name"),
        F.round("value", 6).alias("p90"),
    )
