"""Registry section: text-exposition (OpenMetrics) parsing — the
format Prometheus metrics are BORN in (later r8; the parser itself
shipped earlier but was unit-gated only).

Reference tie-in: the reference's samples all originate as text
exposition scraped by its Prometheus backend (migrate.sql's metrics
are standard exporter output); parsing scrape dumps directly is the
A-family source the reference delegates to Prometheus.

Both queries build the exposition LINES with pure Column concat (no
UDF) and parse them with the whole-stage-codegen regex projections —
wire-in to wire-out without leaving the JVM."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prom_etl_db_spark.registry.core import _events, register
from prom_etl_db_spark.sources.openmetrics import (
    parse_exposition_exemplars,
    parse_exposition_lines,
)

_T0S = 1706572800  # fixture epoch (s)


def _lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exposition line per event; the u-even half carries an
    exemplar tail, the odd half none (most samples carry none)."""
    ev = _events(spark, sf_dir).select("event_id", "event_type", "user_id")
    u = F.col("user_id")
    base = F.concat(
        F.col("event_type"),
        F.lit('_total{user="'), u.cast("string"),
        F.lit('",code="'), (F.lit(200) + (u % 3) * 100).cast("string"),
        F.lit('"} '),
        (u.cast("double") * 0.5).cast("string"),
        F.lit(" "),
        (F.lit(_T0S) + u % 7).cast("string"),
    )
    exemplar = F.concat(
        F.lit(' # {trace_id="t'), ((u * 31) % 997).cast("string"),
        F.lit('"} '),
        (u.cast("double") * 0.25).cast("string"),
        F.lit(" "),
        (F.lit(_T0S) + u % 7 + 1).cast("string"),
    )
    return ev.select(
        "event_id",
        F.when(u % 2 == 0, F.concat(base, exemplar)).otherwise(base)
        .alias("value"),
    )


@register(
    "openmetrics_parse",
    oracle="""
SELECT event_type || '_total' AS metric_name,
  CAST(user_id AS VARCHAR) AS user,
  CAST(200 + (user_id % 3) * 100 AS VARCHAR) AS code,
  round(user_id * 0.5e0, 4) AS value,
  CAST(1706572800 + user_id % 7 AS BIGINT) AS ts_s
FROM events
""",
)
def openmetrics_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-exposition sample parse: every line yields its sample
    whether or not an exemplar tail rides it (the sample regex strips
    exemplars — proven here because HALF the fixture lines carry one
    and the oracle is exemplar-blind). Plan: pure-Column line build →
    regex projections, zero shuffle, zero Python."""
    parsed = parse_exposition_lines(_lines(spark, sf_dir))
    return parsed.select(
        "metric_name",
        F.col("labels")["user"].alias("user"),
        F.col("labels")["code"].alias("code"),
        F.round("value", 4).alias("value"),
        F.unix_timestamp("timestamp").alias("ts_s"),
    )


@register(
    "openmetrics_exemplars",
    oracle="""
SELECT event_type || '_total' AS metric_name,
  CAST(user_id AS VARCHAR) AS user,
  't' || CAST((user_id * 31) % 997 AS VARCHAR) AS trace_id,
  round(user_id * 0.25e0, 4) AS ex_value,
  CAST(1706572800 + user_id % 7 + 1 AS BIGINT) AS ex_ts_s
FROM events
WHERE user_id % 2 = 0
""",
)
def openmetrics_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text-format leg of the exemplar surface: the exemplar tail
    (`# {trace_id="..."} value ts`) parses into the same
    metric→trace link shape as the remote-write-2.0 and OTLP exemplar
    decoders — all THREE ingestion formats now feed one trace join.
    Lines without a tail (the odd half) drop out. Plan: pure-Column
    line build → one regex projection, zero shuffle, zero Python."""
    ex = parse_exposition_exemplars(_lines(spark, sf_dir))
    return ex.select(
        "metric_name",
        F.col("labels")["user"].alias("user"),
        F.col("exemplar_labels")["trace_id"].alias("trace_id"),
        F.round("value", 4).alias("ex_value"),
        F.unix_timestamp("timestamp").alias("ex_ts_s"),
    )


@register(
    "openmetrics_created_increase",
    oracle="""
WITH s AS (
  SELECT event_id, event_type, user_id,
    CAST(user_id % 7 + 1 AS DOUBLE) AS v0,
    CAST(user_id % 5 AS DOUBLE) AS a,
    user_id % 11 = 0 AS resets,
    user_id % 2 = 0 AS born_in_window
  FROM events
)
SELECT event_id AS push_id, event_type || '_total' AS metric_name,
  round(
    CASE WHEN born_in_window THEN v0 ELSE 0.0 END
    + CASE WHEN resets THEN 0.5 ELSE a END, 4) AS increase
FROM s
""",
)
def openmetrics_created_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TEXT-format leg of the created-timestamp story (r9):
    OpenMetrics exposes a counter's birth as a sibling ``_created``
    sample (`foo_created{labels} <unix seconds>`), the text twin of
    remote-write 2.0's created_timestamp field. The query parses both
    sample kinds from one exposition stream, pivots each series'
    ``_created`` value into its CT, and runs the SAME CT-aware
    increase as the wire formats — synthetic zero iff the series was
    born inside the window AND not after its first sample (the r9
    clock-skew rule rides along). Per series: 2 counter samples; the
    u%11 slice resets (drop to 0.5), the u%2 slice is born in-window.
    Plan: pure-Column parse → one small agg + join (the _created side
    is one row per series — broadcast-class) → ct_increase's window +
    hash agg."""
    from prom_etl_db_spark.registry.rw2_aux import ct_increase

    ev = _events(spark, sf_dir).select("event_id", "event_type", "user_id")
    u = F.col("user_id")
    t0s = _T0S
    wstart_ms = (t0s - 15) * 1000
    v0 = (u % 7 + 1).cast("double")
    a = (u % 5).cast("double")
    v1 = F.when(u % 11 == 0, F.lit(0.5)).otherwise(v0 + a)
    ct_s = F.when(u % 2 == 0, F.lit(t0s - 1)).otherwise(F.lit(t0s - 30))
    base = F.concat(F.col("event_type"), F.lit('_total{eid="'),
                    F.col("event_id").cast("string"), F.lit('"} '))
    lines = ev.select(
        "event_id",
        F.explode(F.array(
            F.concat(base, v0.cast("string"), F.lit(" "),
                     F.lit(t0s).cast("string")),
            F.concat(base, v1.cast("string"), F.lit(" "),
                     (F.lit(t0s) + 60).cast("string")),
            F.concat(F.col("event_type"), F.lit('_created{eid="'),
                     F.col("event_id").cast("string"), F.lit('"} '),
                     ct_s.cast("string"), F.lit(" "),
                     F.lit(t0s).cast("string")),
        )).alias("value"),
    )
    parsed = parse_exposition_lines(lines.select("value"))
    samples = parsed.where(~F.col("metric_name").endswith("_created")).select(
        F.col("labels")["eid"].cast("long").alias("push_id"),
        "metric_name",
        (F.unix_timestamp("timestamp") * 1000).alias("timestamp_ms"),
        "value",
    )
    created = parsed.where(F.col("metric_name").endswith("_created")).select(
        F.col("labels")["eid"].cast("long").alias("push_id"),
        F.regexp_replace("metric_name", "_created$", "_total")
        .alias("metric_name"),
        (F.col("value") * 1000).cast("long").alias("created_timestamp_ms"),
    )
    joined = samples.join(
        F.broadcast(created), on=["push_id", "metric_name"], how="left")
    out = ct_increase(joined, wstart_ms)
    return out.select(
        "push_id", "metric_name",
        F.round("increase", 4).alias("increase"))
