"""Registry core: the QUERIES/ORACLES dicts, the @register
decorator, and the shared fixture helpers every section module uses.
Split out of the monolithic queries.py in round 5 (VERDICT stretch
task) — pure mechanics, identical registry contents (hash-verified)."""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prom_etl_db_spark.functions import (
    clustering,
    decontam,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
from prom_etl_db_spark import store
from prom_etl_db_spark.operators import analytics, promql
from prom_etl_db_spark.sources.tables import load_table
from prom_etl_db_spark.timeparse import RelativeTimeParser

# Frozen evaluation time for the events fixture (data spans 2024-01-01 ..
# 2024-01-30; "now" = the morning after the last sample).
NOW = datetime(2024, 1, 31, 0, 0, 0)
FLAGSHIP_DAY = datetime(2024, 1, 30, 0, 0, 0)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        if name in QUERIES:
            # dict assignment would SILENTLY shadow the earlier query —
            # the failure mode that almost cost a round-3 operator its
            # oracle row when a round-6 op reused its name
            raise ValueError(f"registry: duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events")


def _events_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_events`` repartitioned to the session's default parallelism —
    for the WIRE-FIXTURE queries whose next step is a per-row Python
    protobuf encode inside a pandas UDF. The sf parquet arrives as ONE
    partition (a single file under maxPartitionBytes), which pins that
    encode to one core (r11 bench finding: ~16 s single-core at sf0.1
    for 100k payloads vs sub-second wide). The repartition is a few-MB
    shuffle of a 3-column frame — negligible next to the encode it
    parallelizes. Analytics queries keep plain ``_events`` (their
    plans are driver-gated; a blanket shuffle would cost, not help)."""
    return _events(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism)


def _event_samples(spark: SparkSession, sf_dir: str, keys=("name", "k", "user_id")) -> DataFrame:
    """events → PromQL-shaped samples: (metric_name, labels, value,
    timestamp, event_id). Label map contents are chosen per query — 'name'
    carries the metric name so `by`/`without` regrouping can keep it."""
    parts = []
    if "name" in keys:
        parts += [F.lit("name"), F.col("event_type")]
    if "k" in keys:
        parts += [F.lit("k"), F.get_json_object(F.col("props"), "$.k")]
    if "user_id" in keys:
        parts += [F.lit("user_id"), F.col("user_id").cast("string")]
    return _events(spark, sf_dir).select(
        F.col("event_type").alias("metric_name"),
        F.create_map(*parts).alias("labels"),
        F.col("value"),
        F.col("ts").alias("timestamp"),
        F.col("event_id"),
    )


