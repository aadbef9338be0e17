"""Custom stateful streaming operator (SURVEY.md §2.D, brief: "custom
stateful operators via applyInPandasWithState").

``streaming_counter_increase`` maintains, per series, a running
counter-increase total with PromQL reset correction (same semantics as
``operators.promql.increase`` but incremental over an unbounded stream):
state = (last_value, total_increase); each micro-batch folds its samples
in event order and emits one updated row per touched series.

This is the genuinely-stateful case a windowed aggregation can't express:
the reset correction needs the last observed value ACROSS batch
boundaries, forever — not within a window. State is per-series (bounded
by series cardinality, the same cardinality Prometheus itself holds in
memory), keyed by the canonical label string, and survives restarts via
the checkpoint.

Non-SQL-expressible by design → rows-only correctness: the batch oracle
is ``promql.increase`` over the same data, cross-checked in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

COUNTER_STATE_SCHEMA = StructType(
    [
        StructField("last_value", DoubleType(), True),
        StructField("total_increase", DoubleType(), True),
    ]
)

COUNTER_OUTPUT_SCHEMA = StructType(
    [
        StructField("series", StringType(), False),
        StructField("last_ts", TimestampType(), True),
        StructField("last_value", DoubleType(), True),
        StructField("total_increase", DoubleType(), True),
    ]
)


def _fold_counter(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one series' batch samples into (last_value, total_increase)."""
    (series,) = key
    if state.exists:
        last_value, total = state.get
    else:
        last_value, total = None, 0.0

    last_ts = None
    for pdf in pdfs:
        pdf = pdf.sort_values("timestamp")
        for ts, v in zip(pdf["timestamp"], pdf["value"]):
            v = float(v)
            if last_value is not None:
                # PromQL reset correction: a drop = restart, count the
                # post-reset absolute value (functions.go semantics)
                total += v if v < last_value else v - last_value
            last_value = v
            last_ts = ts

    state.update((last_value, total))
    yield pd.DataFrame(
        {
            "series": [series],
            "last_ts": [last_ts],
            "last_value": [last_value],
            "total_increase": [total],
        }
    )


def streaming_counter_increase(samples: DataFrame) -> DataFrame:
    """Stream-transform: per-series running counter increase.

    ``samples`` is a STREAMING DataFrame shaped (labels map, timestamp,
    value). Groups by the canonical series string; state lives per group.
    Output mode must be ``update`` (each batch re-emits touched series).
    """
    keyed = samples.select(
        F.to_json(F.array_sort(F.map_entries(F.col("labels")))).alias("series"),
        F.col("timestamp"),
        F.col("value"),
    )
    return keyed.groupBy("series").applyInPandasWithState(
        _fold_counter,
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_counter_stream(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    schema: str,
    available_now: bool = True,
):
    """Drive the stateful operator over a file source (tests use
    ``Trigger.AvailableNow``; production uses a processing-time trigger).
    Parquet sinks don't support update mode, so each batch's updated rows
    append with the batch id — the latest batch per series is the current
    state (a compacting sink / Delta MERGE replaces this on a cluster)."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    samples = raw.select(
        F.create_map(F.lit("name"), F.col("event_type")).alias("labels"),
        F.col("ts").alias("timestamp"),
        F.col("value"),
    )
    out = streaming_counter_increase(samples)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink_dir)

    writer = out.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    ).outputMode("update")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
