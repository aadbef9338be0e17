"""Structured Streaming jobs (SURVEY.md §2.D).

The reference's "stream" is cron re-executing queries forever
(`/root/reference/cmd/server/main.go:114-155`) with no watermark, no dedup
across re-runs, and lateness repaired offline by a CLI
(`cmd/repair/main.go`). The Spark mapping is strictly stronger:

- file-source ``readStream`` over the events directory → the same ingest
  normalization chain → partitioned parquet sink with checkpointing
  (exactly-once per batch via the sink's batchId transaction log).
- windowed aggregation with a watermark handles late data online instead
  of via offline repair.

Tests drive these with ``Trigger.AvailableNow`` so they run as bounded
batches — the same code deploys with a processing-time trigger.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from prom_etl_db_spark.ingest import events_as_metric_records

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events_to_metrics(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    query_id: str = "events_stream",
) -> StreamingQuery:
    """Ingest stream: events parquet files → metric records → day-partitioned
    parquet, checkpointed. ``maxFilesPerTrigger`` bounds batch size in
    continuous mode (the reference's pacing knob, §2.D backpressure row)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    records = events_as_metric_records(raw, query_id=query_id)
    writer = (
        records.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("collected_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


def idempotent_batch_committer(store_path: str, query_id: str):
    """foreachBatch commit protocol making replayed micro-batches no-ops
    when writing into the DAY STORE layout (store.py), which is not a
    streaming file sink and so gets no exactly-once from the checkpoint
    alone (§2.D exactly-once row — the batch path has
    ``backfill_skip_existing``; this is the streaming counterpart).

    Per (query_id, batchId):

    1. committed marker exists → return (replay after a completed commit);
    2. stage the batch under ``_stream_staging/<qid>/batch=<id>``
       (mode=overwrite — a half-written staging dir from a crashed
       attempt is simply rewritten);
    3. publish each staged day-partition file into the store under a
       DETERMINISTIC name ``stream-<qid>-<batchId>-<partition>-<i>``,
       deleting any same-prefix files first — so a crash between publish
       and marker replays into the SAME filenames instead of
       double-appending (Spark file sources replay a batch with
       identical data, hence identical day partitions);
    4. write the marker (atomic create), drop staging.

    Driver-side work is O(files in one micro-batch), never O(store).
    Local-FS copy here; on an object store step 3 is the same put-by-
    deterministic-key."""
    root = Path(store_path)
    commits = root / "_stream_commits" / query_id
    staging_root = root / "_stream_staging" / query_id

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        marker = commits / f"{batch_id}"
        if marker.exists():
            return
        stage = staging_root / f"batch={batch_id}"
        (
            batch_df.write.partitionBy("collected_date")
            .mode("overwrite")
            .parquet(str(stage))
        )
        prefix = f"stream-{query_id}-{batch_id}-"
        for part_dir in sorted(stage.glob("collected_date=*")):
            dst_dir = root / part_dir.name
            dst_dir.mkdir(parents=True, exist_ok=True)
            # clear a previous crashed attempt's files for THIS batch only
            for stale in dst_dir.glob(f"{prefix}*"):
                stale.unlink()
            for i, f in enumerate(sorted(part_dir.glob("*.parquet"))):
                shutil.copyfile(f, dst_dir / f"{prefix}{i}.parquet")
        commits.mkdir(parents=True, exist_ok=True)
        marker.touch()
        shutil.rmtree(stage, ignore_errors=True)

    return commit


def stream_events_to_store(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    query_id: str = "events_stream",
) -> StreamingQuery:
    """Ingest stream writing into the day-partitioned STORE (the same
    layout the batch path, repair tool, and retention operate on) via the
    idempotent foreachBatch committer — a replayed micro-batch after a
    mid-batch kill cannot double-append."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    records = events_as_metric_records(raw, query_id=query_id)
    writer = (
        records.writeStream.foreachBatch(
            idempotent_batch_committer(store_path, query_id)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


def windowed_rollup_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming per-(type, window) rollup with a watermark for late data —
    the online replacement for the reference's offline repair-by-day story
    (§2.D watermark row). Append mode emits each window once it's final."""
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    agg = (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n"),
            F.col("sum_value"),
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 minute")
    return writer.start()


def dedup_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact dedup on event identity: the online counterpart of
    the reference's repair-tool idempotency check (§2.A row A26 — it only
    dedups offline, per whole day). ``dropDuplicatesWithinWatermark``
    keys state by event_id and EXPIRES it once the watermark passes — the
    unbounded-state trap of plain ``dropDuplicates`` on a stream (state
    grows forever at 100 TB/day; with the watermark it's bounded by the
    lateness horizon)."""
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    deduped = raw.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


def session_rollup_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("user_id",),
    available_now: bool = True,
) -> StreamingQuery:
    """Per-key SESSION windows: events closer than ``gap`` merge into one
    session; a session closes once the watermark passes its end. The
    activity-sessionization primitive (user journeys, burst detection)
    that fixed windows can't express — Spark's ``session_window`` keeps
    per-key open-session state bounded by the watermark horizon, the same
    state posture as the windowed rollup above.

    Output per closed session: key, start/end, event count, value sum."""
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    agg = (
        raw.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.col("ts"), gap).alias("w"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 minute")
    return writer.start()


def stream_stream_attribution(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Stream-STREAM join: each purchase joins the same user's clicks from
    the preceding ``horizon`` — online click-attribution (the streaming
    dual of the batch as-of/interval joins in ``operators/joins.py``).

    Both sides carry a watermark and the join has an explicit time-range
    predicate, so Spark buffers each side's state only up to watermark +
    horizon and then drops it — the bounded-state contract every
    stream-stream join needs (without the range predicate, state grows
    forever). Inner join: a purchase with no prior click emits nothing
    (its rows could otherwise never finalize under append mode).
    """
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    clicks = (
        raw.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        raw.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
        "click_value",
    )
    writer = (
        joined.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


def enriched_stream(
    spark: SparkSession,
    source_dir: str,
    dim: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream-static enrichment: each micro-batch joins the event stream
    against a static dimension (e.g. the query-config catalog, A23). The
    static side re-resolves per batch — config edits apply to the NEXT
    batch without restarting the stream. Catalyst broadcasts the small
    dim per batch; no stream-stream state is involved."""
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    joined = raw.join(F.broadcast(dim), "event_type", "left")
    writer = (
        joined.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


WARC_FILES_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("warc", T.BinaryType()),
    ]
)


def stream_warc_to_records(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Crawl-ingestion stream (r6): WARC files land as parquet rows of
    (file_id, warc bytes) — the shape a fetcher fleet drops into object
    storage — and every micro-batch runs the SAME ISO 28500 record walk
    the batch path uses (``functions/warc.parse_warc_records`` is a
    stateless mapInPandas, so it composes with Structured Streaming
    unchanged: one file parses exactly once per checkpointed trigger).
    ``maxFilesPerTrigger`` bounds batch size in continuous mode; with
    ``availableNow`` the job drains what exists and stops — the
    reference's cron-shaped trigger. Output: append-mode parquet of
    record metadata, exactly-once per checkpoint."""
    from prom_etl_db_spark.functions.warc import parse_warc_records

    raw = (
        spark.readStream.schema(WARC_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    records = parse_warc_records(raw)
    writer = (
        records.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


REMOTE_WRITE_FILES_SCHEMA = T.StructType(
    [
        T.StructField("push_id", T.LongType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def stream_remote_write_rollup(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    shard_modulus: int = 8,
    available_now: bool = True,
    wire_version: int = 1,
) -> StreamingQuery:
    """Push-arc streaming twin (r6): remote-write payloads landing as
    parquet rows drain through the SAME from-scratch wire decode
    (snappy block + protobuf walk, stateless mapInPandas) and relabel
    hashmod routing as the batch flagship ``metrics_pipeline_v2``,
    then a watermarked per-(metric, shard, window) rollup emits each
    window once final — the sharded-TSDB-router shape, online.
    Checkpointed; a restart re-ingests only newly-landed payload
    files. ``wire_version=2`` (r8) drains io.prometheus.write.v2
    payloads through the SAME rollup — all three push protocols
    (RW 1.0 here, 2.0 via this flag, OTLP via stream_otlp_rollup) hold
    stream twins over one operator set."""
    from prom_etl_db_spark.functions.remote_write import (
        remote_write_samples,
        remote_write_v2_samples,
    )
    from prom_etl_db_spark.operators.relabel import hashmod_column

    raw = (
        spark.readStream.schema(REMOTE_WRITE_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    decode = remote_write_v2_samples if wire_version == 2 else remote_write_samples
    samples = decode(raw)
    agg = (
        samples.select(
            "metric_name",
            hashmod_column(F.col("labels")["user"], shard_modulus).alias("shard"),
            "value",
            F.timestamp_millis(F.col("timestamp_ms")).alias("ts"),
        )
        .withWatermark("ts", watermark)
        .groupBy(
            F.window(F.col("ts"), window).alias("w"),
            F.col("metric_name"),
            F.col("shard"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "metric_name",
            "shard",
            "n",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 minute")
    return writer.start()


def stream_ct_increase(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    window_start_ms: int,
    available_now: bool = True,
) -> StreamingQuery:
    """CT-aware counter-increase streaming twin (later r8): remote-write
    2.0 payloads drain through the v2 decode WITH created_timestamp,
    then a per-series stateful fold keeps (last_value, total_increase)
    with Prometheus's CT rule — the first-ever sample of a series born
    inside the observation window counts fully (synthetic zero at CT);
    NULL CT falls back to plain increase. Batch twin: the
    ``ct_aware_increase`` registry query's window+agg over the same
    payloads. Parquet sink appends each batch's updated series with the
    batch id (the _start_parquet_sink protocol — latest batch per
    series is the current state)."""
    from prom_etl_db_spark.functions.remote_write import remote_write_v2_samples
    from prom_etl_db_spark.streaming.stateful import (
        _start_parquet_sink,
        streaming_ct_counter_increase,
    )

    raw = (
        spark.readStream.schema(REMOTE_WRITE_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    samples = remote_write_v2_samples(raw, with_created=True).select(
        F.to_json(
            F.array_sort(
                F.map_entries(
                    F.map_concat(
                        F.col("labels"),
                        F.create_map(
                            F.lit("__name__"), F.col("metric_name")
                        ),
                    )
                )
            )
        ).alias("series"),
        F.col("timestamp_ms"),
        F.col("value"),
        F.col("created_timestamp_ms").alias("created_ms"),
    )
    out = streaming_ct_counter_increase(
        samples, window_start_ms=window_start_ms)
    return _start_parquet_sink(out, sink_dir, checkpoint_dir, available_now)


def stream_summary_increase(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    window_start_ms: int,
    available_now: bool = True,
) -> StreamingQuery:
    """OTLP Summary streaming twin (r9): summary COUNT is a cumulative
    monotonic counter, so it rides the SAME CT-aware counter fold as
    remote-write counters — the point's start_time_unix_nano plays
    the created-timestamp role (client_golang summaries report the
    process start, the series' birth), with the r9 clock-skew rule
    (a start time after the sample is ignored) inherited for free.
    The φ-quantile values never enter this path (module rule:
    quantiles are data, not rate-able series). Non-summary point
    shapes refuse pre-fold."""
    from prom_etl_db_spark.functions.otlp import otlp_samples
    from prom_etl_db_spark.streaming.stateful import (
        _start_parquet_sink,
        streaming_ct_counter_increase,
    )

    raw = (
        spark.readStream.schema(REMOTE_WRITE_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    pts = otlp_samples(raw)
    keyed = pts.select(
        F.concat_ws(
            "\x1f", F.col("metric_name"), F.col("attrs")["eid"]
        ).alias("series"),
        (F.col("time_unix_nano") / 1_000_000).cast("long").alias(
            "timestamp_ms"),
        F.when(
            F.col("data_type") != "summary",
            F.raise_error(F.lit(
                "stream_summary_increase: non-summary point shape — "
                "this twin folds summary count as a counter")),
        ).otherwise(F.col("count").cast("double")).alias("value"),
        F.when(
            F.col("start_time_unix_nano") > 0,
            (F.col("start_time_unix_nano") / 1_000_000).cast("long"),
        ).alias("created_ms"),
    )
    out = streaming_ct_counter_increase(
        keyed, window_start_ms=window_start_ms)
    return _start_parquet_sink(out, sink_dir, checkpoint_dir, available_now)


def stream_otlp_delta_accumulate(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """OTLP delta-temporality streaming twin (later r8): delta-sum
    payloads landing as parquet drain through the OTLP decode, then a
    per-series running-sum fold emits each point's cumulative — the
    stateful form of ``promql.otlp_delta_to_cumulative`` (whose window
    is frame-scoped; an unbounded stream needs the cumulative-so-far
    in state). Cumulative-temporality points refuse loudly BEFORE the
    fold (accumulating an already-cumulative stream double-counts)."""
    from prom_etl_db_spark.functions.otlp import otlp_samples
    from prom_etl_db_spark.streaming.stateful import (
        _start_parquet_sink,
        streaming_delta_sum,
    )

    raw = (
        spark.readStream.schema(REMOTE_WRITE_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    pts = otlp_samples(raw)
    keyed = pts.select(
        F.concat_ws(
            "\x1f",
            F.col("metric_name"),
            F.col("attrs")["eid"],
        ).alias("series"),
        (F.col("time_unix_nano") / 1_000_000).cast("long").alias(
            "timestamp_ms"),
        F.when(
            F.col("temporality") != 1,
            F.raise_error(F.lit(
                "stream_otlp_delta_accumulate: non-DELTA point — "
                "accumulating a cumulative stream double-counts")),
        ).otherwise(
            F.coalesce(F.col("value_double"),
                       F.col("value_int").cast("double"))
        ).alias("value"),
    )
    out = streaming_delta_sum(keyed)
    return _start_parquet_sink(out, sink_dir, checkpoint_dir, available_now)


def stream_otlp_delta_hist_accumulate(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of ``promql.otlp_delta_hist_to_cumulative``
    (r9, VERDICT r8 task: an OTel SDK exporting delta CLASSIC
    histograms can now be normalized on a stream, not only in batch).
    Payloads drain through the OTLP decode; per-series state is the
    running bucket array. Pre-fold refusals (mirroring the batch
    operator's): non-DELTA temporality, and delta EXPONENTIAL
    histograms redirecting to the scale-aware twin. Bounds/length
    changes refuse inside the fold against the checkpointed
    fingerprint — they are cross-batch by nature."""
    from prom_etl_db_spark.functions.otlp import otlp_samples
    from prom_etl_db_spark.streaming.stateful import (
        _start_parquet_sink,
        streaming_delta_hist,
    )

    raw = (
        spark.readStream.schema(REMOTE_WRITE_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    pts = otlp_samples(raw)
    keyed = pts.select(
        F.concat_ws(
            "\x1f", F.col("metric_name"), F.col("attrs")["eid"]
        ).alias("series"),
        (F.col("time_unix_nano") / 1_000_000).cast("long").alias(
            "timestamp_ms"),
        F.when(
            F.col("data_type") == "exponential_histogram",
            F.raise_error(F.lit(
                "stream_otlp_delta_hist_accumulate: delta EXPONENTIAL "
                "histograms take the scale-aware twin — use "
                "stream_otlp_delta_exp_accumulate")),
        ).when(
            F.col("temporality") != 1,
            F.raise_error(F.lit(
                "stream_otlp_delta_hist_accumulate: non-DELTA point — "
                "accumulating a cumulative stream double-counts")),
        ).otherwise(F.col("bucket_counts")).alias("bucket_counts"),
        F.to_json(F.col("explicit_bounds")).alias("bounds_key"),
        F.col("count"),
        F.col("sum"),
    )
    out = streaming_delta_hist(keyed)
    return _start_parquet_sink(out, sink_dir, checkpoint_dir, available_now)


def stream_otlp_delta_exp_accumulate(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of ``promql.otlp_delta_exp_hist_to_cumulative``
    (r9): per-series state is the running native histogram at the
    coarsest scale seen; a mid-stream SCALE CHANGE downscale-merges
    incrementally (``_py_nh_downscale`` + ``_py_nh_align_add``) — the
    stream is the linear pass the batch operator bounds its sequential
    fold for. Non-DELTA temporality and non-exponential shapes refuse
    pre-fold."""
    from prom_etl_db_spark.functions.otlp import otlp_samples
    from prom_etl_db_spark.streaming.stateful import (
        _start_parquet_sink,
        streaming_delta_exp_hist,
    )

    raw = (
        spark.readStream.schema(REMOTE_WRITE_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    pts = otlp_samples(raw)
    keyed = pts.select(
        F.concat_ws(
            "\x1f", F.col("metric_name"), F.col("attrs")["eid"]
        ).alias("series"),
        (F.col("time_unix_nano") / 1_000_000).cast("long").alias(
            "timestamp_ms"),
        F.when(
            F.col("data_type") != "exponential_histogram",
            F.raise_error(F.lit(
                "stream_otlp_delta_exp_accumulate: non-exponential "
                "point shape — this twin folds the scale-aware merge")),
        ).when(
            F.col("temporality") != 1,
            F.raise_error(F.lit(
                "stream_otlp_delta_exp_accumulate: non-DELTA point — "
                "accumulating a cumulative stream double-counts")),
        ).otherwise(F.col("scale")).alias("scale"),
        F.col("pos_offset"),
        F.col("pos_counts"),
        F.col("neg_offset"),
        F.col("neg_counts"),
        F.col("zero_count"),
        F.col("count"),
        F.col("sum"),
    )
    out = streaming_delta_exp_hist(keyed)
    return _start_parquet_sink(out, sink_dir, checkpoint_dir, available_now)


CRAWL_URL_FILES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_url_dedup(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    watermark: str = "7 days",
    available_now: bool = True,
) -> StreamingQuery:
    """Crawl-arc streaming twin of batch ``url_dedup`` (r7, VERDICT r6
    task #5): fetched URLs land as parquet rows of (doc_id, url, ts)
    — the shape ``stream_warc_to_records`` emits once its target URIs
    are joined with fetch times — canonicalize with the SAME
    Arrow-batched RFC 3986 normalizer as the batch path (stateless
    pandas UDF, streaming-composable unchanged), then admit each
    canonical_url ONCE via ``dropDuplicatesWithinWatermark``: the
    seen-set is keyed by canonical_url and BOUNDED by the watermark
    horizon — the documented recrawl window (a URL seen again after
    the horizon is a legitimate re-fetch, exactly the recrawl policy a
    production frontier wants; plain dropDuplicates would grow state
    with every URL ever crawled). First arrival wins, the streaming
    analogue of the batch keep-min rule (equal under arrival order =
    corpus order, which the restart test pins). Checkpointed; restart
    resumes the seen-set and ingests only newly-landed files."""
    from prom_etl_db_spark.functions.urlnorm import canonical_col

    raw = (
        spark.readStream.schema(CRAWL_URL_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    admitted = (
        raw.withColumn("canonical_url", canonical_col(F.col("url")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["canonical_url"])
    )
    writer = (
        admitted.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


OTLP_FILES_SCHEMA = T.StructType(
    [
        T.StructField("push_id", T.LongType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def stream_otlp_rollup(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    shard_modulus: int = 8,
    available_now: bool = True,
) -> StreamingQuery:
    """The OTLP push path's streaming twin (r7): OTLP
    ExportMetricsServiceRequest payloads landing as parquet rows drain
    through the SAME from-scratch proto3 wire decode (gzip-sniffed,
    stateless mapInPandas) and hashmod routing as the batch flagship
    ``metrics_pipeline_v3``, then the watermarked per-(metric, shard,
    window) rollup — so BOTH push protocols (remote-write and OTLP)
    hold stream twins over one operator set. Gauge points carry the
    value; times come from the point's own time_unix_nano.
    Checkpointed; restart ingests only newly-landed payload files."""
    from prom_etl_db_spark.functions.otlp import otlp_samples
    from prom_etl_db_spark.operators.relabel import hashmod_column

    raw = (
        spark.readStream.schema(OTLP_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    samples = otlp_samples(raw)
    agg = (
        samples.where(F.col("data_type") == "gauge")
        .select(
            "metric_name",
            hashmod_column(F.col("attrs")["user"], shard_modulus).alias("shard"),
            F.col("value_double").alias("value"),
            # integer DIV: float division of ~1.7e18 ns loses exactness
            # past 2^53 (r7 adversarial pass)
            F.timestamp_micros(F.expr("time_unix_nano DIV 1000")).alias("ts"),
        )
        .withWatermark("ts", watermark)
        .groupBy(
            F.window(F.col("ts"), window).alias("w"),
            F.col("metric_name"),
            F.col("shard"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "metric_name",
            "shard",
            "n",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 minute")
    return writer.start()


def stream_native_hist_rollup(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of ``native_hist.native_hist_sum_by`` (r9):
    remote-write 2.0 native-histogram payloads drain through the
    prompb decode and merge per metric into a running rolled-up
    histogram (downscale-on-scale-change inherited from the fold).
    CUSTOM-BUCKET histograms (schema −53) refuse pre-fold — their
    boundary-equality guard needs the batch operator's group-wide
    view; an NHCB rollup is a batch concern (DIVERGENCES.md)."""
    from prom_etl_db_spark.functions.remote_write import (
        CUSTOM_BUCKETS_SCHEMA,
        remote_write_v2_native_histograms,
    )
    from prom_etl_db_spark.streaming.stateful import (
        _start_parquet_sink,
        streaming_native_hist_sum,
    )

    raw = (
        spark.readStream.schema(REMOTE_WRITE_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    pts = remote_write_v2_native_histograms(raw)
    keyed = pts.select(
        F.col("metric_name").alias("series"),
        F.when(
            F.col("schema") == CUSTOM_BUCKETS_SCHEMA,
            F.raise_error(F.lit(
                "stream_native_hist_rollup: custom-bucket (schema -53) "
                "histograms take the batch sum_by path — boundary "
                "equality needs the group-wide view")),
        ).otherwise(F.col("schema")).alias("schema"),
        "zero_threshold",
        "pos_offset",
        "pos_counts",
        "neg_offset",
        "neg_counts",
        "zero_count",
        "count",
        "sum",
    )
    out = streaming_native_hist_sum(keyed)
    return _start_parquet_sink(out, sink_dir, checkpoint_dir, available_now)


def stream_exemplar_report(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Exemplar → rate-window report streaming twin (r10): remote-write
    2.0 payloads drain through BOTH v2 decodes — samples and exemplars
    — interleaved into one per-series stream (kind 's'/'e'), and the
    stateful fold keeps the window endpoints + folded exemplar stats +
    a bounded pending set (`stateful._fold_exemplar_report`). Batch
    twin: the ``exemplar_rate_report`` registry query over the same
    payloads. Parquet sink appends each batch's report rows with the
    batch id (latest batch per series is the current report)."""
    from prom_etl_db_spark.functions.remote_write import (
        remote_write_v2_exemplars,
        remote_write_v2_samples,
    )
    from prom_etl_db_spark.streaming.stateful import (
        _start_parquet_sink,
        streaming_exemplar_report,
    )

    raw = (
        spark.readStream.schema(REMOTE_WRITE_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )

    def keyed():
        # unbound F.col — resolves against whichever decode output the
        # select applies to (both carry labels + metric_name)
        return F.to_json(F.array_sort(F.map_entries(F.map_concat(
            F.col("labels"),
            F.create_map(F.lit("__name__"), F.col("metric_name")),
        ))))

    samples = remote_write_v2_samples(raw).select(
        keyed().alias("series"),
        F.lit("s").alias("kind"),
        F.col("timestamp_ms"),
        F.col("value"),
    )
    exemplars = remote_write_v2_exemplars(raw).select(
        keyed().alias("series"),
        F.lit("e").alias("kind"),
        F.col("timestamp_ms"),
        F.col("value"),
    )
    out = streaming_exemplar_report(samples.unionByName(exemplars))
    return _start_parquet_sink(out, sink_dir, checkpoint_dir, available_now)
