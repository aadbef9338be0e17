"""Structured Streaming job tests (SURVEY.md §2.D).

Driven with Trigger.AvailableNow so they run as bounded batches; the same
code deploys with processing-time triggers. Verifies the checkpoint gives
exactly-once across restarts (strictly stronger than the reference's
cron-re-run double-insert risk, §2.D exactly-once row).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from prom_etl_db_spark.streaming.jobs import (
    stream_events_to_metrics,
    windowed_rollup_stream,
)


@pytest.fixture()
def events_dir(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        (1, datetime(2024, 3, 1, 10, 15), 100, "click", 1.0, '{"page":"a"}'),
        (2, datetime(2024, 3, 1, 10, 45), 101, "click", 2.0, '{"page":"b"}'),
        (3, datetime(2024, 3, 1, 11, 5), 100, "view", 3.0, None),
        (4, datetime(2024, 3, 2, 9, 0), 102, "click", 4.0, '{"page":"a"}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(src)
    return src


def test_stream_ingest_and_checkpoint_idempotency(spark, tmp_path, events_dir):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    q = stream_events_to_metrics(spark, events_dir, sink, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 4
    # normalized to MetricRecord shape, partitioned by day
    assert out.select("collected_date").distinct().count() == 2
    r = out.where("metric_name = 'view'").first()
    assert r["labels"]["user_id"] == "100"

    # restart with same checkpoint, no new files → nothing re-ingested
    q2 = stream_events_to_metrics(spark, events_dir, sink, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 4


def test_stream_picks_up_new_files_only(spark, tmp_path, events_dir):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream_events_to_metrics(spark, events_dir, sink, ckpt).awaitTermination(120)

    # land one new file; only IT is processed on the next trigger
    spark.createDataFrame(
        [(9, datetime(2024, 3, 3, 8, 0), 200, "click", 9.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("append").parquet(events_dir)
    stream_events_to_metrics(spark, events_dir, sink, ckpt).awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 5
    assert out.where("value = 9.0").count() == 1


def test_windowed_rollup_matches_batch(spark, tmp_path, events_dir):
    sink = str(tmp_path / "roll")
    ckpt = str(tmp_path / "roll_ckpt")
    q = windowed_rollup_stream(spark, events_dir, sink, ckpt, window="1 hour")
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(sink).collect()
    }
    # hand-computed: hour 10 has clicks 1+2, hour 11 one view
    assert got[(datetime(2024, 3, 1, 10, 0), "click")] == (2, 3.0)
    assert got[(datetime(2024, 3, 1, 11, 0), "view")] == (1, 3.0)
    # watermark = max(ts) - 2h = Mar 2 07:00 < window end Mar 2 10:00 →
    # the day-2 window is still OPEN and append mode must withhold it.
    assert (datetime(2024, 3, 2, 9, 0), "click") not in got

    # a later event advances the watermark past the open window; the restart
    # (same checkpoint) must then finalize and emit it exactly once.
    spark.createDataFrame(
        [(10, datetime(2024, 3, 2, 13, 0), 103, "view", 5.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("append").parquet(events_dir)
    q2 = windowed_rollup_stream(spark, events_dir, sink, ckpt, window="1 hour")
    q2.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got[(datetime(2024, 3, 2, 9, 0), "click")] == (1, 4.0)
    assert len([k for k in got if k[0] == datetime(2024, 3, 1, 10, 0)]) == 1
