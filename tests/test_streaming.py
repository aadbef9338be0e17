"""Structured Streaming job tests (SURVEY.md §2.D).

Driven with Trigger.AvailableNow so they run as bounded batches; the same
code deploys with processing-time triggers. Verifies the checkpoint gives
exactly-once across restarts (strictly stronger than the reference's
cron-re-run double-insert risk, §2.D exactly-once row).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from prom_etl_db_spark.streaming.jobs import (
    idempotent_batch_committer,
    session_rollup_stream,
    stream_stream_attribution,
    stream_events_to_metrics,
    stream_events_to_store,
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


def test_stream_to_store_matches_batch_oracle(spark, tmp_path, events_dir):
    from prom_etl_db_spark.ingest import events_as_metric_records

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = stream_events_to_store(spark, events_dir, store, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(store)
    oracle = events_as_metric_records(
        spark.read.parquet(events_dir), query_id="events_stream"
    )
    assert got.count() == oracle.count() == 4
    assert sorted(map(tuple, got.select("metric_name", "value").collect())) == sorted(
        map(tuple, oracle.select("metric_name", "value").collect())
    )


def test_stream_to_store_survives_checkpoint_loss_without_duplicates(
    spark, tmp_path, events_dir
):
    # the hard exactly-once case: the CHECKPOINT is lost (or a mid-batch
    # kill rewinds it), so Spark replays everything from scratch — the
    # commit markers must make the full replay a no-op on the store
    import shutil as sh

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    stream_events_to_store(spark, events_dir, store, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(store).count()
    assert n1 == 4

    sh.rmtree(ckpt)  # total checkpoint loss → batch 0 replays wholesale
    stream_events_to_store(spark, events_dir, store, ckpt).awaitTermination(120)
    assert spark.read.parquet(store).count() == n1


def test_committer_replay_paths_are_idempotent(spark, tmp_path, events_dir):
    from pathlib import Path

    from prom_etl_db_spark.ingest import events_as_metric_records

    store = tmp_path / "store"
    batch = events_as_metric_records(
        spark.read.parquet(events_dir), query_id="q_s"
    )
    commit = idempotent_batch_committer(str(store), "q_s")

    commit(batch, 7)
    n1 = spark.read.parquet(str(store)).count()
    assert n1 == 4

    # replay after completed commit (marker present) → no-op
    commit(batch, 7)
    assert spark.read.parquet(str(store)).count() == n1

    # crash BETWEEN publish and marker: marker gone, data files present —
    # the replay must land in the same deterministic filenames, not append
    marker = store / "_stream_commits" / "q_s" / "7"
    marker.unlink()
    commit(batch, 7)
    assert spark.read.parquet(str(store)).count() == n1

    # crash MID-publish: marker gone AND one published file missing — the
    # replay completes the publish without duplicating the surviving files
    marker.unlink()
    published = sorted(store.glob("collected_date=*/stream-q_s-7-*.parquet"))
    assert published
    published[0].unlink()
    commit(batch, 7)
    assert spark.read.parquet(str(store)).count() == n1

    # a DIFFERENT batch id appends normally
    commit(batch, 8)
    assert spark.read.parquet(str(store)).count() == 2 * n1
    assert (store / "_stream_commits" / "q_s" / "8").exists()
    assert Path(store / "_stream_staging" / "q_s").exists() is False or not any(
        (store / "_stream_staging" / "q_s").iterdir()
    )


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


def test_stateful_counter_increase_across_batches(spark, tmp_path):
    """applyInPandasWithState: reset-corrected counter totals must carry
    state across separate micro-batches (and restarts via checkpoint),
    matching the batch promql.increase oracle on the union of the data."""
    from datetime import timedelta

    from prom_etl_db_spark.operators.promql import increase
    from prom_etl_db_spark.streaming.stateful import run_counter_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "src")
    sink = str(tmp_path / "state_sink")
    ckpt = str(tmp_path / "state_ckpt")
    t0 = datetime(2024, 3, 1, 0, 0)

    # batch 1: ctr 10 → 25; batch 2 (separate run): 3 (reset) → 8
    spark.createDataFrame(
        [(1, t0, 0, "ctr", 10.0, None), (2, t0 + timedelta(minutes=1), 0, "ctr", 25.0, None)],
        schema,
    ).write.parquet(src)
    run_counter_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    spark.createDataFrame(
        [(3, t0 + timedelta(minutes=2), 0, "ctr", 3.0, None),
         (4, t0 + timedelta(minutes=3), 0, "ctr", 8.0, None)],
        schema,
    ).write.mode("append").parquet(src)
    run_counter_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    out = spark.read.parquet(sink)
    last = out.orderBy(F.desc("batch_id")).first()
    # 15 (batch 1) + 3 (reset) + 5 = 23 — state crossed the restart
    assert last["total_increase"] == 23.0
    assert last["last_value"] == 8.0

    # batch oracle over the union
    batch = spark.read.parquet(src).select(
        F.create_map(F.lit("name"), F.col("event_type")).alias("labels"),
        F.col("ts").alias("timestamp"),
        F.col("value"),
    )
    oracle = increase(batch, frame_start=t0, frame_end=t0 + timedelta(hours=1))
    assert oracle.first()["value"] == last["total_increase"]


def test_dedup_stream_drops_replayed_events(spark, tmp_path, events_dir):
    from prom_etl_db_spark.streaming.jobs import dedup_stream

    # replay file 1's events (same event_ids, same batch-window) into a
    # second file — the at-least-once delivery case the reference's cron
    # re-runs create (§2.D: "re-execution double-inserts")
    src = str(tmp_path / "dedup_src")
    base = spark.read.parquet(events_dir)
    base.write.parquet(src)
    base.limit(2).write.mode("append").parquet(src)

    sink = str(tmp_path / "dedup_sink")
    q = dedup_stream(spark, src, sink, str(tmp_path / "dedup_ckpt"))
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 4  # 6 input rows, 2 are replayed dups
    assert out.select("event_id").distinct().count() == 4


def test_enriched_stream_joins_static_dim(spark, tmp_path, events_dir):
    from prom_etl_db_spark.streaming.jobs import enriched_stream

    dim = spark.createDataFrame(
        [("click", "interaction"), ("view", "passive")],
        "event_type string, category string",
    )
    sink = str(tmp_path / "enrich_sink")
    q = enriched_stream(spark, events_dir, dim, sink, str(tmp_path / "enrich_ckpt"))
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 4
    got = {r["event_id"]: r["category"] for r in out.collect()}
    assert got[1] == "interaction" and got[3] == "passive"


def test_session_rollup_merges_by_gap(spark, tmp_path, events_dir):
    """30-min gap: user 100's 10:15 click and 11:05 view are 50 min apart
    -> TWO sessions; with a 60-min gap they merge into ONE. Only sessions
    whose end precedes the watermark (max ts - 2h = Mar 2 07:00) emit."""
    for gap, expect in (("30 minutes", 2), ("60 minutes", 1)):
        sink = str(tmp_path / f"sess_{gap.split()[0]}")
        ckpt = str(tmp_path / f"sess_ckpt_{gap.split()[0]}")
        q = session_rollup_stream(spark, events_dir, sink, ckpt, gap=gap)
        q.awaitTermination(120)
        rows = spark.read.parquet(sink).collect()
        u100 = [r for r in rows if r["user_id"] == 100]
        assert len(u100) == expect, (gap, rows)
        if expect == 1:
            merged = u100[0]
            assert merged["n_events"] == 2 and merged["sum_value"] == 4.0
            assert merged["session_start"] == datetime(2024, 3, 1, 10, 15)
            # session end = last event + gap
            assert merged["session_end"] == datetime(2024, 3, 1, 12, 5)
        # user 102's Mar-2 09:00 session ends after the watermark -> withheld
        assert all(r["user_id"] != 102 for r in rows)


def test_stream_stream_attribution_window_and_horizon(spark, tmp_path):
    """Purchases pair with same-user clicks within the 1h horizon; clicks
    after the purchase or older than the horizon don't attribute."""
    src = str(tmp_path / "attr_src")
    rows = [
        (1, datetime(2024, 3, 1, 10, 0), 100, "click", 1.0, None),
        (2, datetime(2024, 3, 1, 10, 40), 100, "purchase", 9.0, None),  # <- 1
        (3, datetime(2024, 3, 1, 12, 0), 100, "purchase", 7.0, None),  # no click in [11,12]
        (4, datetime(2024, 3, 1, 9, 0), 101, "purchase", 5.0, None),  # click is later
        (5, datetime(2024, 3, 1, 9, 30), 101, "click", 2.0, None),
        (6, datetime(2024, 3, 1, 23, 0), 102, "view", 0.0, None),  # advances watermark
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(src)
    sink = str(tmp_path / "attr_sink")
    q = stream_stream_attribution(
        spark, src, sink, str(tmp_path / "attr_ckpt"), horizon="1 hour"
    )
    q.awaitTermination(120)
    got = [
        (r["purchase_id"], r["click_id"])
        for r in spark.read.parquet(sink).collect()
    ]
    assert got == [(2, 1)]


def test_streaming_funnel_matches_batch_across_restarts(spark, tmp_path):
    """The streaming funnel's DP state must carry across micro-batches
    and checkpointed restarts, with the final per-user levels exactly
    equal to the batch analytics.funnel_levels over the union."""
    from datetime import timedelta

    from prom_etl_db_spark.operators.analytics import funnel_levels
    from prom_etl_db_spark.streaming.stateful import run_funnel_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "fsrc")
    sink = str(tmp_path / "fsink")
    ckpt = str(tmp_path / "fckpt")
    t0 = datetime(2024, 3, 1, 0, 0)
    steps = ["view", "click", "purchase"]

    def ev(i, uid, typ, hours):
        return (i, t0 + timedelta(hours=hours), uid, typ, 1.0, None)

    # batch 1: u1 view+click; u2 view; u3 purchase only; u4/u5 views
    # whose clicks arrive in batch 2 — u4's at the SAME timestamp
    spark.createDataFrame(
        [ev(1, 1, "view", 0), ev(2, 1, "click", 1), ev(3, 2, "view", 0),
         ev(4, 3, "purchase", 0), ev(7, 4, "view", 6), ev(8, 5, "view", 6)],
        schema,
    ).write.parquet(src)
    run_funnel_stream(
        spark, src, sink, ckpt, schema=schema, steps=steps, window="3h"
    ).awaitTermination(120)

    # batch 2 (restart from checkpoint): u1 completes INSIDE the window;
    # u2's click arrives too late (window from its view = 3h, click at
    # +5h); u4's click shares its view's exact timestamp ACROSS the
    # batch boundary — strict increase says no chain (the pending class
    # must survive the checkpoint); u5's click is 30 min later — chains
    spark.createDataFrame(
        [ev(5, 1, "purchase", 2), ev(6, 2, "click", 5),
         ev(9, 4, "click", 6), ev(10, 5, "click", 6.5)],
        schema,
    ).write.mode("append").parquet(src)
    run_funnel_stream(
        spark, src, sink, ckpt, schema=schema, steps=steps, window="3h"
    ).awaitTermination(120)

    out = spark.read.parquet(sink)
    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    latest = {
        r["user_id"]: r["funnel_level"]
        for r in out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    assert latest == {1: 3, 2: 1, 3: 0, 4: 1, 5: 2}

    batch = funnel_levels(
        spark.read.parquet(src), steps, window="3h"
    )
    assert {r["user_id"]: r["funnel_level"] for r in batch.collect()} == latest


def test_streaming_hll_matches_batch_sketch_across_restart(spark, tmp_path):
    """applyInPandasWithState HLL: after two separate runs sharing a
    checkpoint (a restart), the final per-group sketch must equal the
    BATCH sketch over the union of both batches — register state crossed
    the checkpoint and merged by max, exactly like a shard union."""
    from datetime import timedelta

    from prom_etl_db_spark.functions import sketches
    from prom_etl_db_spark.streaming.stateful import run_hll_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "hll_src")
    sink = str(tmp_path / "hll_sink")
    ckpt = str(tmp_path / "hll_ckpt")
    t0 = datetime(2024, 3, 1, 0, 0)

    rows1 = [(i, t0, i % 150, "click", 1.0, None) for i in range(400)]
    spark.createDataFrame(rows1, schema).write.parquet(src)
    run_hll_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    # second run: overlapping + new keys — only the new ones may move regs
    rows2 = [
        (1000 + i, t0 + timedelta(minutes=1), 100 + (i % 200), "click", 1.0, None)
        for i in range(300)
    ]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    run_hll_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    last = (
        spark.read.parquet(sink)
        .where(F.col("g") == "click")
        .orderBy(F.desc("batch_id"))
        .first()
    )
    batch = sketches.hll_cardinality(
        spark.read.parquet(src).selectExpr(
            "event_type as g", "cast(user_id as string) as k"
        ),
        "g",
        "k",
    ).first()
    assert last["zero_registers"] == batch["zero_registers"]
    assert last["sum_rank"] == batch["sum_rank"]
    assert last["hll_estimate"] == batch["hll_estimate"]
    # 150 ∪ {100..299} = 300 distinct; estimate within the 5σ bound
    assert abs(last["hll_estimate"] - 300) <= 5 * sketches.hll_error_bound(12) * 300 + 5


def test_streaming_quantile_matches_batch_sketch_across_restart(spark, tmp_path):
    """applyInPandasWithState histogram quantile: bucket counts merge by
    addition across micro-batches and a checkpoint restart, landing on
    the exact batch-sketch estimate over the union."""
    from datetime import timedelta

    from prom_etl_db_spark.functions import sketches
    from prom_etl_db_spark.streaming.stateful import run_qhist_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "qh_src")
    sink = str(tmp_path / "qh_sink")
    ckpt = str(tmp_path / "qh_ckpt")
    t0 = datetime(2024, 3, 1, 0, 0)

    rows1 = [(i, t0, 0, "click", float((i * 7) % 500), None) for i in range(800)]
    spark.createDataFrame(rows1, schema).write.parquet(src)
    run_qhist_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    rows2 = [
        (1000 + i, t0 + timedelta(minutes=1), 0, "click", float((i * 13) % 300), None)
        for i in range(500)
    ]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    run_qhist_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    last = (
        spark.read.parquet(sink)
        .where(F.col("g") == "click")
        .orderBy(F.desc("batch_id"))
        .first()
    )
    batch = sketches.quantile_histogram(
        spark.read.parquet(src).selectExpr("event_type as g", "value as v"),
        "g",
        "v",
        q=0.9,
        bins=128,
        lo=0.0,
        hi=500.0,
    ).first()
    assert last["n_values"] == batch["n_values"] == 1300
    assert last["q_estimate"] == batch["q_estimate"]


def test_streaming_countmin_matches_batch_sketch_across_restart(spark, tmp_path):
    """applyInPandasWithState count-min: counters add across micro-
    batches and a checkpoint restart; the final state's estimates (via
    the batch probe API over the union) bound every key's true count
    from above, and integer state fingerprints match the batch build."""
    from datetime import timedelta

    from prom_etl_db_spark.functions import sketches
    from prom_etl_db_spark.streaming.stateful import run_countmin_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "cm_src")
    sink = str(tmp_path / "cm_sink")
    ckpt = str(tmp_path / "cm_ckpt")
    t0 = datetime(2024, 3, 1, 0, 0)

    rows1 = [(i, t0, i % 60, "click", 1.0, None) for i in range(300)]
    spark.createDataFrame(rows1, schema).write.parquet(src)
    run_countmin_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    rows2 = [(1000 + i, t0 + timedelta(minutes=1), i % 90, "click", 1.0, None)
             for i in range(200)]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    run_countmin_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    last = (
        spark.read.parquet(sink)
        .where(F.col("g") == "click")
        .orderBy(F.desc("batch_id"))
        .first()
    )
    assert last["n_rows"] == 500
    assert last["cells_sum"] == 500 * 4
    # batch dual over the union: same cell map -> the batch estimates'
    # max must equal (or bound) the stream state's max cell
    ev = spark.read.parquet(src).selectExpr("cast(user_id as string) as k")
    probes = ev.distinct()
    est = {
        r["k"]: r["cm_estimate"]
        for r in sketches.countmin_estimates(ev, "k", probes).collect()
    }
    exact = {r["k"]: r["c"] for r in ev.groupBy("k").count()
             .withColumnRenamed("count", "c").collect()}
    assert all(est[k] >= exact[k] for k in exact)
    assert max(est.values()) <= last["max_cell"]


def test_streaming_space_saving_guarantees_across_restart(spark, tmp_path):
    """applyInPandasWithState space-saving: after a checkpoint restart,
    the k-slot summary still carries the Metwally guarantees over the
    UNION of both runs — every item with true count > N/k is present,
    and true ≤ est ≤ true + err for every monitored item. (The exact
    slot image is arrival-order-dependent; the guarantees are not.)"""
    from datetime import timedelta

    from prom_etl_db_spark.streaming.stateful import run_space_saving_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "ss_src")
    sink = str(tmp_path / "ss_sink")
    ckpt = str(tmp_path / "ss_ckpt")
    t0 = datetime(2024, 3, 1, 0, 0)

    def burst(base, spec):
        rows = []
        i = base
        for uid, cnt in spec:
            for _ in range(cnt):
                rows.append((i, t0 + timedelta(seconds=i - base), uid, "click",
                             1.0, None))
                i += 1
        return rows

    # run 1: users 1/2/3 dominate over 50 light users (2 each)
    spec1 = [(1, 300), (2, 200), (3, 100)] + [(100 + u, 2) for u in range(50)]
    spark.createDataFrame(burst(0, spec1), schema).write.parquet(src)
    run_space_saving_stream(
        spark, src, sink, ckpt, schema=schema, k=8
    ).awaitTermination(120)

    # run 2 (restart from the checkpoint): user 4 surges past the bar
    spec2 = [(4, 250), (1, 50)] + [(200 + u, 2) for u in range(40)]
    spark.createDataFrame(burst(10_000, spec2), schema).write.mode(
        "append"
    ).parquet(src)
    run_space_saving_stream(
        spark, src, sink, ckpt, schema=schema, k=8
    ).awaitTermination(120)

    last = (
        spark.read.parquet(sink)
        .where(F.col("g") == "click")
        .orderBy(F.desc("batch_id"))
        .first()
    )
    true = {}
    for uid, cnt in spec1 + spec2:
        true[str(uid)] = true.get(str(uid), 0) + cnt
    n = sum(true.values())
    assert last["n_seen"] == n
    assert len(last["items"]) == 8
    summary = dict(zip(last["items"], zip(last["counts"], last["errs"])))
    # every true heavy hitter (count > N/k) is monitored
    for uid, cnt in true.items():
        if cnt > n / 8:
            assert uid in summary, uid
    # estimate bounds hold for every monitored item
    for it, (est, err) in summary.items():
        t = true.get(it, 0)
        assert t <= est <= t + err, (it, t, est, err)


def test_streaming_cdc_latest_matches_batch_across_restart(spark, tmp_path):
    """The continuously-maintained CDC view must equal
    store.apply_cdc_latest over the UNION of both runs: surviving keys
    and their winning (version, value) agree, deleted keys appear only
    as tombstones — and a REPLAYED older change in run 2 must not
    regress the view (the state remembers, batch recomputes)."""
    from datetime import timedelta

    from prom_etl_db_spark.store import apply_cdc_latest
    from prom_etl_db_spark.streaming.stateful import run_cdc_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "cdc_src")
    sink = str(tmp_path / "cdc_sink")
    ckpt = str(tmp_path / "cdc_ckpt")
    t0 = datetime(2024, 3, 1, 0, 0)

    rows1 = [
        (1, t0, 1, "click", 1.0, None),
        (2, t0 + timedelta(minutes=1), 1, "view", 2.0, None),
        (3, t0, 2, "click", 5.0, None),
        (4, t0 + timedelta(minutes=2), 2, "error", 0.0, None),  # delete
        (5, t0, 3, "click", 7.0, None),
    ]
    spark.createDataFrame(rows1, schema).write.parquet(src)
    run_cdc_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    rows2 = [
        (2, t0 + timedelta(minutes=1), 1, "view", 2.0, None),  # exact replay
        (1, t0, 3, "purchase", 9.9, None),  # OLDER change (same ts, lower id)
        (6, t0 + timedelta(minutes=5), 4, "signup", 4.0, None),  # new key
    ]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    run_cdc_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy(F.desc("batch_id"))
    latest = (
        spark.read.parquet(sink)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    stream_live = {
        r["k"]: (r["ord_ts"], r["ord_seq"], r["value"])
        for r in latest.where(F.col("is_deleted") == "n").collect()
    }
    stream_dead = {r["k"] for r in latest.where(F.col("is_deleted") == "y").collect()}

    all_changes = spark.read.parquet(src).select(
        F.col("user_id").cast("string").alias("k"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ord_ts"),
        F.col("event_id").alias("ord_seq"),
        F.col("event_type").alias("op"),
        "value",
    )
    batch = {
        r["k"]: (r["ord_ts"], r["ord_seq"], r["value"])
        for r in apply_cdc_latest(
            all_changes, ["k"], ["ord_ts", "ord_seq"], op_col="op",
            delete_op="error",
        ).collect()
    }
    assert stream_live == batch
    assert stream_dead == {"2"}
    # the replayed-older-change key kept its newer value
    assert stream_live["3"][2] == 7.0


def test_streaming_psi_matches_batch_across_restart(spark, tmp_path):
    """Streaming PSI against a frozen first-batch baseline: after a
    checkpoint restart, the second run's score must EQUAL the batch
    psi_drift over the union with the file-membership split — baseline
    state crossed the checkpoint intact. A genuinely shifted second
    distribution must read > 0.25 (the drift rule of thumb the batch
    tests also pin)."""
    from datetime import timedelta

    from prom_etl_db_spark.functions.quality import psi_drift
    from prom_etl_db_spark.streaming.stateful import run_psi_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "psi_src")
    sink = str(tmp_path / "psi_sink")
    ckpt = str(tmp_path / "psi_ckpt")
    t0 = datetime(2024, 3, 1, 0, 0)

    # run 1 (baseline): values uniform-ish over [0, 250)
    rows1 = [(i, t0, 0, "click", float((i * 17) % 250), None) for i in range(600)]
    spark.createDataFrame(rows1, schema).write.parquet(src)
    run_psi_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    # run 2 (restart): shifted to [250, 375) — bins in [375, 500) stay
    # empty on BOTH sides, pinning that the stream (like the batch
    # operator's per-observed-bin agg) contributes NO smoothed term for
    # them
    rows2 = [
        (1000 + i, t0 + timedelta(minutes=1), 0, "click",
         250.0 + float((i * 13) % 125), None)
        for i in range(400)
    ]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    run_psi_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    last = (
        spark.read.parquet(sink)
        .where(F.col("g") == "click")
        .orderBy(F.desc("batch_id"))
        .first()
    )
    assert last["n_ref"] == 600 and last["n_cur"] == 400

    batch = (
        psi_drift(
            spark.read.parquet(src),
            "event_type",
            "value",
            F.col("event_id") < 1000,  # reference slice = run-1 file
        )
        .where(F.col("event_type") == "click")
        .first()
    )
    assert last["psi"] == batch["psi"]
    assert last["psi"] > 0.25


class _FakeState:
    """Minimal GroupState stand-in for driving folds as plain functions."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    @property
    def hasTimedOut(self):
        return False

    def setTimeoutDuration(self, ms):
        pass


def test_counter_fold_sorts_across_arrow_chunks():
    """A group bigger than arrow.maxRecordsPerBatch arrives as MULTIPLE
    chunks in arbitrary order — the fold must concat-then-sort, or a
    later chunk's earlier timestamps read as counter drops (spurious
    resets). Regression: per-chunk sorting double-counted this series."""
    import pandas as pd

    from prom_etl_db_spark.streaming.stateful import _fold_counter

    # monotone counter 1..6 split so chunk 2 holds EARLIER timestamps
    chunk1 = pd.DataFrame({"timestamp": [4, 5, 6], "value": [4.0, 5.0, 6.0]})
    chunk2 = pd.DataFrame({"timestamp": [1, 2, 3], "value": [1.0, 2.0, 3.0]})
    state = _FakeState()
    (out,) = _fold_counter(("s",), iter([chunk1, chunk2]), state)
    # a monotone counter's total increase is last - first = 5, no resets
    assert out["total_increase"][0] == 5.0
    assert out["last_value"][0] == 6.0 and out["last_ts"][0] == 6


def test_qhist_and_psi_folds_skip_nan_and_clamp_inf():
    """A NULL value reaches the fold as NaN — it must be skipped like the
    batch twin's SQL aggregation, not crash the streaming query; ±inf
    clamps to the edge bins. Regression: int(NaN) raised ValueError."""
    import pandas as pd

    from prom_etl_db_spark.streaming.stateful import make_psi_fold, make_qhist_fold

    vals = pd.DataFrame(
        {"v": [1.0, float("nan"), float("inf"), float("-inf"), 2.0]}
    )
    qfold = make_qhist_fold(bins=4, lo=0.0, hi=4.0, q=0.5)
    state = _FakeState()
    (out,) = qfold(("g",), iter([vals]), state)
    assert out["n_values"][0] == 4  # NaN skipped, infs clamped and kept

    pfold = make_psi_fold(bins=4, lo=0.0, hi=4.0)
    pstate = _FakeState()
    (first,) = pfold(("g",), iter([vals]), pstate)
    # first batch freezes the baseline; a second batch must also survive
    (second,) = pfold(("g",), iter([vals]), pstate)
    assert second["psi"][0] is not None


def test_qhist_fold_all_null_group_emits_null_estimate():
    """r4 audit: a group whose every value so far is NULL (NaN in the
    fold) has an empty histogram — the fold must emit a NULL estimate
    like the batch twin's empty group, not crash on round(None, 6)."""
    import pandas as pd

    from prom_etl_db_spark.streaming.stateful import make_qhist_fold

    fold = make_qhist_fold(bins=4, lo=0.0, hi=4.0, q=0.5)
    state = _FakeState()
    (out,) = fold(("g",), iter([pd.DataFrame({"v": [float("nan")] * 3})]),
                  state)
    assert out["n_values"][0] == 0 and out["q_estimate"][0] is None
    # and the group recovers once real values arrive
    (out2,) = fold(("g",), iter([pd.DataFrame({"v": [1.0, 3.0]})]), state)
    assert out2["n_values"][0] == 2 and out2["q_estimate"][0] is not None


def test_counter_fold_equal_timestamps_fold_deterministically():
    """r4 audit: equal-timestamp samples must fold in a deterministic
    order (stable sort + value tiebreak) — quicksort's arbitrary tie
    order made total_increase differ between a run and its checkpoint
    replay. With values (5, 2) at the same instant after a 1, ascending-
    value order folds 1 → 2 (+1) → 5 (+3): total 4, every run."""
    import pandas as pd

    from prom_etl_db_spark.streaming.stateful import _fold_counter

    frames = [
        pd.DataFrame({"timestamp": [1, 2, 2], "value": [1.0, 5.0, 2.0]}),
    ]
    results = set()
    for _ in range(5):
        state = _FakeState()
        (out,) = _fold_counter(("s",), iter([f.copy() for f in frames]),
                               state)
        results.add(float(out["total_increase"][0]))
    assert results == {4.0}


def test_space_saving_fold_rejects_reserved_empty_key():
    """r4 audit: '' is the n_seen bookkeeping slot key; a data item
    claiming it would be silently dropped on the next state round-trip —
    the fold fails loudly instead."""
    import pandas as pd
    import pytest

    from prom_etl_db_spark.streaming.stateful import make_ss_fold

    fold = make_ss_fold(4)
    with pytest.raises(ValueError, match="reserved"):
        list(fold(("g",), iter([pd.DataFrame({"k": ["a", ""]})]),
                  _FakeState()))


def test_streaming_gorilla_matches_batch_across_restart(spark, tmp_path):
    """applyInPandasWithState Gorilla accounting: after two runs sharing
    a checkpoint (a restart), the final per-series totals must equal the
    batch compressor's block sums over the union — the XOR control
    window and delta chain crossed the checkpoint intact. The fixture's
    second chunk STARTS mid-window (values continue the first chunk's
    xor pattern), so a reset-on-restart bug cannot hide."""
    from datetime import timedelta

    from prom_etl_db_spark.functions.gorilla import gorilla_compress_features
    from prom_etl_db_spark.streaming.stateful import run_gorilla_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "go_src")
    sink = str(tmp_path / "go_sink")
    ckpt = str(tmp_path / "go_ckpt")
    t0 = datetime(2024, 3, 1, 0, 0)

    def mkrows(lo, hi):
        rows = []
        for i in range(lo, hi):
            val = float([7, 7, 9, 1000, 7][i % 5]) + (i % 3) * 0.25
            rows.append(
                (i, t0 + timedelta(seconds=13 * i + (i % 7)), i % 50,
                 "click" if i % 2 else "error", val, None)
            )
        return rows

    spark.createDataFrame(mkrows(0, 300), schema).write.parquet(src)
    run_gorilla_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)
    spark.createDataFrame(mkrows(300, 500), schema).write.mode("append").parquet(src)
    run_gorilla_stream(spark, src, sink, ckpt, schema=schema).awaitTermination(120)

    got = {
        r["series"]: r
        for r in (
            spark.read.parquet(sink)
            .withColumn(
                "rn",
                F.row_number().over(
                    __import__("pyspark").sql.Window.partitionBy("series").orderBy(
                        F.desc("batch_id")
                    )
                ),
            )
            .where(F.col("rn") == 1)
            .collect()
        )
    }
    batch = (
        gorilla_compress_features(
            spark.read.parquet(src), series_col="event_type"
        )
        .groupBy("series")
        .agg(
            F.sum("n_samples").alias("n"),
            F.sum("ts_bits").alias("tsb"),
            F.sum("val_bits").alias("vb"),
            F.sum("n_xor_zero").alias("xz"),
        )
        .collect()
    )
    assert len(batch) == 2 and set(got) == {"click", "error"}
    for b in batch:
        g = got[b["series"]]
        assert g["n_samples"] == b["n"]
        assert g["ts_bits"] == b["tsb"]
        assert g["val_bits"] == b["vb"]
        assert g["n_xor_zero"] == b["xz"]
        assert g["bits_per_sample"] == round((b["tsb"] + b["vb"]) / b["n"], 4)


def test_streaming_vad_matches_batch_across_restart(spark, tmp_path):
    """applyInPandasWithState VAD segmentation (r6): two runs sharing a
    checkpoint, with the file split INSIDE the longest voiced island so
    the restart lands mid-segment — the open-segment state must cross
    the checkpoint intact and the sink's final row per (clip, segment)
    must equal the batch `speech_segments_with_descriptors` output
    exactly (span, counts, energies, peak bin)."""
    from prom_etl_db_spark.functions import spectral
    from prom_etl_db_spark.streaming.stateful import run_vad_stream

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "doc_id long")
    frames = spectral.spectrogram_frame_features(
        docs, synth=spectral.vad_fixture_samples
    ).select("media_id", "frame", "e_total", "dominant_bin")

    expected = spectral.speech_segments_with_descriptors(docs).collect()
    assert expected, "fixture must produce voiced segments"
    longest = max(expected, key=lambda r: r["n_frames"])
    assert longest["n_frames"] >= 2, "need an island to split a restart inside"
    cut = longest["start_frame"] + 1  # restart lands mid-island

    src = str(tmp_path / "vad_src")
    sink = str(tmp_path / "vad_sink")
    ckpt = str(tmp_path / "vad_ckpt")
    frames.where(F.col("frame") < cut).write.parquet(src)
    run_vad_stream(
        spark, src, sink, ckpt, threshold=spectral.VAD_THRESHOLD
    ).awaitTermination(120)
    frames.where(F.col("frame") >= cut).write.mode("append").parquet(src)
    run_vad_stream(
        spark, src, sink, ckpt, threshold=spectral.VAD_THRESHOLD
    ).awaitTermination(120)

    from pyspark.sql import Window

    w = Window.partitionBy("media_id", "segment").orderBy(F.desc("batch_id"))
    got = {
        (r["media_id"], r["segment"]): r
        for r in spark.read.parquet(sink)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    assert len(got) == len(expected)
    for e in expected:
        g = got[(e["media_id"], e["segment"])]
        for c in ("start_frame", "end_frame", "n_frames", "seg_energy",
                  "peak_dominant_bin"):
            assert g[c] == e[c], (e["media_id"], e["segment"], c, g[c], e[c])


def test_streaming_warc_matches_batch_across_restart(spark, tmp_path):
    """Crawl ingestion (r6): the streaming WARC walk must equal the
    batch parse, and a second run over the same checkpoint must ingest
    ONLY newly-landed files — one record set, no dup rows."""
    from prom_etl_db_spark.functions.warc import build_warc_record, parse_warc_records
    from prom_etl_db_spark.streaming.jobs import stream_warc_to_records

    def warc_file(i: int) -> bytes:
        trap = b"HTTP/1.1 200 OK\r\n\r\nWARC/1.0\r\nfake\r\n\r\nbody%d" % i
        return build_warc_record(
            [("WARC-Type", "warcinfo"), ("WARC-Record-ID", f"<urn:uuid:{i}-0>")],
            b"software: s",
        ) + build_warc_record(
            [("WARC-Type", "response"), ("WARC-Record-ID", f"<urn:uuid:{i}-1>"),
             ("WARC-Target-URI", f"http://h/{i}")],
            trap,
        )

    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    batch1 = spark.createDataFrame(
        [(i, warc_file(i)) for i in range(3)], "file_id long, warc binary"
    )
    batch1.write.mode("append").parquet(str(src))
    q = stream_warc_to_records(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)
    got1 = spark.read.parquet(str(sink))
    assert got1.count() == 6  # 2 records x 3 files; traps did not split
    # restart with one NEW file: only its records append
    spark.createDataFrame(
        [(99, warc_file(99))], "file_id long, warc binary"
    ).write.mode("append").parquet(str(src))
    q2 = stream_warc_to_records(spark, str(src), str(sink), str(ckpt))
    q2.awaitTermination(120)
    got2 = spark.read.parquet(str(sink))
    assert got2.count() == 8
    assert got2.where("file_id = 99").count() == 2
    # stream ≡ batch on the same inputs
    all_files = spark.read.parquet(str(src))
    batch = parse_warc_records(all_files)
    cols = ["file_id", "rec_idx", "warc_type", "record_id", "target_uri",
            "content_length", "payload_md5"]
    assert sorted(map(tuple, got2.select(*cols).collect())) == sorted(
        map(tuple, batch.select(*cols).collect())
    )


def test_streaming_remote_write_rollup_matches_batch_across_restart(spark, tmp_path):
    """Push-arc twin (r6): the streaming decode→route→rollup must equal
    the batch chain over every CLOSED window, and restart ingests only
    new files. Append mode emits a window only once the watermark
    passes it, so each run plants a pusher sample in a later window."""
    from prom_etl_db_spark.functions import remote_write as RW
    from prom_etl_db_spark.operators.relabel import hashmod_column
    from prom_etl_db_spark.streaming.jobs import stream_remote_write_rollup
    from pyspark.sql import functions as F

    base_ms = 1706572800000  # 2024-01-30T00:00Z
    H = 3_600_000

    def payload(name: str, user: int, value: float, off_ms: int) -> bytes:
        return RW.snappy_compress(
            RW.encode_write_request(
                [{"labels": {"__name__": name, "user": str(user)},
                  "samples": [(value, base_ms + off_ms)]}]
            )
        )

    # run 1: 20 samples in window W0 + a pusher 4h later (opens W4,
    # advances the watermark past W0's end)
    rows1 = [(i, payload("purchase" if i % 2 else "click", i % 5, float(i), i * 1000))
             for i in range(20)]
    rows1.append((50, payload("pusher", 0, 1.0, 4 * H)))
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame(rows1, "push_id long, body binary").write.mode(
        "append"
    ).parquet(str(src))
    q = stream_remote_write_rollup(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)
    got1 = spark.read.parquet(str(sink))
    assert got1.count() > 0
    assert got1.agg(F.min("window_start")).first()[0].hour == 0  # W0 emitted
    # run 2: 4 samples join the pusher's W4 window + a new pusher at 8h
    rows2 = [(100 + i, payload("view", i, 1.0, 4 * H + i * 1000)) for i in range(4)]
    rows2.append((200, payload("pusher2", 0, 1.0, 8 * H)))
    spark.createDataFrame(rows2, "push_id long, body binary").write.mode(
        "append"
    ).parquet(str(src))
    q2 = stream_remote_write_rollup(spark, str(src), str(sink), str(ckpt))
    q2.awaitTermination(120)
    got2 = spark.read.parquet(str(sink))
    # stream ≡ batch over the CLOSED windows (everything except the
    # final 8h pusher, whose window never closed)
    closed = [r for r in rows1 + rows2 if r[0] != 200]
    samples = RW.remote_write_samples(
        spark.createDataFrame(closed, "push_id long, body binary")
    )
    batch = (
        samples.select(
            "metric_name",
            hashmod_column(F.col("labels")["user"], 8).alias("shard"),
            "value",
        )
        .groupBy("metric_name", "shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    got_g = got2.groupBy("metric_name", "shard").agg(
        F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value")
    )
    assert sorted(map(tuple, got_g.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_url_dedup_matches_batch_across_restart(spark, tmp_path):
    """Crawl-arc URL dedup twin (r7): the streaming seen-set
    (dropDuplicatesWithinWatermark on canonical_url, state bounded by
    the recrawl horizon) must admit exactly the batch url_dedup keep
    set over the union of both file batches, across a checkpoint
    restart — a canonical URL admitted before the restart must NOT be
    re-admitted after it (the seen-set crosses the checkpoint), and
    syntactic variants must collapse to one admission."""
    from datetime import datetime, timedelta

    from prom_etl_db_spark.functions.urlnorm import url_dedup
    from prom_etl_db_spark.streaming.jobs import stream_url_dedup

    t0 = datetime(2024, 1, 1)
    # batch 1: docs 0-9 — pages p0..p4 each under two syntactic variants
    rows1 = [
        (
            i,
            (
                f"http://www.Site.com:80/a/../p{i // 2}?b=2&a=1#f"
                if i % 2
                else f"HTTP://WWW.SITE.COM/./p{i // 2}?a=1&b=2"
            ),
            t0 + timedelta(minutes=i),
        )
        for i in range(10)
    ]
    # batch 2 (lands after the restart): docs 10-15 — pages p3..p5:
    # p3/p4 are RE-fetches of batch-1 pages (must not re-admit), p5 new
    rows2 = [
        (10 + j, f"http://www.site.com/p{3 + j // 2}?a=1&b=2",
         t0 + timedelta(minutes=60 + j))
        for j in range(6)
    ]
    schema = "doc_id long, url string, ts timestamp"
    src = str(tmp_path / "url_src")
    sink = str(tmp_path / "url_sink")
    ckpt = str(tmp_path / "url_ckpt")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src)
    stream_url_dedup(spark, src, sink, ckpt).awaitTermination(120)
    got1 = spark.read.parquet(sink)
    assert got1.count() == 5  # p0..p4, variants collapsed
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream_url_dedup(spark, src, sink, ckpt).awaitTermination(120)
    got2 = spark.read.parquet(sink)
    # p5 is the only new admission; p3/p4 re-fetches blocked ACROSS the
    # restart by the checkpointed seen-set
    assert got2.count() == 6
    assert got2.select("canonical_url").distinct().count() == 6
    # stream ≡ batch over the union: same canonical set, same keepers
    # (arrival order = doc_id order, so first-arrival = keep-min)
    union = spark.createDataFrame(rows1 + rows2, schema)
    batch = url_dedup(union.select("doc_id", "url"))
    assert {
        (r["canonical_url"], r["doc_id"])
        for r in got2.select("canonical_url", "doc_id").collect()
    } == {
        (r["canonical_url"], r["keep_doc_id"])
        for r in batch.select("canonical_url", "keep_doc_id").collect()
    }


def test_streaming_otlp_rollup_matches_batch_across_restart(spark, tmp_path):
    """OTLP push twin (r7): the streaming decode→route→rollup must equal
    the batch chain over every CLOSED window across a restart — the
    same contract stream_remote_write_rollup holds, proving BOTH push
    protocols have stream twins over one operator set. Every third
    payload is gzip-compressed (the content-encoding sniff runs inside
    the stream)."""
    import gzip

    from prom_etl_db_spark.functions import otlp as OT
    from prom_etl_db_spark.operators.relabel import hashmod_column
    from prom_etl_db_spark.streaming.jobs import stream_otlp_rollup
    from pyspark.sql import functions as F

    base_ns = 1706572800_000000000  # 2024-01-30T00:00Z
    H = 3_600_000_000_000

    def payload(name: str, user: int, value: float, off_ns: int, gz: bool) -> bytes:
        enc = OT.encode_export_metrics(
            [{"resource": {}, "scopes": [{"name": "app", "metrics": [{
                "name": name, "type": "gauge",
                "points": [{"attrs": {"user": str(user)},
                            "time_unix_nano": base_ns + off_ns,
                            "value": value}],
            }]}]}]
        )
        return gzip.compress(enc) if gz else enc

    rows1 = [
        (i, payload("purchase" if i % 2 else "click", i % 5, float(i),
                    i * 1_000_000_000_000 // 1000, i % 3 == 0))
        for i in range(20)
    ]
    rows1.append((50, payload("pusher", 0, 1.0, 4 * H, False)))
    src, sink, ckpt = tmp_path / "osrc", tmp_path / "osink", tmp_path / "ockpt"
    src.mkdir()
    spark.createDataFrame(rows1, "push_id long, body binary").write.mode(
        "append"
    ).parquet(str(src))
    stream_otlp_rollup(spark, str(src), str(sink), str(ckpt)).awaitTermination(120)
    got1 = spark.read.parquet(str(sink))
    assert got1.count() > 0
    assert got1.agg(F.min("window_start")).first()[0].hour == 0
    rows2 = [(100 + i, payload("view", i, 1.0, 4 * H + i * 1_000_000_000, False))
             for i in range(4)]
    rows2.append((200, payload("pusher2", 0, 1.0, 8 * H, True)))
    spark.createDataFrame(rows2, "push_id long, body binary").write.mode(
        "append"
    ).parquet(str(src))
    stream_otlp_rollup(spark, str(src), str(sink), str(ckpt)).awaitTermination(120)
    got2 = spark.read.parquet(str(sink))
    closed = [r for r in rows1 + rows2 if r[0] != 200]
    samples = OT.otlp_samples(
        spark.createDataFrame(closed, "push_id long, body binary")
    )
    batch = (
        samples.where(F.col("data_type") == "gauge")
        .select(
            "metric_name",
            hashmod_column(F.col("attrs")["user"], 8).alias("shard"),
            F.col("value_double").alias("value"),
        )
        .groupBy("metric_name", "shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    got_g = got2.groupBy("metric_name", "shard").agg(
        F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value")
    )
    a = {(r["metric_name"], r["shard"]): (r["n"], round(r["sum_value"], 6))
         for r in got_g.collect()}
    b = {(r["metric_name"], r["shard"]): (r["n"], round(r["sum_value"], 6))
         for r in batch.collect()}
    assert a == b


def test_streaming_minhash_neardup_matches_batch_across_restart(spark, tmp_path):
    """Streaming LSH seen-set (r7): verified near-dup pairs discovered
    online must equal batch minhash_lsh_dup_pairs over the union of
    both file batches, across a checkpoint restart — including a pair
    whose two members arrive in DIFFERENT runs (the resident shingle
    sets must cross the checkpoint). Cross-band duplicate emissions are
    identical rows; compare through distinct()."""
    from prom_etl_db_spark.functions.dedup import minhash_lsh_dup_pairs
    from prom_etl_db_spark.streaming.stateful import run_neardup_stream
    from pyspark.sql import functions as F

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest tonight")
    alt = base.replace("green", "blue")
    other = ("completely different content about prometheus metrics and "
             "spark pipelines with nothing shared across these documents at all")
    rows1 = [
        (1, base),
        (2, base + " extra"),        # near-dup of 1 (same run)
        (3, other),
        (4, other.replace("nothing", "little")),  # near-dup of 3 (same run)
    ]
    rows2 = [
        (5, alt),                    # near-dup of 1/2 ACROSS the restart
        (6, "yet another unrelated text that talks about zstd frames and "
            "huffman trees in great detail for quite a while longer here"),
    ]
    src = str(tmp_path / "nd_src")
    sink = str(tmp_path / "nd_sink")
    ckpt = str(tmp_path / "nd_ckpt")
    spark.createDataFrame(rows1, "doc_id long, text string").coalesce(1).write.parquet(src)
    run_neardup_stream(spark, src, sink, ckpt, threshold=0.5).awaitTermination(120)
    got1 = spark.read.parquet(sink).select("id_a", "id_b", "jaccard").distinct()
    n1 = got1.count()
    assert n1 > 0  # same-run pairs found
    spark.createDataFrame(rows2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_neardup_stream(spark, src, sink, ckpt, threshold=0.5).awaitTermination(120)
    got2 = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(sink)
        .select("id_a", "id_b", "jaccard").distinct().collect()
    }
    batch = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_dup_pairs(
            spark.createDataFrame(rows1 + rows2, "doc_id long, text string"),
            threshold=0.5,
        ).collect()
    }
    assert got2 == batch
    # the cross-restart pair specifically: doc 5 against residents 1/2
    assert any(a in (1, 2) and b == 5 for a, b, _ in got2)


def test_neardup_bucket_state_capped_under_mirror_pileup():
    """r8 (VERDICT r7 'what's wrong' #1): TRUE duplicates all land in
    one bucket by design — an adversarial mirror crawl (many copies of
    one page) must NOT grow a bucket's state or its verify loop without
    bound. With cap K: residents stay <= K, each arrival verifies
    against <= K residents (O(n*K), not O(n^2)), and the drop counter
    accounts for every eviction."""
    import pandas as pd

    from prom_etl_db_spark.streaming.stateful import make_neardup_fold

    K, N = 8, 50
    fold = make_neardup_fold(threshold=0.5, ttl_minutes=None, max_residents=K)
    sh = list(range(100, 140))  # identical shingle set for every copy
    pdf = pd.DataFrame({"id": list(range(N)), "sh": [sh] * N})
    state = _FakeState()
    (out,) = fold((3, 77), iter([pdf]), state)
    ids, shs, dropped = state.get
    assert len(ids) == K and len(shs) == K
    assert dropped == N - K
    # survivors are the NEWEST K (evict-oldest)
    assert list(ids) == list(range(N - K, N))
    # arrival i verifies against min(i, K) residents, all identical -> pairs
    expected_pairs = sum(min(i, K) for i in range(N))
    assert len(out) == expected_pairs
    assert (out["jaccard"] == 1.0).all()


def test_neardup_cap_persists_and_resumes_across_folds():
    """The dropped counter and capped resident set must round-trip
    through state across micro-batches, and a fresh arrival still pairs
    against the canonical survivor set."""
    import pandas as pd

    from prom_etl_db_spark.streaming.stateful import make_neardup_fold

    K = 4
    fold = make_neardup_fold(threshold=0.5, ttl_minutes=None, max_residents=K)
    sh = list(range(10))
    state = _FakeState()
    (out1,) = fold((0, 1), iter([pd.DataFrame({"id": range(10), "sh": [sh] * 10})]), state)
    assert state.get[2] == 6 and len(state.get[0]) == K
    (out2,) = fold((0, 1), iter([pd.DataFrame({"id": [99], "sh": [sh]})]), state)
    assert len(out2) == K  # pairs against exactly the K survivors
    assert set(out2["id_a"]) == {6, 7, 8, 9}
    assert len(state.get[0]) == K and state.get[2] == 7


def test_neardup_stream_all_identical_docs_bounded_e2e(spark, tmp_path):
    """End-to-end adversarial stream: 24 byte-identical documents with
    max_residents=4 completes (bounded state), emits only capped pairs,
    and a restart over the same checkpoint keeps working with the
    3-field (ids, shs, dropped) state schema."""
    from pyspark.sql import functions as F

    from prom_etl_db_spark.streaming.stateful import run_neardup_stream

    text = ("mirror mirror on the wall this exact page is hosted on many "
            "domains and every copy is byte identical for the crawler")
    rows1 = [(i, text) for i in range(24)]
    src = str(tmp_path / "mi_src")
    sink = str(tmp_path / "mi_sink")
    ckpt = str(tmp_path / "mi_ckpt")
    spark.createDataFrame(rows1, "doc_id long, text string").coalesce(1).write.parquet(src)
    run_neardup_stream(
        spark, src, sink, ckpt, threshold=0.5, max_residents=4
    ).awaitTermination(120)
    got1 = spark.read.parquet(sink).select("id_a", "id_b").distinct()
    # capped: arrival i pairs with min(i, 4) residents -> 3+2+1+0 inverted:
    # sum(min(i,4) for i in range(24)) = 6 + 4*20 = 86 distinct pairs
    assert got1.count() == sum(min(i, 4) for i in range(24))
    # restart: one more mirror arrives; pairs only against the newest 4
    spark.createDataFrame([(100, text)], "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)
    run_neardup_stream(
        spark, src, sink, ckpt, threshold=0.5, max_residents=4
    ).awaitTermination(120)
    new = (
        spark.read.parquet(sink)
        .select("id_a", "id_b").distinct()
        .where(F.col("id_b") == 100)
    )
    assert new.count() == 4
    assert {r["id_a"] for r in new.collect()} == {20, 21, 22, 23}


def test_streaming_remote_write_v2_rollup_matches_batch(spark, tmp_path):
    """r8: remote-write 2.0 payloads drain through the SAME streaming
    rollup via wire_version=2 — third push protocol, one operator set.
    Stream output over closed windows equals the batch v2 chain."""
    from prom_etl_db_spark.functions import remote_write as RW
    from prom_etl_db_spark.operators.relabel import hashmod_column
    from prom_etl_db_spark.streaming.jobs import stream_remote_write_rollup

    base_ms = 1706572800000
    H = 3_600_000

    def payload(name: str, user: int, value: float, off_ms: int) -> bytes:
        return RW.snappy_compress(
            RW.encode_write_request_v2(
                [{"labels": {"__name__": name, "user": str(user)},
                  "samples": [(value, base_ms + off_ms)]}]
            )
        )

    rows = [(i, payload("purchase" if i % 2 else "click", i % 5, float(i),
                        i * 1000))
            for i in range(16)]
    rows.append((50, payload("pusher", 0, 1.0, 4 * H)))  # closes W0
    src, sink, ckpt = tmp_path / "v2src", tmp_path / "v2sink", tmp_path / "v2ckpt"
    src.mkdir()
    spark.createDataFrame(rows, "push_id long, body binary").write.mode(
        "append"
    ).parquet(str(src))
    stream_remote_write_rollup(
        spark, str(src), str(sink), str(ckpt), wire_version=2
    ).awaitTermination(120)
    got = spark.read.parquet(str(sink))
    closed = [r for r in rows if r[0] != 50]
    batch = (
        RW.remote_write_v2_samples(
            spark.createDataFrame(closed, "push_id long, body binary"))
        .select(
            "metric_name",
            hashmod_column(F.col("labels")["user"], 8).alias("shard"),
            "value",
        )
        .groupBy("metric_name", "shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    g = {(r["metric_name"], r["shard"]): (r["n"], r["sum_value"])
         for r in got.groupBy("metric_name", "shard")
         .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
         .collect()}
    b = {(r["metric_name"], r["shard"]): (r["n"], r["sum_value"])
         for r in batch.collect()}
    assert g == b and len(g) > 0


def test_streaming_ct_increase_matches_batch_across_restart(spark, tmp_path):
    """Later-r8 twin: the CT-aware counter increase (synthetic zero at
    the series' birth for counters born inside the window) must equal
    the batch ct_aware_increase computation over the same pushes, and
    a restart resumes per-series state from the checkpoint (not from
    zero)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions import remote_write as RW
    from prom_etl_db_spark.streaming.jobs import stream_ct_increase

    T0 = 1706572800000
    WSTART = T0 - 15000

    def payload(name, user, samples, ct):
        s = {"labels": {"__name__": name, "user": str(user)},
             "samples": samples}
        if ct is not None:
            s["created_timestamp"] = ct
        return RW.snappy_compress(RW.encode_write_request_v2([s]))

    # run 1: three series — born-in-window, born-before, unknown CT
    rows1 = [
        (1, payload("c", 0, [(5.0, T0), (8.0, T0 + 60000)], T0 - 1000)),
        (2, payload("c", 1, [(5.0, T0), (8.0, T0 + 60000)], T0 - 30000)),
        (3, payload("c", 2, [(5.0, T0), (8.0, T0 + 60000)], None)),
    ]
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame(rows1, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q = stream_ct_increase(spark, str(src), str(sink), str(ckpt),
                           window_start_ms=WSTART)
    q.awaitTermination(120)

    # run 2: later samples for the same series — one with a RESET —
    # must fold onto checkpointed state (first-sample CT rule must NOT
    # re-fire for a series the checkpoint already knows)
    rows2 = [
        (4, payload("c", 0, [(2.0, T0 + 120000)], T0 - 1000)),  # reset to 2
        (5, payload("c", 1, [(11.0, T0 + 120000)], T0 - 30000)),
        (6, payload("c", 2, [(9.0, T0 + 120000)], None)),
    ]
    spark.createDataFrame(rows2, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q2 = stream_ct_increase(spark, str(src), str(sink), str(ckpt),
                            window_start_ms=WSTART)
    q2.awaitTermination(120)

    got = spark.read.parquet(str(sink))
    latest = (
        got.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("series").orderBy(F.desc("batch_id"))),
        ).where(F.col("rn") == 1).select("series", "total_increase")
    )
    stream_totals = {
        r["series"]: r["total_increase"] for r in latest.collect()}

    # batch twin over ALL pushes (the registry query's algebra)
    pts = RW.remote_write_v2_samples(
        spark.createDataFrame(rows1 + rows2, "push_id long, body binary"),
        with_created=True,
    )
    w = Window.partitionBy(
        "metric_name", F.col("labels")["user"]).orderBy("timestamp_ms")
    batch = (
        pts.withColumn("prev", F.lag("value").over(w))
        .withColumn(
            "contrib",
            F.when(
                F.col("prev").isNull(),
                F.when(F.col("created_timestamp_ms") >= F.lit(WSTART),
                       F.col("value")).otherwise(F.lit(0.0)),
            )
            .when(F.col("value") < F.col("prev"), F.col("value"))
            .otherwise(F.col("value") - F.col("prev")),
        )
        .groupBy(F.col("labels")["user"].alias("user"))
        .agg(F.sum("contrib").alias("inc"))
    )
    batch_by_user = {r["user"]: r["inc"] for r in batch.collect()}
    # born-in-window: 5 (CT) + 3 + 2 (reset) = 10
    assert batch_by_user["0"] == 10.0
    # born-before: 0 + 3 + 3 = 6; unknown CT: 0 + 3 + 1 = 4
    assert batch_by_user["1"] == 6.0 and batch_by_user["2"] == 4.0
    for series, total in stream_totals.items():
        user = [kv["value"] for kv in __import__("json").loads(series)
                if kv["key"] == "user"][0]
        assert total == batch_by_user[user], series


def test_streaming_otlp_delta_accumulate_matches_batch_across_restart(
        spark, tmp_path):
    """Later-r8 twin: per-series delta accumulation must equal the
    batch otlp_delta_to_cumulative over the same payloads, resume from
    the checkpoint (run-2 deltas fold onto run-1 totals), and refuse a
    cumulative-temporality point loudly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions import otlp as O
    from prom_etl_db_spark.operators import promql
    from prom_etl_db_spark.streaming.jobs import stream_otlp_delta_accumulate

    T0 = 1706572800_000_000_000

    def payload(eid, vals, temporality=1):
        return O.encode_export_metrics([{
            "resource": {},
            "scopes": [{"name": "app", "version": "1", "metrics": [{
                "name": "req", "unit": "1", "type": "sum",
                "temporality": temporality, "is_monotonic": True,
                "points": [{"attrs": {"eid": str(eid)},
                            "time_unix_nano": T0 + i * 1_000_000_000,
                            "value": float(v)}
                           for i, v in enumerate(vals)],
            }]}],
        }])

    rows1 = [(1, payload("a", [5.0, 3.0])), (2, payload("b", [2.0, -1.0]))]
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame(rows1, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q = stream_otlp_delta_accumulate(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)

    # run-2 deltas carry fresh timestamps (r9: the BATCH operator now
    # refuses duplicate delta timestamps — nondeterministic fold order
    # — so the batch-equality leg below needs distinct ts; the STREAM
    # fold remains order-independent addition and would absorb any
    # arrival order)
    def payload2(eid, vals, temporality=1):
        return O.encode_export_metrics([{
            "resource": {},
            "scopes": [{"name": "app", "version": "1", "metrics": [{
                "name": "req", "unit": "1", "type": "sum",
                "temporality": temporality, "is_monotonic": True,
                "points": [{"attrs": {"eid": str(eid)},
                            "time_unix_nano": T0 + (10 + i) * 1_000_000_000,
                            "value": float(v)}
                           for i, v in enumerate(vals)],
            }]}],
        }])

    rows2 = [(3, payload2("a", [4.0])), (4, payload2("b", [10.0]))]
    spark.createDataFrame(rows2, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q2 = stream_otlp_delta_accumulate(spark, str(src), str(sink), str(ckpt))
    q2.awaitTermination(120)

    got = spark.read.parquet(str(sink))
    # latest cumulative per series = checkpointed total + run-2 delta
    latest = got.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("series").orderBy(
                F.desc("batch_id"), F.desc("timestamp_ms")))
    ).where(F.col("rn") == 1)
    totals = {r["series"].split("\x1f")[1]: r["cum_value"]
              for r in latest.collect()}
    assert totals["a"] == 12.0   # 5 + 3 + 4
    assert totals["b"] == 11.0   # 2 - 1 + 10
    # batch twin over all payloads: same final cumulatives
    pts = O.otlp_samples(spark.createDataFrame(
        rows1 + rows2, "push_id long, body binary"))
    # map column isn't orderable as a partition key in a window; use eid
    cum2 = promql.otlp_delta_to_cumulative(
        pts.withColumn("eid", F.col("attrs")["eid"]),
        series_cols=("metric_name", "eid"))
    batch = {r["eid"]: r["value_double"] for r in cum2.groupBy("eid").agg(
        F.max_by("value_double", "time_unix_nano").alias("value_double")
    ).collect()}
    assert batch == totals
    # cumulative point refuses
    bad = [(9, payload("c", [1.0], temporality=2))]
    spark.createDataFrame(bad, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q3 = stream_otlp_delta_accumulate(spark, str(src), str(sink), str(ckpt))
    import pytest as _pt
    with _pt.raises(Exception):
        q3.awaitTermination(120)
        if q3.exception() is not None:
            raise q3.exception()


def test_streaming_delta_hist_matches_batch_across_restart(spark, tmp_path):
    """r9 twin: delta CLASSIC histogram accumulation on a stream must
    equal batch ``otlp_delta_hist_to_cumulative`` over the same
    payloads, resume from the checkpoint, and refuse a mid-series
    bounds change loudly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions import otlp as O
    from prom_etl_db_spark.operators import promql
    from prom_etl_db_spark.streaming.jobs import (
        stream_otlp_delta_hist_accumulate,
    )

    T0 = 1706572800_000_000_000

    def payload(eid, pts, bounds=(0.5, 2.0), t0=T0):
        return O.encode_export_metrics([{
            "resource": {},
            "scopes": [{"name": "app", "version": "1", "metrics": [{
                "name": "lat", "unit": "s", "type": "histogram",
                "temporality": 1,
                "points": [{"attrs": {"eid": str(eid)},
                            "time_unix_nano": t0 + i * 1_000_000_000,
                            "count": sum(c), "sum": float(sum(c)) * 2.0,
                            "bucket_counts": list(c),
                            "explicit_bounds": list(bounds)}
                           for i, c in enumerate(pts)],
            }]}],
        }])

    rows1 = [(1, payload("a", [[2, 1, 0], [1, 0, 3]])),
             (2, payload("b", [[5, 0, 1]]))]
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame(rows1, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q = stream_otlp_delta_hist_accumulate(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)

    rows2 = [(3, payload("a", [[0, 4, 1]], t0=T0 + 10_000_000_000)),
             (4, payload("b", [[1, 1, 1]], t0=T0 + 10_000_000_000))]
    spark.createDataFrame(rows2, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q2 = stream_otlp_delta_hist_accumulate(spark, str(src), str(sink), str(ckpt))
    q2.awaitTermination(120)

    got = spark.read.parquet(str(sink))
    latest = got.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("series").orderBy(
                F.desc("batch_id"), F.desc("timestamp_ms")))
    ).where(F.col("rn") == 1)
    stream_final = {r["series"].split("\x1f")[1]:
                    (list(r["cum_buckets"]), r["cum_count"], r["cum_sum"])
                    for r in latest.collect()}
    assert stream_final["a"] == ([3, 5, 4], 12, 24.0)
    assert stream_final["b"] == ([6, 1, 2], 9, 18.0)
    # batch twin over the union of all payloads
    pts = O.otlp_samples(spark.createDataFrame(
        rows1 + rows2, "push_id long, body binary"))
    cum = promql.otlp_delta_hist_to_cumulative(
        pts.withColumn("eid", F.col("attrs")["eid"]),
        series_cols=("metric_name", "eid"))
    batch_final = {
        r["eid"]: (list(r["bc"]), r["c"], r["s"])
        for r in cum.groupBy("eid").agg(
            F.max_by("bucket_counts", "time_unix_nano").alias("bc"),
            F.max_by("count", "time_unix_nano").alias("c"),
            F.max_by("sum", "time_unix_nano").alias("s"),
        ).collect()}
    assert batch_final == stream_final
    # bounds change refuses across the checkpoint boundary
    bad = [(9, payload("a", [[1, 1, 1]], bounds=(0.5, 9.9),
                       t0=T0 + 20_000_000_000))]
    spark.createDataFrame(bad, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q3 = stream_otlp_delta_hist_accumulate(spark, str(src), str(sink), str(ckpt))
    import pytest as _pt
    with _pt.raises(Exception, match="bounds"):
        try:
            q3.awaitTermination(120)
        finally:
            if q3.exception() is not None:
                raise q3.exception()


def test_streaming_delta_exp_hist_scale_change_matches_batch(spark, tmp_path):
    """r9 twin: delta EXPONENTIAL histogram accumulation with a
    MID-STREAM SCALE CHANGE that lands AFTER a checkpoint restart —
    the state (folded at scale 2) must downscale-merge with the new
    scale-1 point exactly as the batch operator's sequential fold
    does."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions import otlp as O
    from prom_etl_db_spark.operators import promql
    from prom_etl_db_spark.streaming.jobs import (
        stream_otlp_delta_exp_accumulate,
    )

    T0 = 1706572800_000_000_000

    def payload(eid, pts, t0=T0):
        return O.encode_export_metrics([{
            "resource": {},
            "scopes": [{"name": "app", "version": "1", "metrics": [{
                "name": "lat", "type": "exponential_histogram",
                "temporality": 1,
                "points": [{"attrs": {"eid": str(eid)},
                            "time_unix_nano": t0 + i * 1_000_000_000,
                            "count": z + sum(c), "scale": s,
                            "zero_count": z, "pos_offset": o,
                            "pos_counts": list(c), "sum": float(sum(c))}
                           for i, (s, o, c, z) in enumerate(pts)],
            }]}],
        }])

    # run 1: scale 2 points (the r8 unit fixture's shape)
    rows1 = [(1, payload("a", [(2, 0, [2, 1], 1), (2, 1, [1, 3], 0)]))]
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame(rows1, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q = stream_otlp_delta_exp_accumulate(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)

    # run 2 (after restart): a SCALE-1 point — the checkpointed scale-2
    # state must downscale (ceil(i/2) merge) before adding
    rows2 = [(2, payload("a", [(1, 1, [2], 0)], t0=T0 + 10_000_000_000))]
    spark.createDataFrame(rows2, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q2 = stream_otlp_delta_exp_accumulate(spark, str(src), str(sink), str(ckpt))
    q2.awaitTermination(120)

    got = spark.read.parquet(str(sink))
    latest = got.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("series").orderBy(
                F.desc("batch_id"), F.desc("timestamp_ms")))
    ).where(F.col("rn") == 1).collect()
    (r,) = latest
    # same algebra as the r8 batch unit test: [2,2,3]@s2 -> [2,5]@s1,
    # + [2]@off1 -> [2,7]@off0, zero 1, count 10
    assert r["scale"] == 1
    assert (r["pos_offset"], list(r["pos_counts"])) == (0, [2, 7])
    assert r["zero_count"] == 1 and r["cum_count"] == 10
    # batch twin (multi-scale fold path) agrees on the final point
    pts = O.otlp_samples(spark.createDataFrame(
        rows1 + rows2, "push_id long, body binary"))
    cum = promql.otlp_delta_exp_hist_to_cumulative(
        pts.withColumn("eid", F.col("attrs")["eid"]),
        series_cols=("metric_name", "eid"))
    b = cum.orderBy(F.desc("time_unix_nano")).first()
    assert b["scale"] == 1
    assert (b["pos_offset"], list(b["pos_counts"])) == (0, [2, 7])
    assert b["zero_count"] == 1 and b["count"] == 10
    # a cumulative-temporality point refuses pre-fold
    badp = O.encode_export_metrics([{
        "resource": {},
        "scopes": [{"name": "app", "version": "1", "metrics": [{
            "name": "lat", "type": "exponential_histogram",
            "temporality": 2,
            "points": [{"attrs": {"eid": "a"},
                        "time_unix_nano": T0 + 30_000_000_000,
                        "count": 1, "scale": 1, "zero_count": 0,
                        "pos_offset": 0, "pos_counts": [1], "sum": 1.0}],
        }]}],
    }])
    spark.createDataFrame([(9, badp)], "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q3 = stream_otlp_delta_exp_accumulate(spark, str(src), str(sink), str(ckpt))
    import pytest as _pt
    with _pt.raises(Exception, match="non-DELTA"):
        try:
            q3.awaitTermination(120)
        finally:
            if q3.exception() is not None:
                raise q3.exception()


def test_streaming_summary_increase_matches_batch_across_restart(
        spark, tmp_path):
    """r9 twin: summary COUNT rides the CT-aware counter fold — the
    start_time plays the CT role. Stream across a restart must equal
    the batch ct_increase over the same decoded points, including a
    reset and all three birth classes (in-window / before / skewed)."""
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions import otlp as O
    from prom_etl_db_spark.registry.rw2_aux import ct_increase
    from prom_etl_db_spark.streaming.jobs import stream_summary_increase

    T0 = 1706572800_000_000_000
    WSTART = T0 // 1_000_000 - 15_000

    def payload(eid, counts, start_ns):
        return O.encode_export_metrics([{
            "resource": {},
            "scopes": [{"name": "app", "version": "1", "metrics": [{
                "name": "rpc", "unit": "s", "type": "summary",
                "points": [{"attrs": {"eid": str(eid)},
                            "time_unix_nano": T0 + i * 1_000_000_000,
                            "start_time_unix_nano": start_ns,
                            "count": c, "sum": float(c) * 1.5,
                            "quantiles": [(0.5, 0.1)]}
                           for i, c in enumerate(counts)],
            }]}],
        }])

    rows1 = [
        (1, payload("born", [5, 8], T0 - 1_000_000_000)),     # in-window
        (2, payload("old", [5, 8], T0 - 3600_000_000_000)),   # before
        (3, payload("skew", [5, 8], T0 + 500_000_000_000)),   # CT after ts
    ]
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame(rows1, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q = stream_summary_increase(
        spark, str(src), str(sink), str(ckpt), window_start_ms=WSTART)
    q.awaitTermination(120)
    # restart: a RESET for "born" (count drops), growth for the others
    rows2 = [
        (4, payload("born", [2], T0 - 1_000_000_000)),
        (5, payload("old", [11], T0 - 3600_000_000_000)),
    ]

    def payload_at(eid, counts, start_ns, t0):
        return O.encode_export_metrics([{
            "resource": {},
            "scopes": [{"name": "app", "version": "1", "metrics": [{
                "name": "rpc", "unit": "s", "type": "summary",
                "points": [{"attrs": {"eid": str(eid)},
                            "time_unix_nano": t0 + i * 1_000_000_000,
                            "start_time_unix_nano": start_ns,
                            "count": c, "sum": float(c) * 1.5,
                            "quantiles": [(0.5, 0.1)]}
                           for i, c in enumerate(counts)],
            }]}],
        }])

    rows2 = [
        (4, payload_at("born", [2], T0 - 1_000_000_000,
                       T0 + 10_000_000_000)),
        (5, payload_at("old", [11], T0 - 3600_000_000_000,
                       T0 + 10_000_000_000)),
    ]
    spark.createDataFrame(rows2, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q2 = stream_summary_increase(
        spark, str(src), str(sink), str(ckpt), window_start_ms=WSTART)
    q2.awaitTermination(120)

    from pyspark.sql import Window
    got = spark.read.parquet(str(sink))
    latest = got.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("series").orderBy(F.desc("batch_id")))
    ).where(F.col("rn") == 1)
    totals = {r["series"].split("\x1f")[1]: r["total_increase"]
              for r in latest.collect()}
    # born: 5 (CT) + 3 + 2 (reset) = 10; old: 0 + 3 + 3 = 6;
    # skew: CT after first sample ignored -> 0 + 3 = 3
    assert totals == {"born": 10.0, "old": 6.0, "skew": 3.0}
    # batch twin over the union (ct_increase on decoded summary count)
    pts = O.otlp_samples(spark.createDataFrame(
        rows1 + rows2, "push_id long, body binary"))
    batch = ct_increase(
        pts.select(
            F.col("attrs")["eid"].alias("push_id"), "metric_name",
            (F.col("time_unix_nano") / 1_000_000).cast("long")
            .alias("timestamp_ms"),
            F.col("count").cast("double").alias("value"),
            (F.col("start_time_unix_nano") / 1_000_000).cast("long")
            .alias("created_timestamp_ms")),
        WSTART)
    assert {r["push_id"]: r["increase"] for r in batch.collect()} == totals


def test_streaming_native_hist_rollup_matches_batch_across_restart(
        spark, tmp_path):
    """r9 twin: the per-metric native-histogram rollup stream must
    equal batch native_hist_sum_by over the same wire payloads,
    resume from the checkpoint, and downscale-merge a COARSER-scale
    series arriving after the restart."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions import remote_write as RW
    from prom_etl_db_spark.operators import native_hist as NH
    from prom_etl_db_spark.streaming.jobs import stream_native_hist_rollup

    def payload(user, scale, off, counts, z=0):
        return RW.snappy_compress(RW.encode_write_request_v2(
            [{"labels": {"__name__": "lat", "user": str(user)},
              "samples": [], "histograms": [{
                  "schema": scale, "zero_threshold": 0.001,
                  "zero_count": z, "count": z + sum(counts),
                  "positive_spans": [(off, len(counts))],
                  "positive_deltas": [counts[0]] + [
                      b - a for a, b in zip(counts, counts[1:])],
                  "timestamp": 1706572800000}]}]))

    # run 1: two scale-2 series (the r8 algebra fixture)
    rows1 = [(1, payload(1, 2, 0, [2, 1], z=1)),
             (2, payload(2, 2, 1, [1, 3]))]
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame(rows1, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q = stream_native_hist_rollup(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)
    # restart: a SCALE-1 series — the checkpointed scale-2 merge
    # [2,2,3]@off0 downscales (ceil(i/2)) to [2,5]@s1 then adds [2]@1
    rows2 = [(3, payload(3, 1, 1, [2]))]
    spark.createDataFrame(rows2, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q2 = stream_native_hist_rollup(spark, str(src), str(sink), str(ckpt))
    q2.awaitTermination(120)

    got = spark.read.parquet(str(sink))
    (r,) = got.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("series").orderBy(F.desc("batch_id")))
    ).where(F.col("rn") == 1).collect()
    assert r["schema"] == 1
    assert (r["pos_offset"], list(r["pos_counts"])) == (0, [2, 7])
    assert r["zero_count"] == 1 and r["cum_count"] == 10
    # batch twin over the union of payloads
    pts = RW.remote_write_v2_native_histograms(spark.createDataFrame(
        rows1 + rows2, "push_id long, body binary"))
    (b,) = NH.native_hist_sum_by(pts, ("metric_name",)).collect()
    assert b["schema"] == 1
    assert (b["pos_offset"], list(b["pos_counts"])) == (0, [2, 7])
    assert b["zero_count"] == 1 and b["count"] == 10
    # a zero_threshold change against the checkpoint refuses
    badp = RW.snappy_compress(RW.encode_write_request_v2(
        [{"labels": {"__name__": "lat", "user": "9"},
          "samples": [], "histograms": [{
              "schema": 1, "zero_threshold": 0.01, "zero_count": 0,
              "count": 1, "positive_spans": [(0, 1)],
              "positive_deltas": [1], "timestamp": 1706572800000}]}]))
    spark.createDataFrame([(9, badp)], "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q3 = stream_native_hist_rollup(spark, str(src), str(sink), str(ckpt))
    import pytest as _pt
    with _pt.raises(Exception, match="zero_threshold"):
        try:
            q3.awaitTermination(120)
        finally:
            if q3.exception() is not None:
                raise q3.exception()


def test_streaming_exemplar_report_matches_batch_across_restart(
        spark, tmp_path):
    """r10 twin: the exemplar → rate-window report on a stream must
    equal the batch operator over the same payloads, resume from the
    checkpoint, and ADMIT a pending exemplar (newer than the window
    at its arrival) once a later sample extends the window past it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions import remote_write as RW
    from prom_etl_db_spark.operators.exemplars import exemplar_rate_report
    from prom_etl_db_spark.streaming.jobs import stream_exemplar_report

    T0 = 1706572800000

    def payload(eid, samples, exemplars):
        return RW.snappy_compress(RW.encode_write_request_v2(
            [{"labels": {"__name__": "m", "eid": str(eid)},
              "samples": samples,
              "exemplars": [
                  {"labels": {"trace_id": f"t{i}"}, "value": v,
                   "timestamp": ts}
                  for i, (v, ts) in enumerate(exemplars)]}]))

    # batch 1: window [T0, T0+300s]; one in-window exemplar, one
    # PENDING exemplar at T0+400s (newer than the window), one stale
    rows1 = [(1, payload("a", [(2.0, T0), (8.0, T0 + 300000)],
                         [(5.0, T0 + 100000),
                          (7.0, T0 + 400000),
                          (9.0, T0 - 60000)]))]
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame(rows1, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q = stream_exemplar_report(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)
    mid = spark.read.parquet(str(sink)).orderBy(F.desc("batch_id")).first()
    assert mid["n_exemplars"] == 1          # only the in-window one
    assert mid["n_stale_exemplars"] == 1

    # batch 2 (after restart): a later sample extends the window past
    # the pending exemplar — it must fold in now
    rows2 = [(2, payload("a", [(11.0, T0 + 600000)], []))]
    spark.createDataFrame(rows2, "push_id long, body binary").write.mode(
        "append").parquet(str(src))
    q2 = stream_exemplar_report(spark, str(src), str(sink), str(ckpt))
    q2.awaitTermination(120)

    got = spark.read.parquet(str(sink))
    w = Window.partitionBy("series").orderBy(
        F.desc("batch_id"), F.desc("last_ts"))
    final = got.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1).first()
    assert final["n_exemplars"] == 2
    assert final["increase"] == 9.0
    assert final["exemplar_mean"] == 6.0
    assert final["sampling_ratio"] == 2 / 9.0
    assert final["n_stale_exemplars"] == 1

    # batch twin over the union (the stale exemplar sits outside the
    # final window for BOTH forms, so the reports agree)
    all_payloads = spark.createDataFrame(
        rows1 + rows2, "push_id long, body binary")
    samples = RW.remote_write_v2_samples(all_payloads).select(
        "metric_name", "timestamp_ms", "value")
    exemplars = RW.remote_write_v2_exemplars(all_payloads).select(
        "metric_name", "value", "timestamp_ms")
    (b,) = exemplar_rate_report(
        samples, exemplars, series_cols=("metric_name",)).collect()
    assert (b["n_exemplars"], b["increase"], b["exemplar_mean"],
            b["sampling_ratio"]) == (
        final["n_exemplars"], final["increase"],
        final["exemplar_mean"], final["sampling_ratio"])
