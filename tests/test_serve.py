"""Serve-forever daemon loop (serve.py) — the reference's service mode
(`cmd/server/main.go:108-212`): immediate first run, cron-scheduled
firings, failure isolation, graceful stop that drains in-flight work.

The e2e tests drive the REAL loop through a simulated clock (sleep
advances virtual time), and the CLI test runs the actual ``serve``
subcommand end-to-end over a parquet catalog + store + audit trail.
"""

from __future__ import annotations

import threading
from datetime import datetime, timedelta

from prom_etl_db_spark.config import QueryConfig
from prom_etl_db_spark.serve import advance_clock, serve_loop

START = datetime(2024, 3, 15, 12, 0, 0)


def _cfg(qid: str, schedule: str) -> QueryConfig:
    return QueryConfig(query_id=qid, name=qid, query="cpu", schedule=schedule)


def _run_recorder(calls):
    def run_config(cfg, now):
        calls.append((cfg.query_id, now))

    return run_config


def test_two_tick_simulated_clock_fires_right_configs_twice():
    # e30: every 30s; e60: every minute. Two scheduled ticks after the
    # immediate first run: 12:00:30 fires only e30, 12:01:00 fires both.
    configs = [_cfg("e30", "*/30 * * * * *"), _cfg("e60", "0 * * * * *")]
    clock, sleep = advance_clock(START)
    calls: list[tuple[str, datetime]] = []
    summary = serve_loop(
        configs,
        _run_recorder(calls),
        start=START,
        stop=threading.Event(),
        clock=clock,
        sleep=sleep,
        max_ticks=2,
    )
    assert [t.fired_at for t in summary.ticks] == [
        START,  # immediate first run (main.go:157-189)
        START + timedelta(seconds=30),
        START + timedelta(minutes=1),
    ]
    assert summary.ticks[0].query_ids == ["e30", "e60"]
    assert summary.ticks[1].query_ids == ["e30"]
    assert summary.ticks[2].query_ids == ["e30", "e60"]
    # each execution's "now" is its scheduled fire instant, never wall clock
    assert calls == [
        ("e30", START), ("e60", START),
        ("e30", START + timedelta(seconds=30)),
        ("e30", START + timedelta(minutes=1)),
        ("e60", START + timedelta(minutes=1)),
    ]
    assert not summary.stopped_by_request


def test_failure_is_recorded_and_loop_keeps_serving():
    configs = [_cfg("bad", "*/30 * * * * *"), _cfg("good", "*/30 * * * * *")]
    clock, sleep = advance_clock(START)

    def run_config(cfg, now):
        if cfg.query_id == "bad":
            raise RuntimeError("boom")

    summary = serve_loop(
        configs, run_config, start=START, stop=threading.Event(),
        clock=clock, sleep=sleep, max_ticks=1,
    )
    # both ticks ran despite the failure; failures are per-tick records
    assert len(summary.ticks) == 2
    for tick in summary.ticks:
        assert tick.query_ids == ["bad", "good"]
        assert tick.failures == ["bad: boom"]


def test_stop_request_drains_current_tick_and_exits():
    # stop fires DURING the first scheduled tick's execution: the tick's
    # remaining configs still run (drain), then the loop exits without
    # waiting for the next fire time.
    stop = threading.Event()
    configs = [_cfg("a", "*/30 * * * * *"), _cfg("b", "*/30 * * * * *")]
    clock, sleep = advance_clock(START)
    calls: list[tuple[str, datetime]] = []

    def run_config(cfg, now):
        calls.append((cfg.query_id, now))
        if cfg.query_id == "a" and now != START:
            stop.set()  # shutdown request lands mid-tick

    summary = serve_loop(
        configs, run_config, start=START, stop=stop,
        clock=clock, sleep=sleep, max_ticks=100,
    )
    t1 = START + timedelta(seconds=30)
    # tick 1 (immediate) ran fully; tick 2 drained both configs; no tick 3
    assert calls == [("a", START), ("b", START), ("a", t1), ("b", t1)]
    assert summary.stopped_by_request


def test_stop_request_mid_wait_exits_without_firing():
    stop = threading.Event()
    clock, sleep_virtual = advance_clock(START)
    sleeps = {"n": 0}

    def sleep(seconds):
        sleeps["n"] += 1
        if sleeps["n"] == 3:
            stop.set()
        sleep_virtual(seconds)

    summary = serve_loop(
        [_cfg("a", "0 0 * * * *")],  # next fire a full hour away
        _run_recorder([]),
        start=START, stop=stop, clock=clock, sleep=sleep,
        poll_interval=1.0, max_ticks=5,
    )
    # only the immediate run happened; the hour-long wait was abandoned
    # after ~3 poll intervals, not slept through
    assert len(summary.ticks) == 1
    assert summary.stopped_by_request
    assert sleeps["n"] == 3


def test_serve_cli_end_to_end(spark, tmp_path, monkeypatch):
    """The actual subcommand over parquet catalog/store/audit: two virtual
    ticks write records and audit rows for the enabled config only."""
    import prom_etl_db_spark.session as sess
    from prom_etl_db_spark.__main__ import main
    from prom_etl_db_spark.config import upsert_config

    monkeypatch.setattr(sess, "get_spark", lambda name=None: spark)
    catalog = str(tmp_path / "catalog")
    store = str(tmp_path / "store")
    audit = str(tmp_path / "audit")
    upsert_config(
        spark, catalog,
        QueryConfig(
            query_id="gpu", name="gpu util", query="sum(click) by (k)",
            schedule="*/30 * * * * *",
            time_range_type="range",
            time_range_start="-1d", time_range_end="now", time_range_step="1h",
        ),
    )
    upsert_config(
        spark, catalog,
        QueryConfig(query_id="off", name="disabled", query="click",
                    enabled=False),
    )
    rc = main([
        "serve",
        "--configs", catalog,
        "--store", store,
        "--audit", audit,
        "--sf-dir", "/root/testdata/sf0.001",
        "--now-start", "2024-01-30T00:00:00",
        "--max-ticks", "2",
        "--virtual-clock",
        "--no-sleep",
    ])
    assert rc == 0
    audits = spark.read.parquet(audit)
    # immediate run + 2 scheduled ticks, enabled config only, all success
    assert audits.count() == 3
    assert audits.where("status = 'success'").count() == 3
    assert audits.select("query_id").distinct().collect()[0]["query_id"] == "gpu"
    records = spark.read.parquet(store)
    assert records.count() > 0
    assert records.select("query_id").distinct().count() == 1


def test_serve_cli_virtual_clock_requires_bounds(tmp_path):
    from prom_etl_db_spark.__main__ import main

    rc = main([
        "serve", "--configs", "x", "--store", "y", "--audit", "z",
        "--sf-dir", "w", "--virtual-clock",
    ])
    assert rc == 2


def test_parallel_tick_runs_all_configs_and_attributes_failures():
    """max_parallel fires a tick's configs concurrently: every config
    runs exactly once, failures keep per-config attribution, and the
    overlap is real (two 0.3s configs finish in well under 0.6s)."""
    import threading
    import time as _time

    cfgs = [
        QueryConfig(query_id=f"q{i}", name=f"q{i}", query="m",
                    schedule="0 * * * * *")
        for i in range(4)
    ]
    ran, lock = [], threading.Lock()
    active = [0]
    peak = [0]

    def run_config(cfg, at):
        with lock:
            active[0] += 1
            peak[0] = max(peak[0], active[0])
        _time.sleep(0.3)
        with lock:
            ran.append(cfg.query_id)
            active[0] -= 1
        if cfg.query_id == "q2":
            raise RuntimeError("boom")

    stop = threading.Event()
    t0 = _time.monotonic()
    summary = serve_loop(
        cfgs, run_config,
        start=datetime(2024, 3, 1), stop=stop,
        clock=lambda: datetime(2024, 3, 1), sleep=lambda s: None,
        max_ticks=0, immediate_first_run=True, max_parallel=4,
    )
    elapsed = _time.monotonic() - t0
    assert sorted(ran) == ["q0", "q1", "q2", "q3"]
    assert peak[0] >= 2 and elapsed < 1.0  # genuinely concurrent
    (tick,) = summary.ticks
    assert tick.failures == ["q2: boom"]


def test_serve_parallel_real_writes_share_one_store(spark, tmp_path, monkeypatch):
    """--max-parallel 3 with THREE enabled configs writing through REAL
    execute_config_query to the SAME store/audit paths: every config's
    records and audit rows must land (the per-path commit lock prevents
    concurrent FileOutputCommitter jobs from clobbering each other's
    _temporary staging)."""
    import prom_etl_db_spark.session as sess
    from prom_etl_db_spark.__main__ import main
    from prom_etl_db_spark.config import upsert_config

    monkeypatch.setattr(sess, "get_spark", lambda name=None: spark)
    catalog = str(tmp_path / "catalog")
    store = str(tmp_path / "store")
    audit = str(tmp_path / "audit")
    for qid, q in [
        ("q_click", "sum(click) by (k)"),
        ("q_view", "sum(view) by (k)"),
        ("q_err", "count(error) by (k)"),
    ]:
        upsert_config(
            spark, catalog,
            QueryConfig(
                query_id=qid, name=qid, query=q,
                schedule="*/30 * * * * *",
                time_range_type="range",
                time_range_start="-1d", time_range_end="now",
                time_range_step="6h",
            ),
        )
    rc = main([
        "serve",
        "--configs", catalog,
        "--store", store,
        "--audit", audit,
        "--sf-dir", "/root/testdata/sf0.001",
        "--now-start", "2024-01-30T00:00:00",
        "--max-ticks", "1",
        "--virtual-clock",
        "--no-sleep",
        "--max-parallel", "3",
    ])
    assert rc == 0
    audits = spark.read.parquet(audit)
    # immediate run + 1 scheduled tick x 3 configs, all success
    assert audits.count() == 6
    assert audits.where("status = 'success'").count() == 6
    records = spark.read.parquet(store)
    per_q = {
        r["query_id"]: r["n"]
        for r in records.groupBy("query_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert set(per_q) == {"q_click", "q_view", "q_err"}
    assert all(n > 0 for n in per_q.values())


def test_slow_execution_skips_missed_firings_instead_of_replaying():
    # A config on every-5-seconds whose execution takes ~62 virtual
    # seconds: each tick runs past ~12 subsequent fire instants. The loop
    # must collapse those missed activations (robfig/cron behavior) and
    # resume at the next FUTURE instant — not queue 12 back-to-back
    # catch-up firings per execution, lagging further behind forever.
    clock, sleep = advance_clock(START)

    def slow_run(cfg, now):
        sleep(62)  # simulated execution time

    summary = serve_loop(
        [_cfg("fast", "*/5 * * * * *")],
        slow_run,
        start=START,
        stop=threading.Event(),
        clock=clock,
        sleep=sleep,
        max_ticks=3,
        immediate_first_run=False,
    )
    fire_times = [t.fired_at for t in summary.ticks]
    assert len(fire_times) == 3
    # every scheduled firing lands at or after the previous execution
    # finished — consecutive fires are >= 62s apart, never 5s catch-ups
    gaps = [
        (b - a).total_seconds() for a, b in zip(fire_times, fire_times[1:])
    ]
    assert all(g >= 62 for g in gaps), gaps
    # and each fire instant is a real schedule match, on the 5s grid
    assert all(t.second % 5 == 0 for t in fire_times)
