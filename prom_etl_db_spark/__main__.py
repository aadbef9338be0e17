"""CLI entry points — the analogs of the reference's two binaries.

``python -m prom_etl_db_spark run-once ...`` plays ``cmd/server``'s
startup pass (`/root/reference/cmd/server/main.go:157-189`): load every
enabled config from the catalog and execute each once, with the A16
audit protocol and the A29 retry decorator.

``python -m prom_etl_db_spark serve ...`` plays the full service mode
(`cmd/server/main.go:108-212`): immediate first run, then the cron loop
over ``CronSchedule.next_fire``, SIGINT/SIGTERM graceful shutdown that
drains the in-flight execution. On a cluster the same one-shot can
instead be driven by an external scheduler — both paths share
``executor.execute_config_query``.

``python -m prom_etl_db_spark repair ...`` plays ``cmd/repair``
(`cmd/repair/main.go:28-84` flag surface): per-day idempotent backfill
with the skip/force/dry-run decision matrix.

Both take ``--now`` explicitly — the reference's wall-clock read is what
froze its production ingestion (REPAIR.md:5).
"""

from __future__ import annotations

import argparse
import sys
from datetime import date, datetime


def _sample_stream(spark, sf_dir: str):
    """The fixture-backed samples stream both subcommands read (one place
    to swap in a real source)."""
    from prom_etl_db_spark.queries import _event_samples

    return _event_samples(spark, sf_dir)


def _cmd_run_once(args: argparse.Namespace) -> int:
    from prom_etl_db_spark.config import load_enabled
    from prom_etl_db_spark.executor import execute_config_query
    from prom_etl_db_spark.scheduler import with_retry
    from prom_etl_db_spark.session import get_spark

    spark = get_spark("run-once")
    stream = _sample_stream(spark, args.sf_dir)
    configs = load_enabled(spark, args.configs)
    print(f"{len(configs)} enabled config(s)", file=sys.stderr)
    failures = 0
    for cfg in configs:
        def run_one(cfg=cfg):
            execute_config_query(
                spark,
                stream,
                cfg,
                now=args.now,
                store_path=args.store,
                audit_path=args.audit,
                mode=args.mode.replace("-", "_"),
            )

        try:
            with_retry(
                run_one,
                # NULL catalog values (schema allows them) fall back to
                # the dataclass defaults / the reference's 5s code
                # fallback (executor.go:372-375) instead of crashing
                # before the first attempt with no audit record
                retry_count=3 if cfg.retry_count is None else cfg.retry_count,
                retry_interval="0s" if args.no_sleep else (cfg.retry_interval or "5s"),
            )
            print(f"OK    {cfg.query_id}", file=sys.stderr)
        except Exception as e:  # audited as failed already; keep going
            failures += 1
            print(f"FAIL  {cfg.query_id}: {e}", file=sys.stderr)
    return 1 if failures else 0


def _cmd_serve(args: argparse.Namespace) -> int:
    """The reference's service mode (cmd/server/main.go:108-212): cron
    loop over the enabled catalog, immediate first run, graceful stop."""
    import threading

    from prom_etl_db_spark.config import load_enabled
    from prom_etl_db_spark.executor import execute_config_query
    from prom_etl_db_spark.scheduler import with_retry
    from prom_etl_db_spark.serve import (
        advance_clock,
        install_signal_handlers,
        serve_loop,
    )
    from prom_etl_db_spark.session import get_spark

    if args.virtual_clock and (args.now_start is None or args.max_ticks is None):
        print(
            "--virtual-clock requires --now-start and --max-ticks "
            "(a virtual clock with no tick bound would spin forever)",
            file=sys.stderr,
        )
        return 2

    from prom_etl_db_spark.logger import new_logger, with_component, with_count

    log = with_component(new_logger(args.log_level, stream=sys.stderr), "server")
    spark = get_spark("serve")
    stream = _sample_stream(spark, args.sf_dir)
    configs = load_enabled(spark, args.configs)
    with_count(log, len(configs)).info("enabled configs scheduled")

    def run_config(cfg, now):
        with_retry(
            lambda: execute_config_query(
                spark, stream, cfg,
                now=now,
                store_path=args.store,
                audit_path=args.audit,
                mode=args.mode.replace("-", "_"),
            ),
            retry_count=3 if cfg.retry_count is None else cfg.retry_count,
            retry_interval="0s" if args.no_sleep else (cfg.retry_interval or "5s"),
        )

    stop = threading.Event()
    install_signal_handlers(stop)
    # naive-UTC wall clock: the Spark session timezone and the audit
    # clock are pinned UTC, so a LOCAL-naive datetime.now() on a
    # UTC+9 host would resolve every config's time range 9 hours into
    # the future of the UTC-timestamped data — silently storing
    # empty/wrong windows
    from datetime import timezone as _tz

    def _utcnow_naive() -> datetime:
        return datetime.now(_tz.utc).replace(tzinfo=None)

    start = args.now_start or _utcnow_naive()
    if args.virtual_clock:
        clock, sleep = advance_clock(start)
    else:
        import time as _time

        clock, sleep = _utcnow_naive, _time.sleep

    def on_tick(tick):
        bound = log.bind(
            fired_at=tick.fired_at.isoformat(),
            n_configs=len(tick.query_ids),
            n_failed=len(tick.failures),
        )
        if tick.failures:
            bound.bind(failures=tick.failures).error("tick completed with failures")
        else:
            bound.info("tick completed")

    summary = serve_loop(
        configs,
        run_config,
        start=start,
        stop=stop,
        clock=clock,
        sleep=sleep,
        poll_interval=args.poll_interval,
        max_ticks=args.max_ticks,
        on_tick=on_tick,
        max_parallel=args.max_parallel,
    )
    log.bind(
        n_ticks=len(summary.ticks),
        n_executions=summary.executions,
        stopped_by_request=summary.stopped_by_request,
    ).info("serve loop exited")
    return 1 if any(t.failures for t in summary.ticks) else 0


def _cmd_repair(args: argparse.Namespace) -> int:
    from prom_etl_db_spark.backfill import backfill_days
    from prom_etl_db_spark.executor import execute_config_query
    from prom_etl_db_spark.session import get_spark

    spark = get_spark("repair")
    from prom_etl_db_spark.config import load_all

    if args.start > args.end:
        # the reference aborts here (cmd/repair/main.go:71-73); a silent
        # empty loop would print a 0-day summary and exit 0, reading as
        # "repair succeeded" when nothing was checked
        print("start date must be before end date", file=sys.stderr)
        return 2
    # deliberately NOT filtered to enabled: disabling a broken config and
    # then repairing its history is the tool's whole use case
    cfgs = [c for c in load_all(spark, args.configs) if c.query_id == args.query_id]
    if not cfgs:
        print(f"no config {args.query_id!r} in catalog", file=sys.stderr)
        return 2
    cfg = cfgs[0]
    stream = _sample_stream(spark, args.sf_dir)

    def fetch_day(at: datetime):
        # the reference pins resolver "now" to target_day + 24h
        # (repair/main.go:530-534) so yesterday-anchored expressions —
        # the standard daily-report shape — resolve to the TARGET day,
        # and "now"-anchored ranges like [-1d, now] cover exactly it.
        # The clip then only trims cross-midnight stragglers; it cannot
        # discard a whole day's rows.
        from datetime import timedelta

        from pyspark.sql import functions as F

        target = at.date()
        pinned_now = datetime(target.year, target.month, target.day) + timedelta(days=1)
        records = execute_config_query(spark, stream, cfg, now=pinned_now)
        return records.where(F.col("collected_date") == F.lit(target))

    summary = backfill_days(
        spark,
        query_id=cfg.query_id,
        start=args.start,
        end=args.end,
        fetch_day=fetch_day,
        table_path=args.store,
        force_recompute=args.force_recompute,
        skip_if_no_data=args.skip_if_no_data,
        dry_run=args.dry_run,
    )
    print(summary, file=sys.stderr)
    return 1 if summary.failed else 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="prom_etl_db_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    # A35: shared path settings resolve flag > environment > .env (the
    # reference's loadEnvFile precedence, cmd/repair/main.go:591-630)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument(
        "--env-file", default=".env",
        help="KEY=VALUE file merged BENEATH the real environment "
        "(missing file is fine). Env keys: PROM_ETL_SPARK_CONFIGS/"
        "STORE/AUDIT/SF_DIR.",
    )
    common.add_argument("--configs", default=None, help="config catalog parquet path")
    common.add_argument("--store", default=None, help="metrics table path")
    common.add_argument("--sf-dir", default=None, help="samples fixture dir")

    r = sub.add_parser(
        "run-once", parents=[common], help="execute every enabled config once"
    )
    r.add_argument("--audit", default=None, help="query_executions path")
    r.add_argument(
        "--now", required=True, type=datetime.fromisoformat,
        help="frozen eval time (ISO)",
    )
    r.add_argument("--no-sleep", action="store_true", help="skip retry sleeps")
    r.add_argument(
        "--mode", choices=("append", "skip-existing"), default="append",
        help="append = reference server parity (every execution inserts); "
        "skip-existing = day-granular dedup — re-fires of DAILY configs "
        "become no-ops, but it also drops later intra-day executions, so "
        "only use it for configs that run at most once per day",
    )
    r.set_defaults(fn=_cmd_run_once)

    s = sub.add_parser(
        "serve", parents=[common],
        help="run forever, firing enabled configs on their cron schedules",
    )
    s.add_argument("--audit", default=None, help="query_executions path")
    s.add_argument(
        "--now-start", type=datetime.fromisoformat, default=None,
        help="daemon epoch (ISO; default: wall clock). The immediate first "
        "run executes at this instant; cron matching begins after it.",
    )
    s.add_argument(
        "--max-ticks", type=int, default=None,
        help="stop after N scheduled firings (default: run forever)",
    )
    s.add_argument(
        "--poll-interval", type=float, default=1.0,
        help="stop-request check cadence while waiting, seconds",
    )
    s.add_argument(
        "--virtual-clock", action="store_true",
        help="sleep advances a simulated clock instead of blocking — "
        "offline smoke runs (requires --now-start and --max-ticks)",
    )
    s.add_argument("--no-sleep", action="store_true", help="skip retry sleeps")
    s.add_argument(
        "--mode", choices=("append", "skip-existing"), default="append",
        help="same semantics as run-once",
    )
    s.add_argument(
        "--max-parallel", type=int, default=1,
        help="configs fired concurrently within a tick (Spark interleaves "
        "the jobs; 1 = reference-sequential)",
    )
    s.add_argument(
        "--log-level", default="info",
        choices=("debug", "info", "warn", "error"),
        help="structured-log level (reference internal/logger parity)",
    )
    s.set_defaults(fn=_cmd_serve)

    b = sub.add_parser("repair", parents=[common], help="per-day idempotent backfill")
    b.add_argument("--query-id", required=True)
    b.add_argument("--start", required=True, type=date.fromisoformat,
                   help="first day (ISO date)")
    b.add_argument("--end", required=True, type=date.fromisoformat,
                   help="last day (ISO date)")
    b.add_argument("--force-recompute", action="store_true")
    # reference default is skipIfNoData=TRUE (cmd/repair/main.go:36):
    # under force-recompute, a day whose fetch returns no rows KEEPS its
    # stored slice rather than deleting it — the safe default; opt into
    # the destructive stale-slice delete explicitly
    b.add_argument(
        "--skip-if-no-data", dest="skip_if_no_data",
        action="store_true", default=True,
        help="keep a day's stored rows when the source returns none "
        "(reference default)",
    )
    b.add_argument(
        "--no-skip-if-no-data", dest="skip_if_no_data", action="store_false",
        help="with --force-recompute, DELETE the stored (query_id, day) "
        "slice when the source returns no rows",
    )
    b.add_argument("--dry-run", action="store_true")
    b.set_defaults(fn=_cmd_repair)

    args = p.parse_args(argv)

    from prom_etl_db_spark.envfile import ENV_KEYS, load_env_file, resolve_setting

    load_env_file(args.env_file)
    for attr, env_key in ENV_KEYS.items():
        if not hasattr(args, attr):
            continue
        val = resolve_setting(getattr(args, attr), env_key)
        if val is None:
            p.error(f"--{attr.replace('_', '-')} (or ${env_key}) is required")
        setattr(args, attr, val)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
