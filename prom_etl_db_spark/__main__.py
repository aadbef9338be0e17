"""CLI entry points — the analogs of the reference's two binaries.

``python -m prom_etl_db_spark run-once ...`` plays ``cmd/server``'s
startup pass (`/root/reference/cmd/server/main.go:157-189`): load every
enabled config from the catalog and execute each once, with the A16
audit protocol and the A29 retry decorator. (The cron DAEMON loop is
deliberately not reproduced in-process: on a cluster the per-config
``CronSchedule.next_fire`` drives an external scheduler invoking this
same one-shot — SURVEY.md §2.D trigger row.)

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
                retry_count=cfg.retry_count,
                retry_interval="0s" if args.no_sleep else cfg.retry_interval,
            )
            print(f"OK    {cfg.query_id}", file=sys.stderr)
        except Exception as e:  # audited as failed already; keep going
            failures += 1
            print(f"FAIL  {cfg.query_id}: {e}", file=sys.stderr)
    return 1 if failures else 0


def _cmd_repair(args: argparse.Namespace) -> int:
    from prom_etl_db_spark.backfill import backfill_days
    from prom_etl_db_spark.executor import execute_config_query
    from prom_etl_db_spark.session import get_spark

    spark = get_spark("repair")
    from prom_etl_db_spark.config import load_all

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
        dry_run=args.dry_run,
    )
    print(summary, file=sys.stderr)
    return 1 if summary.failed else 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="prom_etl_db_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run-once", help="execute every enabled config once")
    r.add_argument("--configs", required=True, help="config catalog parquet path")
    r.add_argument("--store", required=True, help="metrics table path")
    r.add_argument("--audit", required=True, help="query_executions path")
    r.add_argument("--sf-dir", required=True, help="samples fixture dir")
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

    b = sub.add_parser("repair", help="per-day idempotent backfill")
    b.add_argument("--configs", required=True)
    b.add_argument("--query-id", required=True)
    b.add_argument("--store", required=True)
    b.add_argument("--sf-dir", required=True)
    b.add_argument("--start", required=True, type=date.fromisoformat,
                   help="first day (ISO date)")
    b.add_argument("--end", required=True, type=date.fromisoformat,
                   help="last day (ISO date)")
    b.add_argument("--force-recompute", action="store_true")
    b.add_argument("--dry-run", action="store_true")
    b.set_defaults(fn=_cmd_repair)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
