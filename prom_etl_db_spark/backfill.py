"""Per-day backfill / repair driver (SURVEY.md §2.A rows A26-A28).

The reference's repair CLI iterates [start, end] one day at a time,
queries the source at ``day@23:59:59``, and applies an idempotency matrix
— skip if data exists, or delete-day + reinsert under
``--force-recompute``, with a ``--dry-run`` preview
(`/root/reference/cmd/repair/main.go:164-412`). Here each day is one
batch job over the day's partition; the idempotency matrix maps to
`store.backfill_skip_existing` (left-anti against existing day keys) and
`store.overwrite_days` (dynamic partition overwrite). Retention-window
errors from the source are classified and skipped, not fatal (A27,
repair/main.go:583-588).

The loop itself is driver-side control flow over *days* (tiny), never
over rows — each iteration submits one distributed batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime, time as dtime, timedelta
from pathlib import Path
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prom_etl_db_spark.store import (
    append_records,
    delete_query_day,
    overwrite_days,
    read_records,
)


class RetentionError(RuntimeError):
    """A27: the source no longer holds this day (outside retention)."""


def is_retention_error(err: Exception) -> bool:
    """A27 classification — substring match like isRetentionError
    (repair/main.go:583-588), plus the typed exception."""
    if isinstance(err, RetentionError):
        return True
    msg = str(err).lower()
    return any(s in msg for s in ("out of bounds", "too old", "retention"))


@dataclass
class BackfillSummary:
    """Per-run counters (repair/main.go:384-411)."""

    processed: int = 0
    inserted_days: int = 0
    deleted_days: int = 0
    skipped_existing: int = 0
    skipped_no_data: int = 0
    skipped_retention: int = 0
    failed: list[str] = field(default_factory=list)
    dry_run_days: list[str] = field(default_factory=list)


def day_end(day: date) -> datetime:
    """Query evaluation instant for a backfilled day: day@23:59:59
    (repair/main.go:175-181)."""
    return datetime.combine(day, dtime(23, 59, 59))


def existing_day_counts(spark: SparkSession, path: str, query_id: str) -> dict[date, int]:
    """A26 existence probe, one scan for the whole range instead of one
    COUNT per day (checkExistingData, repair/main.go:557-576)."""
    # Missing store → nothing backfilled yet. A real read failure must
    # NOT be swallowed into {}: every day would then look missing and the
    # loop would re-append rows that already exist (duplicates), the
    # exact trap store.overwrite_days documents for its survivor read.
    if not Path(path).exists():
        return {}
    df = read_records(spark, path)
    rows = (
        df.where(F.col("query_id") == query_id)
        .groupBy("collected_date")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["collected_date"]: r["n"] for r in rows}


def backfill_days(
    spark: SparkSession,
    *,
    query_id: str,
    start: date,
    end: date,
    fetch_day: Callable[[datetime], DataFrame],
    table_path: str,
    force_recompute: bool = False,
    skip_if_no_data: bool = False,
    dry_run: bool = False,
) -> BackfillSummary:
    """A28: the per-day loop. ``fetch_day(at)`` returns that day's records
    (already normalized to METRICS_SCHEMA + collected_date) — the source
    boundary, so tests inject a fixture and production injects a real
    fetcher. Decision matrix per day (repair/main.go:272-374):

    - data exists, not force → skip (without fetching — unlike the
      reference, which fetches then discards; same outcome, one less
      source round-trip)
    - fetch returns NO rows → never insert; under force, the stale
      (query_id, day) slice is DELETED (DeleteMetricsByDate,
      main.go:296-306) unless ``skip_if_no_data`` keeps it
    - data exists, force, rows fetched → overwrite exactly that day slice
    - no data, rows fetched → append
    - retention-classified fetch error → count + continue (A27)
    - dry run → record the would-be action, write nothing
    """
    summary = BackfillSummary()
    existing = existing_day_counts(spark, table_path, query_id)
    day = start
    while day <= end:
        summary.processed += 1
        has_data = existing.get(day, 0) > 0
        if has_data and not force_recompute:
            summary.skipped_existing += 1
            day += timedelta(days=1)
            continue
        try:
            records = fetch_day(day_end(day))
        except Exception as e:  # noqa: BLE001 — classify, don't crash the loop
            if is_retention_error(e):
                summary.skipped_retention += 1
            else:
                summary.failed.append(f"{day.isoformat()}: {e}")
            day += timedelta(days=1)
            continue
        if records.isEmpty():
            would_delete = force_recompute and has_data and not skip_if_no_data
            if dry_run:
                action = "delete" if would_delete else "skip_no_data"
                summary.dry_run_days.append(f"{day.isoformat()}:{action}")
            elif would_delete:
                delete_query_day(spark, table_path, query_id, day)
            if would_delete:
                summary.deleted_days += 1
            else:
                summary.skipped_no_data += 1
        elif dry_run:
            action = "overwrite" if has_data else "insert"
            summary.dry_run_days.append(f"{day.isoformat()}:{action}")
            summary.inserted_days += 1
        elif has_data:
            overwrite_days(records, table_path)
            summary.inserted_days += 1
        else:
            append_records(records, table_path)
            summary.inserted_days += 1
        day += timedelta(days=1)
    return summary


def backfill_range_bulk(
    spark: SparkSession,
    *,
    query_id: str,
    start: date,
    end: date,
    fetch_range: Callable[[datetime, datetime], DataFrame],
    table_path: str,
) -> BackfillSummary:
    """The Spark-first BULK path for the common repair case (fill missing
    days, no force): ONE ``fetch_range(start, end)`` DataFrame, missing
    days selected with a filter against the existing-day set, one
    partitioned append — a single distributed job instead of D sequential
    fetch→write round-trips (the reference's loop costs a driver
    round-trip per day plus its deliberate 100 ms sleep,
    repair/main.go:380; at a year of backfill that's the wall-clock).

    Scope: insert-missing only — force-recompute/delete semantics need
    the per-day decision matrix and stay in ``backfill_days``. Existing
    days are skipped atomically (the filter is computed from the store
    BEFORE the append, and appends never touch existing files, so a
    concurrent reader never sees a partial day replaced).

    ``fetch_range`` must return METRICS_SCHEMA + collected_date rows for
    [start, end] inclusive; rows outside are filtered defensively.
    """
    summary = BackfillSummary()
    n_days = (end - start).days + 1
    summary.processed = n_days
    existing = existing_day_counts(spark, table_path, query_id)
    have = sorted(d for d, n in existing.items() if n > 0 and start <= d <= end)
    summary.skipped_existing = len(have)
    if summary.skipped_existing == n_days:
        return summary
    records = fetch_range(day_end(start), day_end(end)).where(
        (F.col("collected_date") >= F.lit(start))
        & (F.col("collected_date") <= F.lit(end))
        & ~F.col("collected_date").isin(have)
    )
    records = records.persist()  # day-list pass + append: one source read
    try:
        inserted = [
            r["collected_date"]
            for r in records.select("collected_date").distinct().collect()
        ]
        if inserted:
            append_records(records, table_path)
    finally:
        records.unpersist()
    summary.inserted_days = len(inserted)
    summary.skipped_no_data = n_days - summary.skipped_existing - len(inserted)
    return summary
