"""Config catalog (A23-A25) and per-day backfill loop (A26-A28) tests."""

from __future__ import annotations

from datetime import date, datetime, timedelta

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.backfill import (
    RetentionError,
    backfill_days,
    day_end,
    is_retention_error,
)
from prom_etl_db_spark.config import (
    QueryConfig,
    delete_config,
    load_enabled,
    toggle_enabled,
    upsert_config,
)
from prom_etl_db_spark.ingest import normalize_vector
from prom_etl_db_spark.schema import WIRE_VECTOR_SCHEMA
from prom_etl_db_spark.store import append_records

# -- A23-A25 config catalog --------------------------------------------------


@pytest.fixture()
def catalog(tmp_path):
    return str(tmp_path / "configs")


def _cfg(qid: str, **kw) -> QueryConfig:
    return QueryConfig(query_id=qid, name=f"name-{qid}", query="up", **kw)


def test_config_upsert_insert_and_update(spark, catalog):
    upsert_config(spark, catalog, _cfg("q1"))
    upsert_config(spark, catalog, _cfg("q2", enabled=False))
    assert [c.query_id for c in load_enabled(spark, catalog)] == ["q1"]

    # upsert same key updates in place (ON DUPLICATE KEY UPDATE parity)
    created = load_enabled(spark, catalog)[0].created_at
    updated = _cfg("q1")
    updated.query = "up == bool 1"
    upsert_config(spark, catalog, updated)
    cfgs = load_enabled(spark, catalog)
    assert len(cfgs) == 1 and cfgs[0].query == "up == bool 1"
    assert cfgs[0].created_at == created  # created_at survives update


def test_config_toggle_and_delete(spark, catalog):
    upsert_config(spark, catalog, _cfg("q1"))
    upsert_config(spark, catalog, _cfg("q2"))
    toggle_enabled(spark, catalog, "q1", False)
    assert [c.query_id for c in load_enabled(spark, catalog)] == ["q2"]
    toggle_enabled(spark, catalog, "q1", True)
    delete_config(spark, catalog, "q2")
    assert [c.query_id for c in load_enabled(spark, catalog)] == ["q1"]


def test_config_ordered_by_created_at(spark, catalog):
    upsert_config(spark, catalog, _cfg("b", created_at=datetime(2024, 1, 2)))
    upsert_config(spark, catalog, _cfg("a", created_at=datetime(2024, 1, 1)))
    assert [c.query_id for c in load_enabled(spark, catalog)] == ["a", "b"]


def test_config_validation_rejects_bad_cron(spark, catalog):
    with pytest.raises(ValueError):
        upsert_config(spark, catalog, _cfg("q1", schedule="not a cron"))
    with pytest.raises(ValueError):
        upsert_config(spark, catalog, QueryConfig(query_id="", name="n", query="q"))


# -- A26-A28 backfill loop ---------------------------------------------------


def _fetch_day_factory(spark, fail_days=()):
    """fetch_day returning one record at the queried instant; raises a
    retention-style error for configured days."""

    def fetch(at: datetime):
        if at.date() in fail_days:
            raise RetentionError(f"query data is out of bounds for {at.date()}")
        df = spark.createDataFrame(
            [({"host": "a"}, at.timestamp(), "1.0")], WIRE_VECTOR_SCHEMA
        )
        # repair parity: pin "now" to targetDate+24h so yesterday_end
        # buckets onto the target day itself (repair/main.go:530-534)
        pinned_now = datetime.combine(at.date(), datetime.min.time()) + timedelta(days=1)
        return normalize_vector(df, "q1", now=pinned_now, time_expr="yesterday_end")

    return fetch


def test_backfill_inserts_then_skips(spark, tmp_path):
    path = str(tmp_path / "metrics")
    args = dict(
        query_id="q1",
        start=date(2024, 3, 1),
        end=date(2024, 3, 3),
        fetch_day=_fetch_day_factory(spark),
        table_path=path,
    )
    s1 = backfill_days(spark, **args)
    assert (s1.processed, s1.inserted_days, s1.skipped_existing) == (3, 3, 0)

    # second run is a no-op — the A26 idempotency gate
    s2 = backfill_days(spark, **args)
    assert (s2.processed, s2.inserted_days, s2.skipped_existing) == (3, 0, 3)
    assert spark.read.parquet(path).count() == 3


def test_backfill_force_recompute_rewrites_day_only(spark, tmp_path):
    path = str(tmp_path / "metrics")
    args = dict(
        query_id="q1",
        start=date(2024, 3, 1),
        end=date(2024, 3, 2),
        fetch_day=_fetch_day_factory(spark),
        table_path=path,
    )
    backfill_days(spark, **args)
    s = backfill_days(spark, force_recompute=True, **args)
    assert s.inserted_days == 2
    out = spark.read.parquet(path)
    assert out.count() == 2  # rewritten, not duplicated
    assert out.select("collected_date").distinct().count() == 2


def test_backfill_retention_errors_skipped(spark, tmp_path):
    path = str(tmp_path / "metrics")
    s = backfill_days(
        spark,
        query_id="q1",
        start=date(2024, 3, 1),
        end=date(2024, 3, 3),
        fetch_day=_fetch_day_factory(spark, fail_days={date(2024, 3, 1)}),
        table_path=path,
    )
    assert s.skipped_retention == 1 and s.inserted_days == 2
    assert not s.failed


def test_backfill_dry_run_writes_nothing(spark, tmp_path):
    path = str(tmp_path / "metrics")
    s = backfill_days(
        spark,
        query_id="q1",
        start=date(2024, 3, 1),
        end=date(2024, 3, 2),
        fetch_day=_fetch_day_factory(spark),
        table_path=path,
        dry_run=True,
    )
    assert s.dry_run_days == ["2024-03-01:insert", "2024-03-02:insert"]
    with pytest.raises(Exception):
        spark.read.parquet(path).count()


def _empty_fetch_factory(spark):
    """fetch_day that finds no source data for any day."""

    def fetch(at: datetime):
        df = spark.createDataFrame([], WIRE_VECTOR_SCHEMA)
        return normalize_vector(df, "q1", now=at, time_expr="yesterday_end")

    return fetch


def test_backfill_force_empty_fetch_deletes_stale_slice(spark, tmp_path):
    # repair/main.go:296-306: force + Prometheus returns no data + no
    # skip-if-no-data -> DeleteMetricsByDate. The stale slice must NOT
    # silently survive, and sibling query_ids sharing the day must.
    path = str(tmp_path / "metrics")
    day = date(2024, 3, 1)
    backfill_days(
        spark,
        query_id="q1",
        start=day,
        end=day,
        fetch_day=_fetch_day_factory(spark),
        table_path=path,
    )
    # a sibling query's rows in the same day partition
    sibling = _fetch_day_factory(spark)(datetime(2024, 3, 1, 23, 59, 59))
    sibling = sibling.withColumn("query_id", F.lit("q2"))
    append_records(sibling, path)

    s = backfill_days(
        spark,
        query_id="q1",
        start=day,
        end=day,
        fetch_day=_empty_fetch_factory(spark),
        table_path=path,
        force_recompute=True,
    )
    assert (s.deleted_days, s.inserted_days, s.skipped_no_data) == (1, 0, 0)
    out = spark.read.parquet(path)
    assert out.count() == 1  # only the sibling survives
    assert out.select("query_id").first()["query_id"] == "q2"


def test_backfill_force_empty_fetch_skip_if_no_data_keeps_old(spark, tmp_path):
    path = str(tmp_path / "metrics")
    day = date(2024, 3, 1)
    backfill_days(
        spark, query_id="q1", start=day, end=day,
        fetch_day=_fetch_day_factory(spark), table_path=path,
    )
    s = backfill_days(
        spark, query_id="q1", start=day, end=day,
        fetch_day=_empty_fetch_factory(spark), table_path=path,
        force_recompute=True, skip_if_no_data=True,
    )
    assert (s.deleted_days, s.skipped_no_data) == (0, 1)
    assert spark.read.parquet(path).count() == 1  # old data kept


def test_backfill_empty_fetch_without_force_skips(spark, tmp_path):
    path = str(tmp_path / "metrics")
    day = date(2024, 3, 1)
    s = backfill_days(
        spark, query_id="q1", start=day, end=day,
        fetch_day=_empty_fetch_factory(spark), table_path=path,
    )
    assert (s.inserted_days, s.skipped_no_data, s.deleted_days) == (0, 1, 0)
    with pytest.raises(Exception):
        spark.read.parquet(path).count()  # nothing was written


def test_backfill_dry_run_reports_delete_for_force_empty(spark, tmp_path):
    path = str(tmp_path / "metrics")
    day = date(2024, 3, 1)
    backfill_days(
        spark, query_id="q1", start=day, end=day,
        fetch_day=_fetch_day_factory(spark), table_path=path,
    )
    s = backfill_days(
        spark, query_id="q1", start=day, end=day,
        fetch_day=_empty_fetch_factory(spark), table_path=path,
        force_recompute=True, dry_run=True,
    )
    assert s.dry_run_days == ["2024-03-01:delete"]
    assert s.deleted_days == 1
    assert spark.read.parquet(path).count() == 1  # dry run wrote nothing


def test_retention_classifier():
    assert is_retention_error(RuntimeError("samples too old for ingestion"))
    assert is_retention_error(RetentionError("x"))
    assert not is_retention_error(RuntimeError("connection refused"))


def test_day_end():
    assert day_end(date(2024, 3, 1)) == datetime(2024, 3, 1, 23, 59, 59)


def test_backfill_range_bulk_matches_per_day_loop(spark, tmp_path):
    """The one-job bulk path must land exactly what the per-day loop
    would for the insert-missing case, skip existing days, and re-run as
    a no-op."""
    from prom_etl_db_spark.backfill import backfill_range_bulk

    fetch_day = _fetch_day_factory(spark)

    def fetch_range(start_at, end_at):
        dfs, at = [], start_at
        while at.date() <= end_at.date():
            dfs.append(fetch_day(at))
            at = at + timedelta(days=1)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    loop_path = str(tmp_path / "loop")
    bulk_path = str(tmp_path / "bulk")
    args = dict(query_id="q1", start=date(2024, 3, 1), end=date(2024, 3, 4))
    backfill_days(spark, fetch_day=fetch_day, table_path=loop_path, **args)

    # pre-seed one day so the bulk run must skip it
    backfill_days(
        spark, fetch_day=fetch_day, table_path=bulk_path,
        query_id="q1", start=date(2024, 3, 2), end=date(2024, 3, 2),
    )
    s = backfill_range_bulk(
        spark, fetch_range=fetch_range, table_path=bulk_path, **args
    )
    assert (s.processed, s.inserted_days, s.skipped_existing) == (4, 3, 1)

    def rows(p):
        return sorted(
            (str(sorted(r["labels"].items())),) + tuple(r)[1:]
            for r in spark.read.parquet(p).collect()
        )

    assert rows(loop_path) == rows(bulk_path)

    # idempotent re-run
    s2 = backfill_range_bulk(
        spark, fetch_range=fetch_range, table_path=bulk_path, **args
    )
    assert (s2.inserted_days, s2.skipped_existing) == (0, 4)


def test_config_read_failure_does_not_wipe_catalog(spark, catalog):
    # a transient/corrupt read must RAISE, not canonicalize to an empty
    # catalog — upsert would otherwise rewrite the table as the single
    # touched row, destroying every other config
    import pathlib

    upsert_config(spark, catalog, _cfg("q1"))
    upsert_config(spark, catalog, _cfg("q2"))
    # corrupt the catalog: a parquet file with a garbage footer
    victim = next(pathlib.Path(catalog).glob("*.parquet"))
    victim.write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        upsert_config(spark, catalog, _cfg("q3"))
    # a missing catalog is still a clean empty read (bootstrap path)
    assert load_enabled(spark, str(catalog) + "-never-written") == []


def test_existing_day_counts_read_failure_raises_not_empty(spark, tmp_path):
    # swallowing a read failure into {} would make every day look
    # missing and re-append duplicates for days that already exist
    import pathlib

    from prom_etl_db_spark.backfill import existing_day_counts

    store = str(tmp_path / "metrics")
    day = date(2024, 3, 1)
    append_records(_fetch_day_factory(spark)(day_end(day)), store)
    assert existing_day_counts(spark, store, "q1") == {day: 1}
    part = pathlib.Path(store) / f"collected_date={day.isoformat()}"
    next(part.glob("*.parquet")).write_bytes(b"junk")
    with pytest.raises(Exception):
        existing_day_counts(spark, store, "q1")
    # missing store stays a clean "nothing backfilled yet"
    assert existing_day_counts(spark, str(tmp_path / "nope"), "q1") == {}
