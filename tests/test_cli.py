"""CLI entry points (__main__.py) — the reference's two binaries as
subcommands, driven end to end against the fixtures."""

from __future__ import annotations

from datetime import datetime

import pytest

from prom_etl_db_spark.config import QueryConfig, upsert_config


@pytest.fixture()
def catalog(spark, tmp_path):
    path = str(tmp_path / "configs")
    upsert_config(
        spark,
        path,
        QueryConfig(
            query_id="cli_sum", name="sum by k", query="sum(click) by (k)",
            time_range_type="range",
            time_range_start="-1d", time_range_end="now", time_range_step="1h",
            retry_count=1, retry_interval="1s",
        ),
    )
    upsert_config(
        spark,
        path,
        QueryConfig(
            query_id="cli_off", name="disabled", query="sum(click) by (k)",
            enabled=False,
        ),
    )
    return path


def test_run_once_executes_enabled_configs(spark, tmp_path, catalog, monkeypatch):
    import prom_etl_db_spark.__main__ as cli
    import prom_etl_db_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda name=None: spark)
    store, audit = str(tmp_path / "metrics"), str(tmp_path / "audit")
    rc = cli.main([
        "run-once", "--configs", catalog, "--store", store, "--audit", audit,
        "--sf-dir", "/root/testdata/sf0.001", "--now", "2024-01-31T00:00:00",
        "--no-sleep",
    ])
    assert rc == 0
    stored = spark.read.parquet(store)
    assert stored.where("query_id = 'cli_sum'").count() > 0
    assert stored.where("query_id = 'cli_off'").count() == 0  # disabled skipped
    audits = spark.read.parquet(audit)
    assert audits.where("status = 'success'").count() == 1


def test_repair_backfills_and_is_idempotent(spark, tmp_path, catalog, monkeypatch):
    import prom_etl_db_spark.__main__ as cli
    import prom_etl_db_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda name=None: spark)
    store = str(tmp_path / "metrics")
    argv = [
        "repair", "--configs", catalog, "--query-id", "cli_sum",
        "--store", store, "--sf-dir", "/root/testdata/sf0.001",
        "--start", "2024-01-10", "--end", "2024-01-12",
    ]
    assert cli.main(argv) == 0
    n1 = spark.read.parquet(store).count()
    assert n1 > 0
    # second run skips existing days — the A26 idempotency gate
    assert cli.main(argv) == 0
    assert spark.read.parquet(store).count() == n1


def test_run_once_rerun_is_idempotent(spark, tmp_path, catalog, monkeypatch):
    import prom_etl_db_spark.__main__ as cli
    import prom_etl_db_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda name=None: spark)
    store, audit = str(tmp_path / "metrics"), str(tmp_path / "audit")
    argv = [
        "run-once", "--configs", catalog, "--store", store, "--audit", audit,
        "--sf-dir", "/root/testdata/sf0.001", "--now", "2024-01-31T00:00:00",
        "--no-sleep", "--mode", "skip-existing",
    ]
    assert cli.main(argv) == 0
    n1 = spark.read.parquet(store).count()
    assert cli.main(argv) == 0  # re-fired scheduler run
    assert spark.read.parquet(store).count() == n1  # no double-insert
    # the second audit records 0 surviving rows, not a failure (both runs
    # share the frozen now, so start_time can't order them)
    audits = spark.read.parquet(audit).collect()
    assert sorted(a["records_count"] for a in audits) == [0, n1]
    assert all(a["status"] == "success" for a in audits)


def test_overwrite_days_preserves_sibling_queries(spark, tmp_path):
    from datetime import date, datetime

    from prom_etl_db_spark.store import append_records, overwrite_days

    def recs(qid, day, value):
        return spark.createDataFrame(
            [(qid, "m", {"h": "a"}, value, datetime(2024, 1, day, 12), "instant",
              datetime(2024, 1, day), date(2024, 1, day))],
            "query_id string, metric_name string, labels map<string,string>, "
            "value double, timestamp timestamp, result_type string, "
            "collected_at timestamp, collected_date date",
        )

    path = str(tmp_path / "t")
    append_records(recs("q_a", 5, 1.0), path)
    append_records(recs("q_b", 5, 2.0), path)  # sibling query, SAME day
    overwrite_days(recs("q_a", 5, 9.0), path)  # force-recompute q_a only
    rows = {r["query_id"]: r["value"] for r in spark.read.parquet(path).collect()}
    assert rows == {"q_a": 9.0, "q_b": 2.0}  # q_b survived the rewrite


def test_repair_handles_yesterday_anchored_configs(spark, tmp_path, monkeypatch):
    # the standard daily-report shape: yesterday..yesterday_end — the
    # resolver "now" must pin to target_day+24h (reference repair
    # behavior) or every repaired day comes back empty
    import prom_etl_db_spark.__main__ as cli
    import prom_etl_db_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda name=None: spark)
    path = str(tmp_path / "configs")
    upsert_config(
        spark, path,
        QueryConfig(
            query_id="daily", name="daily", query="sum(click) by (k)",
            time_range_type="range",
            time_range_start="yesterday", time_range_end="yesterday_end",
            time_range_step="1h", enabled=False,  # disabled configs repair too
        ),
    )
    store = str(tmp_path / "metrics")
    rc = cli.main([
        "repair", "--configs", path, "--query-id", "daily",
        "--store", store, "--sf-dir", "/root/testdata/sf0.001",
        "--start", "2024-01-10", "--end", "2024-01-11",
    ])
    assert rc == 0
    out = spark.read.parquet(store)
    assert out.count() > 0  # the clip must not have emptied the days
    days = {r["collected_date"].isoformat() for r in
            out.select("collected_date").distinct().collect()}
    assert days == {"2024-01-10", "2024-01-11"}


def test_config_timeout_records_timeout_status(spark, tmp_path):
    """A config whose write phase exceeds its timeout budget is cancelled
    and audited with status='timeout' (EXECUTION_STATUSES row the
    reference's context.WithTimeout produces)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from prom_etl_db_spark.executor import execute_config_query
    from prom_etl_db_spark.parallel import QueryTimeout

    # four in-staleness samples; a 5s-per-row UDF guarantees the action
    # phase blows the 2s budget regardless of worker warmth/parallelism
    from datetime import timedelta as _td

    now_ts = datetime(2024, 1, 30)
    rows = [
        ("click", {"name": "click"}, float(i), now_ts - _td(seconds=30 * i))
        for i in range(4)
    ]
    samples = spark.createDataFrame(
        rows,
        "metric_name string, labels map<string,string>, value double, "
        "timestamp timestamp",
    )
    import time as _time

    slow = F.udf(lambda v: _time.sleep(5) or float(v), "double")
    slow_samples = samples.withColumn("value", slow(F.col("value")))
    cfg = QueryConfig(
        query_id="slowq", name="slow", query="click", timeout="2s",
        time_range_type="instant", time_range_time="now",
    )
    store = str(tmp_path / "store")
    audit = str(tmp_path / "audit")
    with _pytest.raises(QueryTimeout):
        execute_config_query(
            spark, slow_samples, cfg,
            now=now_ts, store_path=store, audit_path=audit,
        )
    audits = spark.read.parquet(audit).collect()
    assert len(audits) == 1 and audits[0]["status"] == "timeout"


def test_repair_rejects_start_after_end(spark, tmp_path, catalog, monkeypatch):
    # reference parity (cmd/repair/main.go:71-73): a reversed range must
    # error, not silently loop zero days and exit 0
    import prom_etl_db_spark.__main__ as cli
    import prom_etl_db_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda name=None: spark)
    rc = cli.main([
        "repair", "--configs", catalog, "--store", str(tmp_path / "m"),
        "--sf-dir", "/root/testdata/sf0.001", "--query-id", "cli_sum",
        "--start", "2024-02-01", "--end", "2024-01-01",
    ])
    assert rc == 2


def test_repair_skip_if_no_data_defaults_true(spark, tmp_path, catalog, monkeypatch):
    # reference default skipIfNoData=true (cmd/repair/main.go:36): under
    # force-recompute, a day whose fetch returns NO rows keeps its
    # stored slice unless --no-skip-if-no-data opts into the delete
    from datetime import date as _date

    import prom_etl_db_spark.__main__ as cli
    import prom_etl_db_spark.session as sess
    from prom_etl_db_spark.store import append_records
    from prom_etl_db_spark.ingest import normalize_vector
    from prom_etl_db_spark.schema import WIRE_VECTOR_SCHEMA

    monkeypatch.setattr(sess, "get_spark", lambda name=None: spark)
    store = str(tmp_path / "metrics")
    # seed one stored day for cli_sum far OUTSIDE the fixture's data
    # range, so the repair fetch finds no rows for it
    day = _date(2020, 6, 1)
    at = datetime(2020, 6, 1, 23, 59, 59)
    wire = spark.createDataFrame(
        [({"k": "0"}, at.timestamp(), "1.0")], WIRE_VECTOR_SCHEMA
    )
    pinned = datetime(2020, 6, 2)
    append_records(
        normalize_vector(wire, "cli_sum", now=pinned, time_expr="yesterday_end"),
        store,
    )
    args = [
        "repair", "--configs", catalog, "--store", store,
        "--sf-dir", "/root/testdata/sf0.001", "--query-id", "cli_sum",
        "--start", "2020-06-01", "--end", "2020-06-01", "--force-recompute",
    ]
    assert cli.main(args) == 0
    assert spark.read.parquet(store).count() == 1  # default: kept
    assert cli.main(args + ["--no-skip-if-no-data"]) == 0
    import pathlib

    part = pathlib.Path(store) / "collected_date=2020-06-01"
    assert not part.exists()  # explicit opt-in: stale slice deleted
