"""As-of and interval join semantics (operators/joins.py) — small
fixtures where every match is checkable by eye."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.operators.joins import asof_join, interval_join

T0 = datetime(2024, 5, 1, 12, 0, 0)


def _ts(sec):
    return T0 + timedelta(seconds=sec)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [("u1", _ts(100), "a"), ("u1", _ts(10), "b"), ("u2", _ts(50), "c")],
        "k string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(20), 1.0), ("u1", _ts(100), 2.0), ("u1", _ts(101), 3.0)],
        "k string, ts timestamp, v double",
    )
    out = {r["tag"]: r["v"] for r in
           asof_join(left, right, on="ts", by=["k"]).collect()}
    assert out["a"] == 2.0  # equal timestamp matches (inclusive)
    assert out["b"] is None  # nothing at or before 10s → left-outer null
    assert out["c"] is None  # other key's rows never leak across groups


def test_asof_tolerance_voids_stale_matches(spark):
    left = spark.createDataFrame(
        [("u1", _ts(1000), "x")], "k string, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [("u1", _ts(0), 9.0)], "k string, ts timestamp, v double"
    )
    fresh = asof_join(left, right, on="ts", by=["k"], tolerance_seconds=2000)
    stale = asof_join(left, right, on="ts", by=["k"], tolerance_seconds=500)
    assert fresh.collect()[0]["v"] == 9.0
    assert stale.collect()[0]["v"] is None


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([("u", _ts(0), 1.0)], "k string, ts timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, on="ts", by=["k"])


def test_interval_join_half_open_and_multichunk(spark):
    points = spark.createDataFrame(
        [("u", _ts(0), 1), ("u", _ts(500), 2), ("u", _ts(86_400 * 3), 3),
         ("u", _ts(-1), 4)],
        "k string, ts timestamp, pid long",
    )
    intervals = spark.createDataFrame(
        # 3-day interval spans multiple 1-day chunks
        [("u", _ts(0), _ts(86_400 * 3), 7)],
        "k string, start timestamp, end timestamp, iid long",
    )
    got = sorted(
        r["pid"]
        for r in interval_join(
            points, intervals, point_ts="ts", by=["k"], chunk_seconds=86_400
        ).collect()
    )
    # start inclusive (pid 1), interior (2); end exclusive (3); before (4)
    assert got == [1, 2]


def test_interval_join_each_pair_exactly_once(spark):
    # a long interval covering many chunks must not duplicate matches
    points = spark.createDataFrame(
        [("u", _ts(3600 * i), i) for i in range(50)],
        "k string, ts timestamp, pid long",
    )
    intervals = spark.createDataFrame(
        [("u", _ts(0), _ts(3600 * 49), 1)],
        "k string, start timestamp, end timestamp, iid long",
    )
    out = interval_join(
        points, intervals, point_ts="ts", by=["k"], chunk_seconds=3600
    )
    assert out.count() == 49  # pids 0..48 (49 excluded by half-open end)
    assert out.select("pid").distinct().count() == 49


# --- r6: interval-overlap join + SCD2 ---------------------------------------


def test_interval_overlap_join_exact_pairs_once(spark):
    from datetime import datetime as dt

    from prom_etl_db_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [
            ("a", dt(2024, 1, 1, 0), dt(2024, 1, 3, 0)),   # spans 3 chunks
            ("b", dt(2024, 1, 5, 0), dt(2024, 1, 5, 1)),
        ],
        "lid string, start timestamp_ntz, end timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("x", dt(2024, 1, 2, 12), dt(2024, 1, 6, 0)),  # overlaps both
            ("y", dt(2024, 1, 3, 0), dt(2024, 1, 4, 0)),   # touches a's end: NO (half-open)
            ("z", dt(2023, 12, 31, 0), dt(2024, 1, 1, 1)), # overlaps a only
        ],
        "rid string, r_start timestamp_ntz, r_end timestamp_ntz",
    )
    rows = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(left, right).collect()
    )
    # each true pair exactly ONCE despite multi-chunk overlap spans
    assert rows == [("a", "x"), ("a", "z"), ("b", "x")]
    plan = interval_overlap_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_interval_overlap_join_column_collision_refused(spark):
    from prom_etl_db_spark.operators.joins import interval_overlap_join

    df = spark.createDataFrame([("a",)], "same string")
    import pytest as _pt

    with _pt.raises(ValueError, match="collision"):
        interval_overlap_join(
            df.withColumns({"start": F.current_timestamp(), "end": F.current_timestamp()}),
            df.withColumns({"r_start": F.current_timestamp(), "r_end": F.current_timestamp()}),
        )


def test_scd2_intervals_runs_and_current_flag(spark):
    from datetime import datetime as dt

    from prom_etl_db_spark.operators.joins import scd2_intervals

    df = spark.createDataFrame(
        [
            (1, "A", dt(2024, 1, 1), 1),
            (1, "A", dt(2024, 1, 2), 2),   # unchanged → same run
            (1, "B", dt(2024, 1, 3), 3),
            (1, "A", dt(2024, 1, 4), 4),   # back to A → NEW run (not merged)
            (2, "C", dt(2024, 1, 1), 5),
        ],
        "k int, state string, ts timestamp_ntz, eid int",
    )
    rows = sorted(
        map(
            tuple,
            scd2_intervals(
                df, key_cols=("k",), ts_col="ts", state_cols=("state",),
                tiebreak_cols=("eid",),
            ).select("k", "state", "valid_from", "valid_to", "is_current").collect(),
        )
    )
    from datetime import datetime as d

    assert rows == [
        (1, "A", d(2024, 1, 1), d(2024, 1, 3), False),
        (1, "A", d(2024, 1, 4), None, True),
        (1, "B", d(2024, 1, 3), d(2024, 1, 4), False),
        (2, "C", d(2024, 1, 1), None, True),
    ]


def test_scd2_null_state_transitions(spark):
    from datetime import datetime as dt

    from prom_etl_db_spark.operators.joins import scd2_intervals

    df = spark.createDataFrame(
        [(1, None, dt(2024, 1, 1), 1), (1, None, dt(2024, 1, 2), 2),
         (1, "A", dt(2024, 1, 3), 3)],
        "k int, state string, ts timestamp_ntz, eid int",
    )
    rows = scd2_intervals(
        df, key_cols=("k",), ts_col="ts", state_cols=("state",),
        tiebreak_cols=("eid",),
    ).collect()
    # NULL==NULL via eqNullSafe: the two NULL rows are ONE run
    assert len(rows) == 2
