"""Skew-mitigation joins (operators/skew.py) and bucketed layout
(layout.py): value-identity against the plain join, salt determinism,
NULL-key routing, and the plan-shape guarantees (salted key in the join
condition; NO Exchange in the bucketed join/aggregation)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from prom_etl_db_spark.layout import bucketed_join, write_bucketed
from prom_etl_db_spark.operators.skew import (
    salted_join,
    split_skew_join,
    top_skewed_keys,
)


def _sorted_rows(df):
    # None-tolerant multiset canonicalization (left joins emit NULL keys)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: [(v is None, str(v)) for v in t],
    )


@pytest.fixture()
def skewed(spark):
    """A fact with a 3-value hot key (one value carries 80% of rows) plus
    a NULL-key row, and a per-key dim that is conceptually too big to
    broadcast."""
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 < 8 else ("warm" if i % 10 == 8 else "cool"), float(i))
         for i in range(500)]
        + [(500, None, 1.5)],
        "row_id long, key string, v double",
    )
    dim = spark.createDataFrame(
        [("hot", 1.0), ("warm", 2.0), ("cool", 3.0), ("unseen", 9.0)],
        "key string, w double",
    )
    return fact, dim


def test_salted_join_matches_plain_inner(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, on=["key"], how="inner")
    salted = salted_join(fact, dim, ["key"], salts=7, salt_src=["row_id"])
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_matches_plain_left_and_keeps_null_keys(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, on=["key"], how="left")
    salted = salted_join(fact, dim, ["key"], salts=5, salt_src=["row_id"], how="left")
    rows = _sorted_rows(salted)
    assert rows == _sorted_rows(plain)
    # the NULL-key left row must survive exactly once with a NULL payload
    assert sum(1 for r in rows if r[0] is None) == 1


def test_salted_join_salt_is_deterministic(spark, skewed):
    fact, dim = skewed
    a = salted_join(fact, dim, ["key"], salts=7, salt_src=["row_id"])
    b = salted_join(fact, dim, ["key"], salts=7, salt_src=["row_id"])
    assert _sorted_rows(a) == _sorted_rows(b)


def test_salted_join_condition_carries_salt(spark, skewed):
    """The physical join key must include the salt column — that IS the
    mechanism that widens the key space ×salts."""
    fact, dim = skewed
    plan = salted_join(fact, dim, ["key"], salts=7)._jdf.queryExecution().executedPlan().toString()
    assert "__skew_salt" in plan


def test_salted_join_rejects_right_outer(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(fact, dim, ["key"], how="right")
    with pytest.raises(ValueError, match="salts"):
        salted_join(fact, dim, ["key"], salts=0)


def test_top_skewed_keys_finds_the_hot_key(spark, skewed):
    fact, _ = skewed
    keys = top_skewed_keys(fact, ["key"], k=2, min_share=0.05)
    assert keys[0] == ("hot",)
    assert len(keys) == 2  # 'warm' and 'cool' each carry 10% > 5%... top-2 only


def test_split_skew_join_matches_plain_inner_and_left(spark, skewed):
    fact, dim = skewed
    for how in ("inner", "left"):
        plain = fact.join(dim, on=["key"], how=how)
        split = split_skew_join(fact, dim, ["key"], k=1, how=how)
        assert _sorted_rows(split) == _sorted_rows(plain), how


def test_split_skew_join_null_keys_take_cold_path(spark, skewed):
    fact, dim = skewed
    out = split_skew_join(
        fact, dim, ["key"], hot_keys=[("hot",)], how="left"
    )
    rows = _sorted_rows(out)
    assert sum(1 for r in rows if r[0] is None) == 1


def test_split_skew_join_empty_hot_set_degrades_to_plain(spark, skewed):
    fact, dim = skewed
    out = split_skew_join(fact, dim, ["key"], hot_keys=[], how="inner")
    assert _sorted_rows(out) == _sorted_rows(fact.join(dim, on=["key"]))


# -- bucketed layout ---------------------------------------------------------


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/bdb'")
    yield "bdb"
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    """The whole point of bucketing: both sides pre-shuffled at write
    time, so the join plan contains NO Exchange anywhere."""
    users = spark.range(0, 200).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("grp")
    )
    events = spark.range(0, 2000).select(
        (F.col("id") % 200).alias("user_id"), (F.col("id") * 1.5).alias("v")
    )
    write_bucketed(users, f"{bucket_db}.users_b", key="user_id", buckets=8)
    write_bucketed(events, f"{bucket_db}.events_b", key="user_id", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, f"{bucket_db}.events_b", f"{bucket_db}.users_b", "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucket_db):
    events = spark.range(0, 2000).select(
        (F.col("id") % 200).alias("user_id"), (F.col("id") * 1.5).alias("v")
    )
    write_bucketed(events, f"{bucket_db}.events_agg", key="user_id", buckets=8)
    agg = (
        spark.table(f"{bucket_db}.events_agg")
        .groupBy("user_id")
        .agg(F.sum("v").alias("s"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 200


def test_bucketed_join_values_match_plain(spark, bucket_db):
    users = spark.createDataFrame(
        [Row(user_id=i, grp=i % 3) for i in range(50)]
    )
    events = spark.createDataFrame(
        [Row(user_id=i % 50, v=float(i)) for i in range(400)]
    )
    write_bucketed(users, f"{bucket_db}.u2", key="user_id", buckets=4)
    write_bucketed(events, f"{bucket_db}.e2", key="user_id", buckets=4)
    got = _sorted_rows(
        bucketed_join(spark, f"{bucket_db}.e2", f"{bucket_db}.u2", "user_id")
    )
    want = _sorted_rows(events.join(users, on=["user_id"]))
    assert got == want


# --- Z-order layout (r6) ---------------------------------------------------


def test_z_value_interleave_vectors(spark):
    from prom_etl_db_spark.layout import z_value
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023)], "a long, b long"
    )
    got = [
        r["z"] for r in df.select(
            z_value(F.col("a"), F.col("b"), bits=10).alias("z")
        ).collect()
    ]

    def morton(a, b):
        z = 0
        for i in range(10):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023)]]
    assert morton(1023, 1023) == 2**20 - 1


def test_zorder_buckets_are_tight_squares_but_single_sort_is_not(spark):
    """The data-skipping claim itself: coarse z-curve segments carry
    tight min/max on BOTH dimensions; sorting by one dimension leaves
    the other dimension's per-segment range at full width."""
    from prom_etl_db_spark.layout import z_value
    from pyspark.sql import functions as F

    n = 64
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )
    z = df.withColumn("zval", z_value(F.col("a"), F.col("b"), bits=6))
    seg = (
        z.groupBy(F.shiftright("zval", 6).alias("s"))
        .agg(
            (F.max("a") - F.min("a")).alias("wa"),
            (F.max("b") - F.min("b")).alias("wb"),
        )
        .agg(F.max("wa").alias("wa"), F.max("wb").alias("wb"))
        .first()
    )
    # 2^6-point curve segments tile 8x8 squares: both widths stay 7
    assert seg["wa"] == 7 and seg["wb"] == 7
    lin = (
        df.withColumn("k", F.col("a") * n + F.col("b"))  # sort by a, then b
        .groupBy(F.shiftright(F.col("k"), 6).alias("s"))
        .agg((F.max("b") - F.min("b")).alias("wb"))
        .agg(F.max("wb").alias("wb"))
        .first()
    )
    assert lin["wb"] == 63  # one-dim sort: second dim unbounded per segment


def test_zorder_layout_partitions_are_curve_ranges(spark):
    from prom_etl_db_spark.layout import zorder_layout
    from pyspark.sql import functions as F

    n = 32
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )
    out = zorder_layout(df, "a", "b", n_partitions=8, bits=5)
    parts = out.select("zval").rdd.glom().collect()
    ranges = [(p[0][0], p[-1][0]) for p in parts if p]
    # sorted within partitions, and partition ranges are disjoint curve
    # segments (range partitioning): tight min/max for file skipping
    for p in parts:
        vals = [r[0] for r in p]
        assert vals == sorted(vals)
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
