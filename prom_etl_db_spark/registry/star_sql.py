"""SQL-surface depth on the star schema (grouped aggs, broadcast joins,
top-N at bench scale — the TPC-H-style rows)."""

from __future__ import annotations

from datetime import datetime, timedelta  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from prom_etl_db_spark import store  # noqa: F401
from prom_etl_db_spark.functions import (  # noqa: F401
    clustering,
    decontam,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
from prom_etl_db_spark.operators import analytics, promql  # noqa: F401
from prom_etl_db_spark.registry.core import (  # noqa: F401
    FLAGSHIP_DAY,
    NOW,
    _event_samples,
    _events,
    _t,
    register,
)
from prom_etl_db_spark.timeparse import RelativeTimeParser  # noqa: F401


# =========================================================================
# SQL-surface depth on the star schema (grouped aggs, joins, top-N at
# bench scale)
# =========================================================================


@register(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape over the synthetic lineitem — the bench workhorse:
    wide aggregation, 6 aggregates, 2 group keys, filter pushed to scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit(datetime(2000, 12, 1)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "top_customers",
    oracle="""
SELECT c.c_custkey, c.c_name, round(sum(o.o_totalprice), 2) AS total_spend,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spend DESC, c_custkey ASC LIMIT 10
""",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join surface: fact⋈dim with the dim broadcast (no fact shuffle for
    the join), then top-N."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "order_priority_count",
    oracle="""
SELECT o_orderpriority, count(*) AS n FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY o_orderpriority
""",
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count with a pushed-down date-range filter (TPC-H Q4 shape)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit(datetime(1996, 1, 1)))
            & (F.col("o_orderdate") < F.lit(datetime(1996, 4, 1)))
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "regional_revenue",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop dim chain (orders→customer→nation→region), every dim
    broadcast — the fact table never shuffles until the final group-by."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


