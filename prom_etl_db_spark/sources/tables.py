"""Parquet table loaders for the driver's synthetic star schema (TESTDATA.md).

The scan path is where 100 TB lives or dies: loaders return the raw
``spark.read.parquet`` DataFrame and let callers project/filter so Catalyst
pushes predicates and prunes columns into the scan (verify with
``df.explain``: ``PushedFilters`` / ``ReadSchema`` — SURVEY.md §4.2).
"""

from __future__ import annotations

import os
import threading
import weakref
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str, _stat_key: tuple = ()) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark rejects them by
    default, so they're read as long (nanosAsLong) and converted.
    ``_stat_key`` carries (mtime_ns, size) into the memo key so a
    rewritten file's schema is re-probed, same freshness rule as the
    plan-root cache."""
    import pyarrow.parquet as pq

    return tuple(
        f.name for f in pq.read_schema(path) if str(f.type) == "timestamp[ns]"
    )


# session -> {(path, mtime_ns, size): DataFrame plan root}. Building a
# reader re-probes the file footer and costs ~0.1 s of driver round trips
# PER QUERY; the plan root is immutable, so one per (session, file
# identity) serves every query in that session. The stat in the key keeps
# the freshness contract: a rewritten/regenerated fixture gets a NEW plan
# root on the next call instead of a stale file listing (one os.stat per
# call is noise next to the footer probe it avoids). Weak keys: a stopped
# session's cache dies with it.
_PLAN_ROOTS: "weakref.WeakKeyDictionary[SparkSession, dict[tuple, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

# The nanos read below temporarily mutates SESSION-WIDE conf; two
# concurrent load_table calls (serve's parallel tick threads) could
# otherwise interleave set/analyze/restore — letting a non-nanos read
# analyze with the flag on (harmless) or a nanos read analyze with it
# cleared (AnalysisException at plan time). One module lock serializes
# only the conf-mutating window; cached plan-root hits never take it.
_NANOS_CONF_LOCK = threading.Lock()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table. Plain parquet scan — no data caching, no
    collect; Catalyst prunes from here (the memoized object is only the
    lazy plan root).

    Nanosecond-timestamp columns (the events fixture) are normalized to
    TimestampType (µs): integer DIV keeps the conversion exact, and the
    projection still allows pushdown on every other column.
    """
    path = f"{sf_dir}/{name}.parquet"
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    cache = _PLAN_ROOTS.setdefault(spark, {})
    if key in cache:
        return cache[key]
    ns_cols = _nanos_ts_columns(path, key[1:])
    if not ns_cols:
        df = spark.read.parquet(path)
    else:
        # Scope the legacy flag to THIS load: relation resolution is
        # lazy, so forcing .schema pins the long-typed read into the
        # analyzed plan, after which the session conf is restored —
        # leaving it set would make every LATER nanos read in the
        # session silently yield raw longs outside this conversion path.
        # The lock serializes the whole set/analyze/restore window
        # against concurrent load_table threads (ADVICE r3).
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        with _NANOS_CONF_LOCK:
            prev = spark.conf.get(conf_key, None)
            spark.conf.set(conf_key, "true")
            try:
                df = spark.read.parquet(path)
                for c in ns_cols:
                    df = df.withColumn(
                        c, F.expr(f"timestamp_micros({c} DIV 1000)")
                    )
                df.schema  # force analysis while the flag is on
            finally:
                if prev is None:
                    spark.conf.unset(conf_key)
                else:
                    spark.conf.set(conf_key, prev)
    cache[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the Spark-SQL surface
    (SURVEY.md §3.3: downstream analytics run as ``spark.sql`` over views)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
