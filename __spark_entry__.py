"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``prom_etl_db_spark.queries`` — one entry per
implemented operator from SURVEY.md §2, each carrying its DuckDB oracle
SQL next to the Spark implementation.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from prom_etl_db_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's production GPU-utilization query (migrate.sql:105)
    re-expressed as native DataFrame combinators (SURVEY.md §2.B).
    """
    return QUERIES["flagship_gpu_utilization"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted only for the
    three genuinely non-SQL-expressible ops — xxhash64-MinHash LSH,
    auto-sized sign-LSH, and HLL++/GK internals — each of which has an
    oracle-checked deterministic twin in the registry; the iterative BPE
    trainer gained a recursive-CTE oracle in r4)."""
    return dict(ORACLES)
