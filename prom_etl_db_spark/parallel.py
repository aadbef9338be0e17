"""Compute-balance helper for CPU-heavy per-row operators.

A narrow parquet scan of a small-but-compute-dense table (documents,
media payloads) yields as few as ONE input partition at 128 MB
``maxPartitionBytes`` — and then shingling / pandas-UDF decode runs on one
core while the rest idle. ``balance`` repartitions up to executor
parallelism **only when the input is narrower than that**, so at real
cluster scale (inputs already hundreds of partitions) it is a no-op and
costs no shuffle. Hash-partitioning on the id column also pre-balances
skew ahead of the heavy map (SURVEY.md §7.3 scale mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def balance(df: DataFrame, *keys: str, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: defaultParallelism)
    partitions keyed on ``keys`` iff it currently has fewer — a cheap
    shuffle of the small input that unlocks full-width execution of an
    expensive downstream map; a no-op on already-wide inputs."""
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # plan not convertible cheaply — don't risk a job
        return df
    if current >= n:
        return df
    cols = [F.col(k) for k in keys]
    return df.repartition(n, *cols) if cols else df.repartition(n)
