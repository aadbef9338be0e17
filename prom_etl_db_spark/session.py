"""SparkSession construction tuned for the engine (SURVEY.md §4.2).

Local defaults mirror the test harness (local[*], 32 shuffle partitions);
on a real cluster the same builder applies with master/partitions from the
environment. AQE stays on everywhere — label cardinality is skewed in the
reference's domain, and AQE's skew-join + partition coalescing are the
scale story for 100 TB (SURVEY.md §7.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "prom-etl-db-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the Pandas-UDF paths (similarity / multimodal ops)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dynamic partition overwrite = the replaceWhere-style idempotent
        # day rewrite (A21/A26) without clobbering sibling partitions.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
