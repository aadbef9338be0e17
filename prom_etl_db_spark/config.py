"""Query-config catalog (SURVEY.md §2.A rows A23-A25, A34).

The reference keeps query configs in a MySQL table and manipulates them
with scan / upsert / delete / toggle statements
(`/root/reference/internal/config/database_config.go:11-200`). Here the
catalog is a parquet-backed table of ``QueryConfig`` rows. Config tables
are tiny (hundreds of rows), so the upsert/delete path is a
read-modify-overwrite of the whole table — the Delta ``MERGE INTO``
analogue without requiring delta-spark in this container; the read path
(`load_enabled`) is the hot one and stays a plain filtered scan.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from datetime import datetime
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# QueryConfig + TimeRangeConfig flattened (models.go:65-96; DDL
# migrate.sql:59-83): the time-range spec's four columns ride along.
CONFIG_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("query", StringType(), False),
        StructField("schedule", StringType(), False),  # 6-field cron
        StructField("timeout", StringType(), True),  # duration string "30s"
        StructField("retry_count", IntegerType(), True),
        StructField("retry_interval", StringType(), True),
        StructField("enabled", BooleanType(), False),
        StructField("time_range_type", StringType(), True),  # instant|range
        StructField("time_range_time", StringType(), True),
        StructField("time_range_start", StringType(), True),
        StructField("time_range_end", StringType(), True),
        StructField("time_range_step", StringType(), True),
        StructField("created_at", TimestampType(), False),
        StructField("updated_at", TimestampType(), False),
    ]
)


@dataclass
class QueryConfig:
    """One registered query (models.go:65-96)."""

    query_id: str
    name: str
    query: str
    schedule: str = "0 */5 * * * *"
    timeout: str = "30s"
    retry_count: int = 3
    retry_interval: str = "10s"
    enabled: bool = True
    time_range_type: str | None = None
    time_range_time: str | None = None
    time_range_start: str | None = None
    time_range_end: str | None = None
    time_range_step: str | None = None
    created_at: datetime = field(default_factory=datetime.utcnow)
    updated_at: datetime = field(default_factory=datetime.utcnow)

    def validate(self) -> None:
        """A34 required-field checks (config.go:96-124) + schedule parse."""
        from prom_etl_db_spark.scheduler import CronSchedule
        from prom_etl_db_spark.timeparse import parse_duration

        for f_ in ("query_id", "name", "query"):
            if not getattr(self, f_):
                raise ValueError(f"query config missing required field {f_!r}")
        CronSchedule(self.schedule)  # raises on bad cron
        if self.timeout:
            parse_duration(self.timeout)
        if self.time_range_type not in (None, "instant", "range"):
            raise ValueError(f"bad time_range_type {self.time_range_type!r}")


def _df(spark: SparkSession, cfgs: list[QueryConfig]) -> DataFrame:
    rows = [tuple(asdict(c)[f.name] for f in CONFIG_SCHEMA.fields) for c in cfgs]
    return spark.createDataFrame(rows, CONFIG_SCHEMA)


def read_configs(spark: SparkSession, path: str) -> DataFrame:
    # Only a genuinely-missing catalog maps to "empty". A broad
    # try/except here would turn a transient read failure into an empty
    # DataFrame, and the read-modify-overwrite writers below would then
    # rewrite the catalog as just the touched row — destroying every
    # other config. Same missing-vs-failed distinction as
    # store.overwrite_days.
    if not Path(path).exists():
        return spark.createDataFrame([], CONFIG_SCHEMA)
    return spark.read.schema(CONFIG_SCHEMA).parquet(path)


def _to_configs(rows) -> list[QueryConfig]:
    return [
        QueryConfig(**{f.name: r[f.name] for f in CONFIG_SCHEMA.fields}) for r in rows
    ]


def load_enabled(spark: SparkSession, path: str) -> list[QueryConfig]:
    """A23: ``WHERE enabled ORDER BY created_at``
    (database_config.go:11-91); returns typed configs for the scheduler."""
    rows = (
        read_configs(spark, path)
        .where(F.col("enabled"))
        .orderBy("created_at")
        .collect()
    )
    return _to_configs(rows)


def load_all(spark: SparkSession, path: str) -> list[QueryConfig]:
    """Every catalog row, enabled or not — the repair tool's view
    (a disabled config's history is exactly what gets repaired)."""
    return _to_configs(read_configs(spark, path).orderBy("created_at").collect())


def upsert_config(spark: SparkSession, path: str, cfg: QueryConfig) -> None:
    """A24: ``INSERT ... ON DUPLICATE KEY UPDATE`` keyed on query_id
    (database_config.go:94-158) — MERGE semantics via read-modify-overwrite
    of the (tiny) catalog; ``created_at`` survives an update."""
    cfg.validate()
    existing = read_configs(spark, path)
    prior = existing.where(F.col("query_id") == cfg.query_id).collect()
    if prior:
        cfg.created_at = prior[0]["created_at"]
        cfg.updated_at = datetime.utcnow()
    merged = existing.where(F.col("query_id") != cfg.query_id).unionByName(
        _df(spark, [cfg])
    )
    _overwrite(merged, path)


def delete_config(spark: SparkSession, path: str, query_id: str) -> None:
    """A25: delete by query_id (database_config.go:161-176)."""
    _overwrite(
        read_configs(spark, path).where(F.col("query_id") != query_id), path
    )


def toggle_enabled(spark: SparkSession, path: str, query_id: str, enabled: bool) -> None:
    """A25: ``UPDATE enabled=?`` (database_config.go:179-200)."""
    df = read_configs(spark, path).withColumn(
        "enabled",
        F.when(F.col("query_id") == query_id, F.lit(enabled)).otherwise(
            F.col("enabled")
        ),
    )
    _overwrite(df, path)


def _overwrite(df: DataFrame, path: str) -> None:
    # small-table rewrite: materialize driver-side, then write fresh —
    # avoids read-vs-overwrite races on the same path within one plan
    spark = df.sparkSession
    rows = df.collect()
    spark.createDataFrame(rows, CONFIG_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
