"""Canonical schemas and series-key canonicalization (SURVEY.md §1.3).

Mirrors the reference DDL (`/root/reference/scripts/migrate.sql:18-83`) and
the Go structs (`/root/reference/internal/models/models.go:39-96`), mapped
onto Spark types per SURVEY.md §1.2: labels are a native
``MapType(String, String)`` (not a JSON string — JSON only at external
edges), values are IEEE-754 doubles (NaN/±Inf allowed, unlike MySQL), and a
derived ``collected_date`` DateType is the physical partition column
(replacing the reference's five InnoDB indexes, `migrate.sql:29-33`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# result_type enum ('instant','range','scalar') — migrate.sql:26
RESULT_TYPES = ("instant", "range", "scalar")
# execution status enum — migrate.sql:43
EXECUTION_STATUSES = ("running", "success", "failed", "timeout")

# metrics_data — migrate.sql:18-34 / models.go:39-48
METRICS_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("metric_name", StringType(), False),
        StructField("labels", MapType(StringType(), StringType()), False),
        StructField("value", DoubleType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("result_type", StringType(), False),
        StructField("collected_at", TimestampType(), False),
    ]
)

# metrics_data + derived physical partition column (ours only; SURVEY §1.3)
METRICS_STORED_SCHEMA = StructType(
    METRICS_SCHEMA.fields + [StructField("collected_date", DateType(), True)]
)

# query_executions — migrate.sql:38-55 / models.go:51-62
EXECUTION_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("query_name", StringType(), False),
        StructField("status", StringType(), False),
        StructField("start_time", TimestampType(), False),
        StructField("end_time", TimestampType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("records_count", IntegerType(), True),
        StructField("error_message", StringType(), True),
        StructField("created_at", TimestampType(), False),
    ]
)

# query_configs — migrate.sql:59-83 / models.go:65-96
QUERY_CONFIG_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("description", StringType(), True),
        StructField("query", StringType(), False),
        StructField("schedule", StringType(), False),
        StructField("timeout", StringType(), True),
        StructField("enabled", BooleanType(), False),
        StructField("retry_count", IntegerType(), True),
        StructField("retry_interval", StringType(), True),
        StructField("time_range_type", StringType(), True),
        StructField("time_range_time", StringType(), True),
        StructField("time_range_start", StringType(), True),
        StructField("time_range_end", StringType(), True),
        StructField("time_range_step", StringType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

# Prometheus wire shapes (models.go:21-36) as Spark rows: one row per series,
# values as array<struct<ts,value>> for matrix results before the explode.
WIRE_VECTOR_SCHEMA = StructType(
    [
        StructField("metric", MapType(StringType(), StringType()), False),
        StructField("ts", DoubleType(), False),  # epoch seconds (float)
        StructField("value", StringType(), False),  # Prometheus string-encodes
    ]
)

WIRE_MATRIX_SCHEMA = StructType(
    [
        StructField("metric", MapType(StringType(), StringType()), False),
        StructField(
            "values",
            # [ [ts, "val"], ... ] — arity-2 pairs on the wire; kept as loose
            # string arrays so malformed pairs survive to the A12 quarantine
            # filter instead of failing the parse.
            ArrayType(ArrayType(StringType())),
            False,
        ),
    ]
)


def epoch_seconds(ts: Column) -> Column:
    """Fractional epoch seconds of a timestamp column of EITHER flavor.

    Parquet written by pandas/pyarrow without a timezone reads back as
    TIMESTAMP_NTZ, which Spark 4.1 refuses to cast straight to double
    (DATATYPE_MISMATCH); TIMESTAMP (ltz) casts fine. Bridging through an
    explicit ``timestamp`` cast handles both: an LTZ input is untouched and
    an NTZ input is interpreted in the session timezone — pinned to UTC in
    ``session.get_spark``, so the value is deterministic and matches what
    DuckDB's ``epoch()`` computes for the same naive timestamps.
    """
    return ts.cast("timestamp").cast("double")


def series_key(labels: Column) -> Column:
    """Canonical series identity for a label map (SURVEY.md §7.3 risk #1).

    Spark cannot ``groupBy`` a MapType; the canonical key joins the
    sorted (key, value) entries with \\x1f/\\x1e separators.
    Deterministic and groupable/joinable, and usable as a MERGE key for
    idempotent re-ingest (A26) — UNDER the assumption that label text
    never contains the \\x1f/\\x1e control characters. Prometheus label
    values may legally contain any UTF-8, so a value embedding those
    separators can collide with a differently-shaped label set; callers
    needing collision-freedom against adversarial label text should key
    on the sorted entries ARRAY itself (``_ensure_series``'s ``__series``
    column) — this string form exists for the SQL-replayable consumers
    (limitk ordering, limit_ratio md5 sampling), whose oracles rebuild
    the same separator scheme.
    """
    keys = F.array_sort(F.map_keys(labels))
    pairs = F.transform(
        keys,
        lambda k: F.concat(
            k, F.lit("\x1f"), F.coalesce(F.element_at(labels, k), F.lit(""))
        ),
    )
    # null and empty label values collapse together — PromQL semantics
    # (absent label ≡ empty label).
    return F.array_join(pairs, "\x1e")
