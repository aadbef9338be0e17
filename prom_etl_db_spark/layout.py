"""Bucketed table layout: shuffle-free co-located joins and aggregations.

The reference's one deliberate layout decision is day-bucketed storage
keys (SURVEY.md §4.1, `internal/executor/executor.go:404-461`), which this
engine maps to physical ``collected_date`` partitions (``store.py``). This
module adds the OTHER load-bearing layout tool a 100 TB deployment needs:
**hash bucketing** (`df.write.bucketBy`), which pre-shuffles a table ONCE
at write time so that every later equi-join or aggregation on the bucket
key reads already-co-located data — the scan reports its hash
partitioning to Catalyst, and the Exchange that would otherwise move the
fact table on every query is simply absent from the plan.

When to bucket (the 100 TB decision rule): a table that is joined or
grouped on the same key by many queries (events by ``user_id``, samples
by series key), where one write-time shuffle amortizes across every
read. Both join sides must be bucketed into bucket counts where one
divides the other, on the same key, for the exchange-free plan; matching
``sortBy`` additionally removes the per-task sort before a sort-merge
join. Bucketed tables are registered tables (metastore-backed), not bare
parquet dirs — ``spark.table``, not ``spark.read.parquet``.

Verified by plan-shape tests (tests/test_skew_layout.py): the bucketed
join plan contains NO Exchange on either side, and the bucketed
aggregation plan contains NO Exchange at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: Sequence[str] | str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed, optionally bucket-sorted managed table.

    ``buckets`` sizes the write-time shuffle AND every future join's
    parallelism floor: pick ``ceil(table_bytes / target_partition_bytes)``
    rounded to a power of two so differently-sized tables can still
    co-locate (Spark accepts bucket counts where one side's count divides
    the other's). ``sort=True`` orders rows by the key inside each bucket
    file, which lets a later sort-merge join skip its per-task sort when
    each bucket holds one file (enforce via a pre-write repartition or
    ``spark.sql.files``-sized writes at scale).
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two registered bucketed tables on their bucket key.

    Catalyst reads each side's bucket spec from the metastore and, when
    the keys match and one bucket count divides the other, plans the join
    with no Exchange on either side — each task joins bucket *i* of the
    left against bucket *i* of the right, the exact co-location a
    pre-partitioned 100 TB fact⋈fact join needs (a shape where broadcast
    is impossible and a per-query shuffle of either side would dominate
    the runtime)."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


# ---------------------------------------------------------------------------
# Z-order (Morton) layout: multi-dimensional data-skipping.
#
# The public technique behind Delta Lake's OPTIMIZE ZORDER and the
# classic Morton curve: interleave the bits of two (or more) column
# keys so that range-partitioning on the single interleaved value
# co-locates rows that are close in EVERY dimension. Files/partitions
# then carry tight min/max ranges on BOTH source columns, and a
# predicate on either column prunes most partitions — the property a
# 100 TB scan lives on when queries filter by (host, time) or
# (metric, day) together. Everything below is exact integer algebra
# (bit interleaving), pure Column, SQL-replayable.
# ---------------------------------------------------------------------------


def z_value(a, b, *, bits: int = 21):
    """Morton-interleave two non-negative integer Columns into one
    z-value (a in the even bit positions, b in the odd): for each i <
    ``bits``, bit i of ``a`` lands at position 2i and bit i of ``b`` at
    2i+1. 21 bits/dim keeps the result inside a signed 64-bit long.
    Inputs outside [0, 2^bits) must be range-reduced by the caller
    (quantile bucketing is the production norm — Z-ORDER sorts on rank,
    not raw values, to survive skew)."""
    from pyspark.sql import functions as F

    a = a.cast("long")
    b = b.cast("long")
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def z_value_sql(a_expr: str, b_expr: str, *, bits: int = 21) -> str:
    """The identical interleave as one SQL expression (DuckDB/ANSI
    integer ops) — rendered from the same loop so the two engines
    cannot drift (the mime/sitemap shared-constants pattern)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({a_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(df, a_col: str, b_col: str, *, n_partitions: int, bits: int = 21):
    """Lay ``df`` out on the Morton curve of (a_col, b_col):
    repartitionByRange on the z-value (range partitioning = contiguous
    curve segments = tight per-partition min/max on BOTH columns), then
    sort within partitions so file-level skipping indexes stay tight.
    The ``zval`` column is kept — it is the sort key a writer would
    drop at the final projection."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("zval", z_value(F.col(a_col), F.col(b_col), bits=bits))
    return keyed.repartitionByRange(n_partitions, "zval").sortWithinPartitions("zval")
