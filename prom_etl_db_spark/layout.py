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
