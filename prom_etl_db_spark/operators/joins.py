"""Time-series join operators Spark lacks natively: as-of join and
interval (range) join.

The reference has no joins at all (SURVEY.md §2.C "not present" note);
these are the custom time-series operators a stored-samples engine needs
(align a series to another's most recent value; attribute points to time
windows) — built strictly from shuffle-friendly primitives:

- **as-of join**: NOT an inequality join (which Catalyst can only run as
  BroadcastNestedLoop — quadratic). Union both sides tagged, one
  window per key ordered by (time, tag), carry the right side's latest
  payload forward, keep left rows. One shuffle + one per-key sort,
  identical asymptotics to the aggregations elsewhere in this engine.
- **interval join**: equi-join on overlapping time CHUNKS (intervals
  explode to the chunks they cover, points map to exactly one chunk),
  then the exact containment predicate filters within chunk pairs.
  Chunk width trades interval duplication (duration/chunk + 1 copies)
  against bucket selectivity — size it near the median interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_etl_db_spark.schema import epoch_seconds
from pyspark.sql.window import Window

__all__ = ["asof_join", "interval_join", "interval_overlap_join", "scd2_intervals"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "timestamp",
    by: Sequence[str] = (),
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (inclusive —
    DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics; left-outer: no
    match → nulls). ``tolerance_seconds`` voids matches older than the
    given horizon.

    Right payload columns must not collide with left column names.
    Equal-timestamp ties order the right row first (so it matches) —
    among multiple right rows at the SAME timestamp the winner is
    unspecified, like any engine's as-of.
    """
    by = list(by)
    rpayload = [c for c in right.columns if c not in by and c != on]
    clash = set(rpayload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    l2 = left.withColumn("__is_left", F.lit(1)).withColumn("__t", F.col(on))
    r2 = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(on).alias("__rts"), *[F.col(c) for c in rpayload]
        ).alias("__r"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    matched = u.withColumn("__r", carried).where(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        fresh = (
            epoch_seconds(F.col("__t")) - epoch_seconds(F.col("__r.__rts"))
        ) <= tolerance_seconds
        matched = matched.withColumn(
            "__r", F.when(fresh, F.col("__r"))  # stale → NULL struct → null cols
        )
    return matched.select(
        *left.columns, *[F.col(f"__r.{c}").alias(c) for c in rpayload]
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = (),
    chunk_seconds: int = 86_400,
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point_ts < end`` (and
    equal ``by`` keys) — as an EQUI-join: each interval replicates onto
    the fixed-width time chunks it covers, each point belongs to exactly
    one chunk, the exact half-open containment filters after the chunk
    match. No BroadcastNestedLoopJoin at any input size; each true pair
    appears exactly once (a point's single chunk meets a given interval
    at most once).

    Output: all point columns + all interval columns (names must not
    collide).
    """
    clash = (set(points.columns) & set(intervals.columns)) - set(by)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    chunk_of = lambda c: F.floor(epoch_seconds(c) / chunk_seconds).cast("long")  # noqa: E731
    p = points.withColumn("__chunk", chunk_of(F.col(point_ts)))
    i = intervals.withColumn(
        "__chunk",
        F.explode(
            F.sequence(chunk_of(F.col(start_col)), chunk_of(F.col(end_col)))
        ),
    )
    return (
        p.join(i, [*by, "__chunk"])
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__chunk")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "r_start",
    right_end: str = "r_end",
    by: Sequence[str] = (),
    chunk_seconds: int = 86_400,
) -> DataFrame:
    """All (left, right) interval pairs that OVERLAP (half-open:
    ``l.start < r.end AND r.start < l.end``, equal ``by`` keys) — as an
    EQUI-join, the range-join binning technique: both sides replicate
    onto fixed-width time chunks, chunk equality is the join key, the
    exact overlap predicate filters inside chunk pairs. Two long
    intervals can share MANY chunks, so each true pair is kept only in
    the chunk containing ``max(l.start, r.start)`` — every overlapping
    pair has exactly one such chunk, making the dedup a filter instead
    of a DISTINCT over the fan-out. No BroadcastNestedLoopJoin at any
    size; chunk width trades replication against selectivity exactly
    as in :func:`interval_join`."""
    clash = (set(left.columns) & set(right.columns)) - set(by)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    chunk_of = lambda c: F.floor(epoch_seconds(c) / chunk_seconds).cast("long")  # noqa: E731
    l = left.withColumn(
        "__chunk",
        F.explode(F.sequence(chunk_of(F.col(left_start)), chunk_of(F.col(left_end)))),
    )
    r = right.withColumn(
        "__chunk",
        F.explode(F.sequence(chunk_of(F.col(right_start)), chunk_of(F.col(right_end)))),
    )
    pair_chunk = F.floor(
        F.greatest(
            epoch_seconds(F.col(left_start)), epoch_seconds(F.col(right_start))
        )
        / chunk_seconds
    ).cast("long")
    return (
        l.join(r, [*by, "__chunk"])
        .where(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (F.col("__chunk") == pair_chunk)
        )
        .drop("__chunk")
    )


def scd2_intervals(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    state_cols: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals from a change stream:
    per key, collapse consecutive rows with UNCHANGED state, then emit
    one row per state run with ``valid_from`` (its first ts),
    ``valid_to`` (the next run's first ts; NULL while current) and
    ``is_current``. Two windows per key (change detection via lag,
    interval close via lead) — the same one-shuffle-one-sort shape as
    asof_join; at 100 TB keys partition the work and runs compress the
    output to the number of actual changes."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for c in state_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first_row = F.lag(ts_col).over(w).isNull()
    runs = df.withColumn("__chg", first_row | changed).where("__chg").drop("__chg")
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    out = runs.select(
        *key_cols,
        *state_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())
