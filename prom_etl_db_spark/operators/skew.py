"""Skew-mitigation joins: explicit salting and hot/cold splitting.

AQE's skew-join (on in ``session.get_spark``) re-splits oversized shuffle
partitions at runtime, but it only helps sort-merge joins AFTER a shuffle
has materialized, and it cannot help when the skew is *algorithmic* — a
low-cardinality join key (the fixture's 5-value ``event_type``; at 100 TB
think status codes, country codes, null-heavy foreign keys) hashes to at
most ``n_distinct`` reducers no matter how many executors exist. The two
published techniques for that case, value-identical to the plain join:

- **salted join** (`salted_join`): append a deterministic salt in
  ``[0, salts)`` to the big side's key, replicate the small-but-not-
  broadcastable side once per salt value, join on ``(key, salt)``. The
  key space grows ×salts, so a key that filled one reducer now spreads
  over ``salts`` of them. Cost: the right side is materialized ``salts``
  times — which is why the right side should be the dimension/aggregate
  side, never a second fact.
- **hot/cold split** (`split_skew_join`): route only the measured-hot
  keys through a broadcast of the right side's (small) hot subset and
  everything else through the normal shuffle join, then union. Zero
  replication of the cold path, and the hot path does no shuffle at all.
  This is what AQE cannot do when the right side's hot slice is
  broadcastable but the whole right side is not.

The reference has no joins at all (SURVEY.md §2.C note); these extend the
engine's custom-join family (``operators/joins.py``) with the shapes a
1000-executor shuffle actually needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "split_skew_join", "top_skewed_keys"]

_SALT = "__skew_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    salts: int = 16,
    salt_src: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (big, skewed) with ``right`` (small-ish, NOT
    broadcastable) on the named key columns, spreading each key over
    ``salts`` shuffle sub-keys.

    The salt is **deterministic** — ``xxhash64`` of ``salt_src`` (default:
    every left column) mod ``salts`` — never ``rand()``: a nondeterministic
    salt re-rolls on task retry, and a retried map task would route the
    same row to a different reducer than its first attempt, corrupting the
    join under speculative execution. Pass the left side's unique id as
    ``salt_src`` for a provably even spread; the all-columns default is
    safe (duplicate rows share a salt, which only costs balance).

    ``how`` supports ``inner`` and ``left`` — the two shapes where
    replicating the right side preserves semantics row-for-row. (A right
    or full join would need the UNMATCHED right rows exactly once, but
    every right row exists ``salts`` times here; use ``split_skew_join``
    or swap the sides instead.)
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: a "
            "right/full join would emit each unmatched right row once per "
            "salt replica"
        )
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    on = list(on)
    src = [F.col(c) for c in (salt_src or left.columns)]
    salted_left = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*src), F.lit(salts)).cast("int")
    )
    replicated_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return salted_left.join(replicated_right, on=on + [_SALT], how=how).drop(_SALT)


def top_skewed_keys(
    df: DataFrame, on: Sequence[str], *, k: int = 16, min_share: float = 0.01
) -> list[tuple]:
    """Measure the ``k`` heaviest join-key values carrying at least
    ``min_share`` of the rows — the hot set for ``split_skew_join``.

    One hash aggregate over the key columns (map-side combined, shuffle
    carries one row per distinct key) and a ``k``-row collect; the
    returned tuples are driver-side constants, bounded by ``k``. At
    100 TB this is the same-shaped pre-pass AQE's skew statistics do,
    but reusable across runs (persist the hot set and skip the scan)."""
    counted = df.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
    total_rows = counted.agg(F.sum("__n").alias("t"))
    rows = (
        counted.crossJoin(F.broadcast(total_rows))
        .where(F.col("__n") >= F.col("t") * F.lit(min_share))
        .orderBy(F.desc("__n"), *[F.asc(c) for c in on])
        .limit(k)
        .select(*on)
        .collect()
    )
    return [tuple(r) for r in rows]


def split_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    hot_keys: Sequence[tuple] | None = None,
    k: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot/cold split join: the measured-hot keys take a broadcast of the
    right side's hot slice (no shuffle at all for the heavy rows), the
    cold remainder takes the ordinary shuffle join, and the two unioned
    halves are value-identical to ``left.join(right, on, how)``.

    ``hot_keys`` defaults to ``top_skewed_keys(left, on)`` — pass a
    precomputed list to skip the measuring scan. Supports ``inner`` and
    ``left`` (each left row lands in exactly one half, so both compose).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"split_skew_join supports how='inner'|'left', got {how!r}")
    on = list(on)
    if hot_keys is None:
        hot_keys = top_skewed_keys(left, on, k=k)
    if not hot_keys:
        return left.join(right, on=on, how=how)
    key_struct = F.struct(*[F.col(c) for c in on])
    hot_lits = F.array(
        *[F.struct(*[F.lit(v).alias(c) for c, v in zip(on, key)]) for key in hot_keys]
    )
    # NULL-safe: array_contains yields NULL for a NULL key; such rows must
    # take the COLD path (an equi-join never matches them, and a left join
    # must still keep them), so both predicates coalesce NULL -> not-hot.
    is_hot = F.coalesce(F.array_contains(hot_lits, key_struct), F.lit(False))
    hot_half = left.where(is_hot).join(
        F.broadcast(right.where(is_hot)), on=on, how=how
    )
    cold_half = left.where(~is_hot).join(right.where(~is_hot), on=on, how=how)
    return hot_half.unionByName(cold_half)
