"""Data-quality expectations and distribution-drift checks.

The operational layer a production ingest pipeline runs BETWEEN source
and sink (reference parity: the reference trusts Prometheus blindly —
`internal/collector/collector.go` inserts whatever comes back; SURVEY §2
A12's quarantine is this engine's malformed-row half, and this module is
the semantic half a 100 TB training-data pipeline adds on top).

- :func:`expectations` — declarative per-rule violation counting in ONE
  narrow aggregation pass (no shuffle until the 1-row-per-rule result),
  plus optional uniqueness checks (one hash agg per key set).
- :func:`psi_drift` — population-stability-index drift between two
  slices of the same table over fixed equi-width bins; the standard
  "did the distribution move" gate for model/data monitoring. Fixed
  bins + explicit ε-free smoothing keep it deterministic and
  SQL-replayable (the registry oracle hash-matches it).

Both are pure Column algebra — codegen'd, partial-aggregated, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations(
    df: DataFrame,
    rules: Sequence[tuple[str, Column]],
    *,
    unique_keys: Sequence[tuple[str, Sequence[str]]] = (),
) -> DataFrame:
    """Count violations per declarative rule.

    ``rules``: (name, violation_predicate) — the predicate is TRUE for a
    BAD row. All rules evaluate in one pass over the data (a single
    aggregate with one conditional sum per rule — adding a rule adds a
    column to the agg buffer, not a pass). ``unique_keys``: (name, cols)
    pairs checked as count(*) − count(distinct cols...) via one hash
    aggregation each.

    Output: (check, n_violations, n_total, pass) — one row per rule,
    deterministic order-insensitive.
    """
    if not rules and not unique_keys:
        # fail with the cause, not an IndexError at selects[0] — an
        # empty rule set usually means a misread config table
        raise ValueError("expectations() needs at least one rule or unique key")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(f"v_{name}")
        )
    base = df.agg(*aggs)
    selects = [
        base.select(
            F.lit(name).alias("check"),
            F.col(f"v_{name}").alias("n_violations"),
            F.col("__n").alias("n_total"),
            (F.col(f"v_{name}") == 0).alias("pass"),
        )
        for name, _ in rules
    ]
    for name, cols in unique_keys:
        # count_distinct over the bare columns SKIPS rows with a NULL key,
        # so every NULL-keyed row would read as a duplicate violation —
        # wrap in a struct (never NULL itself) so NULL participates as a
        # key value: {1, 2, NULL} is three distinct keys, zero violations
        dup = df.agg(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(c) for c in cols]))
            )
            .cast("bigint")
            .alias("n_violations"),
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
        )
        selects.append(
            dup.select(
                F.lit(name).alias("check"),
                "n_violations",
                "n_total",
                (F.col("n_violations") == 0).alias("pass"),
            )
        )
    out = selects[0]
    for s in selects[1:]:
        out = out.unionByName(s)
    return out


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split_pred: Column,
    *,
    bins: int = 20,
    lo: float = 0.0,
    hi: float = 500.0,
) -> DataFrame:
    """Population stability index per group between the rows where
    ``split_pred`` is true (reference slice) and false (comparison).

    PSI = Σ_b (p_b − q_b)·ln(p_b / q_b) over fixed equi-width bins
    (values clamped to edge bins), with add-half smoothing
    p_b = (c_b + 0.5) / (n + 0.5·bins) so one-sided-empty bins stay
    finite. CONVENTION: the sum runs over OCCUPIED bins only — a bin
    empty on BOTH sides contributes 0, not its smoothed residual (which
    is nonzero whenever n_ref ≠ n_cmp). This is deliberate and shared by
    all three implementations (this one, the SQL dual, and the streaming
    fold — which documents the same skip), so the number is
    engine-identical; it also means PSI is exactly 0 for identical
    count vectors regardless of bin-domain under-fill. Deterministic
    (integer counts; the ln/products are IEEE ops spelled the same in
    the SQL dual; output rounded 6 dp).

    Rule of thumb the tests pin: same distribution → PSI ≈ 0 (< 0.1);
    a real shift → PSI > 0.25. One narrow projection + one
    (group, bin, side) hash agg; the per-group fold is ≤ ``bins`` rows.
    """
    width = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )
    counts = (
        # NULL values are EXCLUDED (they are "missing", not "at lo"):
        # greatest() skips NULLs, so without the filter every NULL row
        # would silently count as bin-0 mass and a missing-data
        # regression would read as "values collapsed to ~lo". The
        # streaming fold (stateful.make_psi_fold) skips them the same
        # way, which is what keeps stream/batch parity.
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            b.alias("b"),
            F.when(split_pred, F.lit(0)).otherwise(F.lit(1)).alias("side"),
        )
        .groupBy("g", "b")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c_ref"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c_cmp"),
        )
    )
    totals = counts.groupBy("g").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cmp").alias("n_cmp")
    )
    sm = 0.5
    joined = counts.join(totals, "g")
    p = (F.col("c_ref") + F.lit(sm)) / (F.col("n_ref") + F.lit(sm * bins))
    q = (F.col("c_cmp") + F.lit(sm)) / (F.col("n_cmp") + F.lit(sm * bins))
    term = (p - q) * F.log(p / q)
    return (
        joined.withColumn("term", term)
        .groupBy(F.col("g").alias(group_col))
        .agg(F.round(F.sum("term"), 6).alias("psi"))
    )


def psi_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    split_pred_sql: str,
    *,
    bins: int = 20,
    lo: float = 0.0,
    hi: float = 500.0,
) -> str:
    """DuckDB dual of :func:`psi_drift` — identical bin map, smoothing,
    and term spelling.

    CAVEAT (canon-safety checklist): the Σ term runs over ≤ ``bins``
    non-dyadic doubles, so accumulation order could in principle shift
    the last ULP; 6-dp rounding absorbs it (same argument as the HLL
    estimate's ln)."""
    width = (hi - lo) / bins
    sm = 0.5
    return f"""
WITH bucketed AS (
  SELECT {group_col} AS g,
         least({bins - 1}, greatest(0,
             CAST(floor(({value_col} - {lo!r}) / {width!r}) AS INT))) AS b,
         CASE WHEN {split_pred_sql} THEN 0 ELSE 1 END AS side
  FROM {table}
  WHERE {value_col} IS NOT NULL
), counts AS (
  SELECT g, b,
         sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c_ref,
         sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c_cmp
  FROM bucketed GROUP BY g, b
), totals AS (
  SELECT g, sum(c_ref) AS n_ref, sum(c_cmp) AS n_cmp FROM counts GROUP BY g
)
SELECT c.g AS {group_col},
       round(sum(((c.c_ref + {sm!r}) / (t.n_ref + {sm * bins!r})
                  - (c.c_cmp + {sm!r}) / (t.n_cmp + {sm * bins!r}))
                 * ln(((c.c_ref + {sm!r}) / (t.n_ref + {sm * bins!r}))
                      / ((c.c_cmp + {sm!r}) / (t.n_cmp + {sm * bins!r})))), 6) AS psi
FROM counts c JOIN totals t ON t.g = c.g
GROUP BY c.g
"""
