"""Deterministic, oracle-checkable cardinality sketches.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is the
production scale path (see the ``cardinality_sketches`` registry query),
but its register internals are engine-specific, so the gate could only
row-count it. This module implements a *classic* HyperLogLog (Flajolet et
al. 2007) over an md5-derived hash so every intermediate — register
index, rank, harmonic sum, even the bias-corrected estimate — is
recomputable in ANSI SQL and hash-matches a DuckDB dual bit for bit:

- hash: first 8 hex chars of ``md5(key)`` → uniform 32-bit integer
  (same on any engine with md5 + hex-cast).
- registers: top ``p`` bits index 2^p registers; the register keeps the
  max rank = (leading zeros of the remaining ``32-p`` bits) + 1. Rank is
  computed from ``length(bin(w))`` — pure integer/string ops, no
  float log2 whose last-ULP could differ across libm builds.
- harmonic sum: every term ``2^-rank`` and every partial sum is an exact
  dyadic rational that fits a double's 53-bit mantissa (ranks ≤ 21,
  counts ≤ 2^p ⇒ ≤ 33 fractional + ~12 integer bits), so the fold is
  EXACT regardless of accumulation order — the one FP pitfall an
  unordered distributed sum would otherwise have.
- small-range correction: ``m·ln(m/V)`` when the raw estimate ≤ 2.5·m
  and zero registers exist — libm ``ln`` may differ by ULPs across
  engines, so the estimate column is rounded (the integer register
  outputs are exact).

Scale: one narrow projection (md5/shift/mask per row), one
(group, register) hash aggregation with map-side combine — 2^p rows per
group in the shuffle, never the raw keys — then a per-group fold. The
register aggregate is MERGEABLE: unioning corpora = max per register,
exactly how HLL shards across 1000 executors.

Reference parity: the reference's MySQL layer has no sketching surface
at all (SURVEY §2 C family is exact-only); this is the scale extension
for A33-style discovery when per-group exact state stops fitting.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _alpha(m: int) -> float:
    """Bias constant; spelled identically in the SQL duals."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_col: str,
    key_col: str,
    *,
    p: int = 12,
) -> DataFrame:
    """Per-(group, register) max ranks: (group, idx, r).

    The mergeable state: max(r) per (group, idx) across any partitioning
    or shard union equals the single-pass value.
    """
    bits = 32 - p
    mask = (1 << bits) - 1
    h32 = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    idx = F.shiftright(h32, bits)
    w = h32.bitwiseAND(F.lit(mask))
    # rank = leading zeros of w within `bits` bits, + 1 = bits+1 - bit_length;
    # bit_length via the binary-string length (bin() drops leading zeros).
    rank = (
        F.when(w == 0, F.lit(bits + 1))
        .otherwise(F.lit(bits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(F.col(group_col).alias("g"), idx.alias("idx"), rank.alias("rank"))
        .groupBy("g", "idx")
        .agg(F.max("rank").alias("r"))
    )


def hll_cardinality(
    df: DataFrame,
    group_col: str,
    key_col: str,
    *,
    p: int = 12,
) -> DataFrame:
    """Per-group HLL estimate with exact integer side-channels.

    Output: (group_col, zero_registers, sum_rank, hll_estimate) —
    ``zero_registers``/``sum_rank`` fingerprint the register array
    exactly; ``hll_estimate`` is the classic estimator with small-range
    correction, rounded to 4 dp (see module docstring for why that is
    the only non-exact column).
    """
    m = 1 << p
    reg = hll_registers(df, group_col, key_col, p=p)
    agg = reg.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_filled"),
        F.sum("r").cast("bigint").alias("sum_rank"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s_filled"),
    )
    zero = (F.lit(m) - F.col("n_filled")).cast("bigint")
    s = F.col("s_filled") + zero.cast("double")
    raw = F.lit(_alpha(m) * m * m) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.col("g").alias(group_col),
        zero.alias("zero_registers"),
        "sum_rank",
        F.round(est, 4).alias("hll_estimate"),
    )


def hll_oracle_sql(
    table: str,
    group_col: str,
    key_col: str,
    *,
    p: int = 12,
) -> str:
    """The DuckDB dual of :func:`hll_cardinality` — same hash, same
    integer rank algebra, same estimator spelling."""
    bits = 32 - p
    mask = (1 << bits) - 1
    m = 1 << p
    alpha_m2 = f"(0.7213/(1.0 + 1.079/{m}.0))*{m}.0*{m}.0"
    return f"""
WITH h AS (
  SELECT {group_col} AS g,
         CAST(('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
  FROM {table}
), reg AS (
  SELECT g, h32 >> {bits} AS idx,
         max(CASE WHEN (h32 & {mask}) = 0 THEN {bits + 1}
                  ELSE {bits + 1} - length(bin(h32 & {mask})) END) AS r
  FROM h GROUP BY g, h32 >> {bits}
), agg AS (
  SELECT g, count(*) AS n_filled,
         CAST(sum(r) AS BIGINT) AS sum_rank,
         sum(pow(2.0, -r)) AS s_filled
  FROM reg GROUP BY g
)
SELECT g AS {group_col},
       CAST({m} - n_filled AS BIGINT) AS zero_registers,
       sum_rank,
       round(CASE WHEN {alpha_m2}/(s_filled + ({m} - n_filled)*1.0) <= 2.5*{m}.0
                   AND {m} - n_filled > 0
              THEN {m}.0 * ln({m}.0 / ({m} - n_filled))
              ELSE {alpha_m2}/(s_filled + ({m} - n_filled)*1.0) END, 4) AS hll_estimate
FROM agg
"""


def hll_error_bound(p: int = 12) -> float:
    """Theoretical relative standard error 1.04/√m — the unit tests
    assert the estimate lands within ~3σ of the exact count."""
    return 1.04 / math.sqrt(1 << p)


# -- deterministic quantile sketch ------------------------------------------


def quantile_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    q: float = 0.9,
    bins: int = 128,
    lo: float = 0.0,
    hi: float = 1000.0,
) -> DataFrame:
    """Equi-width-histogram quantile — the deterministic, oracle-checkable
    twin of ``percentile_approx`` (GK sketch, engine-specific internals).

    State per group is a FIXED ``bins``-bucket count vector over the
    declared [lo, hi) domain (values clamped to the edge buckets), which
    is mergeable by plain addition — the same map-side-combine /
    shard-union story as the HLL registers. The quantile is read off the
    cumulative counts with linear interpolation inside the hit bucket:

        rank  = ceil(q·n);  bucket b = first with cum(b) ≥ rank
        est   = left(b) + width · (rank − cum(b−1)) / count(b)

    Everything through ``rank`` is integer-exact on both engines; the
    interpolation is a handful of IEEE ops spelled identically in the
    SQL dual, so the estimate hash-matches at full double precision
    (rounded to 6 dp for belt and braces).

    Error bound: the estimate lands within one bucket width of the true
    quantile — (hi−lo)/bins — tightest where the data is dense; the unit
    tests assert exactly that bound.
    """
    width = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )
    counts = (
        # NULLs are EXCLUDED, like percentile_approx (whose twin this
        # is). Without the filter they'd silently land in bucket 0:
        # floor(NULL) is NULL but greatest() skips NULLs, so NULL → 0 —
        # inflating n and dragging the estimate toward lo.
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), b.alias("b"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window
    cum = counts.withColumn(
        "cum", F.sum("c").over(w.partitionBy("g").orderBy("b"))
    ).withColumn("n", F.sum("c").over(w.partitionBy("g")))
    rank = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
    hit = cum.where(F.col("cum") >= rank).withColumn(
        "rn",
        F.row_number().over(w.partitionBy("g").orderBy("b")),
    ).where(F.col("rn") == 1)
    est = (
        F.lit(lo)
        + F.col("b").cast("double") * F.lit(width)
        + F.lit(width)
        * (rank - (F.col("cum") - F.col("c"))).cast("double")
        / F.col("c").cast("double")
    )
    return hit.select(
        F.col("g").alias(group_col),
        F.col("n").cast("bigint").alias("n_values"),
        F.round(est, 6).alias("q_estimate"),
    )


def quantile_histogram_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    *,
    q: float = 0.9,
    bins: int = 128,
    lo: float = 0.0,
    hi: float = 1000.0,
) -> str:
    """DuckDB dual of :func:`quantile_histogram` — identical bucket map,
    cumulative ranks, and interpolation spelling."""
    width = (hi - lo) / bins
    return f"""
WITH bucketed AS (
  SELECT {group_col} AS g,
         least({bins - 1}, greatest(0,
             CAST(floor(({value_col} - {lo!r}) / {width!r}) AS INT))) AS b
  FROM {table}
  WHERE {value_col} IS NOT NULL
), counts AS (
  SELECT g, b, count(*) AS c FROM bucketed GROUP BY g, b
), cums AS (
  SELECT g, b, c,
         sum(c) OVER (PARTITION BY g ORDER BY b) AS cum,
         sum(c) OVER (PARTITION BY g) AS n
  FROM counts
), hit AS (
  SELECT g, b, c, cum, n,
         row_number() OVER (PARTITION BY g ORDER BY b) AS rn
  FROM cums
  WHERE cum >= ceil({q!r} * n)
)
SELECT g AS {group_col},
       CAST(n AS BIGINT) AS n_values,
       round({lo!r} + CAST(b AS DOUBLE) * {width!r}
             + {width!r} * CAST(ceil({q!r} * n) - (cum - c) AS DOUBLE)
               / CAST(c AS DOUBLE), 6) AS q_estimate
FROM hit WHERE rn = 1
"""


# -- count-min sketch (heavy hitters) ---------------------------------------


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    probes: DataFrame,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch frequency estimates for the ``probes`` keys.

    State = ``depth`` rows × ``width`` counters; occurrence of key k
    increments cell (i, md5("cm-i-"||k) % width) for every row i;
    estimate(k) = min over rows — the classic one-sided estimator
    (never under, over by ≤ ε·N with prob 1−δ, ε = e/width,
    δ = e^−depth). Counters merge by ADDITION (map-side combine /
    shard-union), like the quantile histogram's buckets.

    Everything is integer arithmetic over md5 — the DuckDB dual replays
    cells and minima exactly. The probe side is a broadcast-class key
    list (top-N candidates); the sketch build is one hash aggregation
    over (row, cell) pairs — depth rows per input row in the shuffle,
    never the keys themselves.

    Output: (key_col, cm_estimate BIGINT).
    """
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    cell = lambda i, k: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cm-"), i.cast("string"), F.lit("-"), k)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    # NULL keys hash via a sentinel on BOTH sides: md5(concat(..NULL..))
    # is NULL, so without it NULL-keyed rows would aggregate under cell
    # NULL that no probe equi-join ever matches — estimating 0 for a key
    # with real occurrences, breaking the one-sided never-under
    # guarantee. (A genuine "__null__" string key merging with NULLs
    # only OVERestimates, which the guarantee allows.)
    k = F.coalesce(F.col(key_col).cast("string"), F.lit("__null__"))
    cells = (
        df.select(F.explode(rows).alias("i"), k.alias("k"))
        .select("i", cell(F.col("i"), F.col("k")).alias("cell"))
        .groupBy("i", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probe_cells = probes.select(
        F.col(key_col), F.explode(rows).alias("i")
    ).withColumn(
        "cell",
        cell(
            F.col("i"),
            F.coalesce(F.col(key_col).cast("string"), F.lit("__null__")),
        ),
    )
    return (
        probe_cells.join(cells, ["i", "cell"], "left")
        .fillna(0, ["c"])
        .groupBy(key_col)
        .agg(F.min("c").cast("bigint").alias("cm_estimate"))
    )


def countmin_oracle_sql(
    table: str,
    key_col: str,
    probe_sql: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB dual of :func:`countmin_estimates`; ``probe_sql`` must
    yield one ``{key_col}`` column."""
    return f"""
WITH cells AS (
  SELECT i.range AS i,
         CAST(('0x' || substr(md5('cm-' || CAST(i.range AS VARCHAR) || '-'
                              || coalesce(CAST({key_col} AS VARCHAR), '__null__')), 1, 8)) AS BIGINT)
           % {width} AS cell,
         count(*) AS c
  FROM {table} CROSS JOIN range({depth}) i
  GROUP BY 1, 2
), probes AS ({probe_sql}),
probe_cells AS (
  SELECT p.{key_col}, i.range AS i,
         CAST(('0x' || substr(md5('cm-' || CAST(i.range AS VARCHAR) || '-'
                              || coalesce(CAST(p.{key_col} AS VARCHAR), '__null__')), 1, 8)) AS BIGINT)
           % {width} AS cell
  FROM probes p CROSS JOIN range({depth}) i
)
SELECT pc.{key_col},
       CAST(min(coalesce(cells.c, 0)) AS BIGINT) AS cm_estimate
FROM probe_cells pc
LEFT JOIN cells ON cells.i = pc.i AND cells.cell = pc.cell
GROUP BY pc.{key_col}
"""


# -- Bloom filter membership ------------------------------------------------


def bloom_membership(
    members: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    n_bits: int = 16384,
    n_hashes: int = 5,
) -> DataFrame:
    """Bloom-filter membership of each probe key against the members set.

    The filter is the DISTINCT set of bit positions
    md5("bloom-i-"||k) % n_bits over members × i<n_hashes — built with
    one hash aggregation; a probe is "maybe" iff ALL its positions are
    set (count of position-join hits == n_hashes). One-sided like the
    textbook structure: no false negatives ever; false positives at the
    deterministic md5 positions, so even the FP SET is engine-exact and
    the oracle hash-matches it. The standard FP rate
    (1−e^{−kn/m})^k applies (~0.6 % at the defaults for n=1500).

    At scale the positions set is ≤ n_bits rows (broadcast-class by
    construction — size the filter, not the data); the probe side ships
    (key, position) pairs only.

    Output: (key_col, in_bloom BOOLEAN).
    """
    rows = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    pos = lambda i, k: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bloom-"), i.cast("string"), F.lit("-"), k)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % n_bits
    )
    set_bits = (
        members.select(F.explode(rows).alias("i"), F.col(key_col).cast("string").alias("k"))
        .select(pos(F.col("i"), F.col("k")).alias("pos"))
        .distinct()
    )
    # membership is a per-DISTINCT-key question: a duplicated probe key
    # would double the hit count and fail the exact == n_hashes test —
    # a false NEGATIVE, violating the Bloom contract
    probe_pos = (
        probes.select(key_col)
        .distinct()
        .select(F.col(key_col), F.explode(rows).alias("i"))
        .withColumn("pos", pos(F.col("i"), F.col(key_col).cast("string")))
    )
    return (
        probe_pos.join(F.broadcast(set_bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0))) == n_hashes).alias("in_bloom"))
    )


def bloom_oracle_sql(
    member_sql: str,
    probe_sql: str,
    key_col: str,
    *,
    n_bits: int = 16384,
    n_hashes: int = 5,
) -> str:
    """DuckDB dual of :func:`bloom_membership`; both SQL args must yield
    one ``{key_col}`` column."""
    return f"""
WITH members AS ({member_sql}),
probes AS (SELECT DISTINCT {key_col} FROM ({probe_sql})),
set_bits AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5('bloom-' || CAST(i.range AS VARCHAR) || '-'
                              || CAST(m.{key_col} AS VARCHAR)), 1, 8)) AS BIGINT)
           % {n_bits} AS pos
  FROM members m CROSS JOIN range({n_hashes}) i
), probe_pos AS (
  SELECT p.{key_col},
         CAST(('0x' || substr(md5('bloom-' || CAST(i.range AS VARCHAR) || '-'
                              || CAST(p.{key_col} AS VARCHAR)), 1, 8)) AS BIGINT)
           % {n_bits} AS pos
  FROM probes p CROSS JOIN range({n_hashes}) i
)
SELECT pp.{key_col},
       count(sb.pos) = {n_hashes} AS in_bloom
FROM probe_pos pp
LEFT JOIN set_bits sb ON sb.pos = pp.pos
GROUP BY pp.{key_col}
"""
