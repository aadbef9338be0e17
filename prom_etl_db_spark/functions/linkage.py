"""Record linkage: blocking + Jaro-Winkler fuzzy matching.

Reference scope: §2.E extension — entity resolution (dedup of names /
titles / near-identical metadata) is a standard corpus-curation step
the exact and shingle dedups don't cover: JW rewards shared prefixes
and tolerates transpositions, the classic surname-typo model (Winkler
1990, census record linkage).

``jaro_winkler`` is implemented FROM THE SPEC (match window
max(|a|,|b|)/2−1, half-transposition count, p=0.1 prefix boost up to 4
chars, 0.7 boost threshold) and verified bit-for-bit against DuckDB's
independent native implementation on fuzz pairs — the NFC-style
two-implementation interop. One documented convention: both-empty
compares 0.0 (DuckDB's convention; some references define 1.0).

UNIT DIVERGENCE (r6 adversarial review): this implementation compares
CODEPOINTS; DuckDB's compares UTF-8 BYTES, so the two agree exactly on
ASCII (the fuzz domain and the gate fixture) and diverge on multibyte
text, where byte-level JW double-counts every non-ASCII character and
lets a match window span half a character. Codepoint semantics is the
defensible one for names; the equivalence-under-codepoint-bijection
property test pins it without needing a second Unicode implementation.

Scale posture: the all-pairs explosion is contained by BLOCKING — the
self-join key is the block, so the shuffle carries (block, name) rows
and each block's pair set is generated co-located; per-pair scoring is
an Arrow-batched pandas UDF; the output is a per-block aggregate whose
float content is a QUANTIZED-INTEGER sum (round(jw·1e6) summed as
int64 — order-free exact, the repo's term-quantization pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaro_winkler(s1: str, s2: str, p: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity per Winkler (1990)."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(max(len(s1), len(s2)) // 2 - 1, 0)
    m1 = [False] * len(s1)
    m2 = [False] * len(s2)
    m = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(len(s2), i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len(s1)):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / len(s1) + m / len(s2) + (m - t) / m) / 3
    if j > boost_threshold:
        ell = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            ell += 1
        j += ell * p * (1 - j)
    return j


def blocked_jw_stats(
    names: DataFrame,
    *,
    id_col: str = "doc_id",
    name_col: str = "name",
    block_col: str = "block",
    match_threshold: float = 0.9,
) -> DataFrame:
    """Per-block linkage statistics over every within-block pair
    (id_a < id_b): pairs scored, matches at the threshold, and the
    exact quantized similarity mass sum(round(jw·1e6)) as int64."""
    import pandas as pd
    from pyspark.sql.types import LongType

    _q = F.pandas_udf(
        lambda a, b: pd.Series(
            [int(round(jaro_winkler(x, y) * 1_000_000)) for x, y in zip(a, b)],
            dtype="int64",
        ),
        returnType=LongType(),
    )
    a = names.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    b = names.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    pairs = a.join(b, "block").where(F.col("id_a") < F.col("id_b"))
    scored = pairs.withColumn("jw_q6", _q(F.col("name_a"), F.col("name_b")))
    thresh_q = int(match_threshold * 1_000_000)
    return scored.groupBy("block").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("jw_q6") >= thresh_q).cast("long")).alias("n_matches"),
        F.sum("jw_q6").alias("jw_mass_q6"),
        F.max("jw_q6").alias("jw_max_q6"),
    )
