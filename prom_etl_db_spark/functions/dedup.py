"""Deduplication operators for training-data pipelines (SURVEY.md §2.E E1/E2).

All four strategies are shuffle-architected for 100 TB:

- exact:        one hash-partitioned groupBy on the dedup key — no sort.
- minhash-LSH:  shingle → k min-hashes → b band-keys → groupBy band key →
                candidate pairs only WITHIN buckets → exact-Jaccard verify.
                Never a crossJoin; candidate generation is linear + one
                shuffle per band set.
- simhash:      64-bit signature via Arrow-batched pandas UDF, then
                bucket-join on rotated prefixes (here: signature bands).
- n-gram Jaccard: explode shingles → self-equi-join on shingle → pair
                aggregation. The join key is the shingle, so co-occurrence
                is computed by the shuffle — no pairwise loop.

Hash functions are engine-built-ins (crc32/xxhash64) evaluated JVM-side —
the Python layer only composes Columns.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "word_shingles",
    "minhash_signature",
    "minhash_lsh_dup_pairs",
    "minhash_dedup",
    "simhash_signature",
    "ngram_jaccard_dup_pairs",
]


# -- E1: exact dedup --------------------------------------------------------


def exact_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Exact dedup keeping the row with MIN(order_col) per key group —
    deterministic, unlike ``dropDuplicates`` whose survivor is arbitrary
    under parallelism. One hash aggregation when ``order_col`` selection is
    via ``min_by``; no window sort needed."""
    others = [c for c in df.columns if c not in keys and c != order_col]
    return df.groupBy(*keys).agg(
        F.min(order_col).alias(order_col),
        *[F.min_by(c, order_col).alias(c) for c in others],
    )


# -- shingling --------------------------------------------------------------


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a lowercased, whitespace-normalized text.
    Pure Column expression (JVM-side): split → sliding join via transform
    over an index sequence."""
    words = F.split(F.trim(F.lower(text)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(words) - F.lit(n))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    # guard: sequence(0, negative) would count DOWN in Spark — short texts
    # must yield an empty shingle set, not garbage
    return F.when(F.size(words) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


# -- E2a: MinHash + LSH -----------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """k min-hash values per row: h_i(S) = min over shingles of
    crc32(i || shingle). crc32 is JVM-built-in and stable across engines;
    the i-prefix gives k independent-enough hash families."""
    sigs = [
        F.array_min(
            F.transform(shingles, lambda s, i=i: F.crc32(F.concat(F.lit(f"{i}_"), s)))
        )
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verification.

    shingle → signature (linear) → explode b band keys → self-join on
    (band, band_hash) — candidates only share a bucket → verify true
    Jaccard on shingle sets. Output: (id_a, id_b, jaccard) with id_a<id_b.

    At 100 TB the only shuffles are the band-key join and final distinct;
    bucket sizes are bounded by banding probability, and AQE splits skewed
    buckets (boilerplate-heavy corpora).
    """
    rows = num_hashes // bands
    base = docs.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("shingles"),
    ).where(F.size("shingles") > 0)
    sig = base.withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))

    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * rows + 1, rows),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "id", "shingles", F.explode(band_entries).alias("bk")
    ).select("id", "shingles", F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash"))

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.shingles").alias("sh_a"),
            F.col("r.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", **kw
) -> DataFrame:
    """Drop near-duplicates: connected-by-pair docs keep the smallest id.
    (Single-link within direct pairs; full transitive closure is an
    iterative connected-components job — out of scope for one pass.)"""
    pairs = minhash_lsh_dup_pairs(docs, id_col, text_col, **kw)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


# -- E2b: SimHash -----------------------------------------------------------


def simhash_signature(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document via an Arrow-batched pandas UDF
    (vectorized numpy inner loop — the per-token bit-vote accumulation has
    no efficient Column encoding, the sanctioned slow-path per the brief).
    Deterministic: token hash = md5 truncated to 64 bits."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            votes = np.zeros(64, dtype=np.int64)
            for tok in (t or "").lower().split():
                h = np.uint64(
                    int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes += np.where(bits == np.uint64(1), 1, -1)
            sig = np.uint64(0)
            for j in range(64):
                if votes[j] > 0:
                    sig |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return docs.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash"))


# -- E2c: n-gram Jaccard via shingle equi-join ------------------------------


def ngram_jaccard_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold, computed by exploding
    shingles and equi-joining on the shingle — co-occurrence counting rides
    the shuffle, so cost is Σ|bucket|² over shared shingles, not |docs|².
    Output: (id_a, id_b, jaccard)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("shingles"),
    ).where(F.size("shingles") > 0)
    sizes = sh.select("id", F.size("shingles").alias("n_sh"))
    tokens = sh.select("id", F.explode("shingles").alias("shingle"))

    a = tokens.alias("a")
    b = tokens.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
