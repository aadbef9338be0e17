"""Deduplication operators for training-data pipelines (SURVEY.md §2.E E1/E2).

All four strategies are shuffle-architected for 100 TB:

- exact:        one hash-partitioned groupBy on the dedup key — no sort.
- minhash-LSH:  shingle → one xxhash64 per shingle → k min-hashes via
                affine transforms of that base hash (cheap JVM arithmetic,
                not k string hashes) → b band-keys → groupBy band key →
                candidate pairs only WITHIN buckets → exact-Jaccard verify.
                Never a crossJoin; the band join carries only (id, band,
                hash) — shingle sets are re-joined by id afterwards so the
                wide arrays never ride the candidate shuffle.
- simhash:      64-bit signature via Arrow-batched pandas UDF.
- n-gram Jaccard: explode hashed shingles → self-equi-join on the 8-byte
                hash → pair aggregation. Co-occurrence is computed by the
                shuffle — no pairwise loop, and the shuffle rows are
                (id, int64), not strings.

Shingle identity is an xxhash64 — at any realistic corpus size the
collision contribution to a Jaccard estimate is ≪ the thresholds used.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.scratch import materialize, scratch
from prom_etl_db_spark.parallel import balance

__all__ = [
    "exact_dedup",
    "word_ngrams",
    "word_shingles",
    "hashed_shingles",
    "minhash_signature",
    "minhash_lsh_dup_pairs",
    "minhash_dedup",
    "simhash_signature",
    "ngram_jaccard_dup_pairs",
    "connected_components",
    "keep_canonical",
    "edit_verified_dup_pairs",
]

_MERSENNE31 = 2_147_483_647  # 2^31 - 1; a*h+b stays < 2^62 — exact in int64


def _affine_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k hash families (Knuth-style
    multiplicative constants; a must be non-zero mod p)."""
    params = []
    for i in range(num_hashes):
        a = (2_654_435_761 * (i + 1) + 104_729) % _MERSENNE31 or 1
        b = (40_503 * (i + 1) * (i + 1) + 7_919) % _MERSENNE31
        params.append((a, b))
    return params


# -- E1: exact dedup --------------------------------------------------------


def exact_dedup(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    *,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Exact dedup keeping the row with MIN(order_col) per key group —
    deterministic when ``order_col`` (plus ``tiebreakers``) totally
    orders the rows within a key, unlike ``dropDuplicates`` whose
    survivor is arbitrary under parallelism. One hash aggregation; no
    window sort.

    The survivor's payload is ONE ``min_by`` over a single row struct —
    per-column ``min_by`` calls would each pick independently among
    order ties and could stitch a frankenrow from different tied rows.
    If ``order_col`` can repeat within a key, pass ``tiebreakers``
    (e.g. a unique id) to pin WHICH tied row survives; without them a
    tie's survivor is a consistent whole row but not reproducible
    across runs (Spark's min_by tie rule is unspecified)."""
    others = [c for c in df.columns if c not in keys and c != order_col]
    if not others:
        return df.groupBy(*keys).agg(F.min(order_col).alias(order_col))
    ordering = F.struct(order_col, *(tiebreakers or []))
    out = df.groupBy(*keys).agg(
        F.min(order_col).alias(order_col),
        F.min_by(F.struct(*others), ordering).alias("__row"),
    )
    return out.select(*keys, order_col, *[F.col(f"__row.{c}").alias(c) for c in others])


# -- shingling --------------------------------------------------------------


def word_ngrams(text: Column, n: int = 3) -> Column:
    """ALL word n-grams (in order, duplicates kept) of a lowercased,
    whitespace-normalized text — the multiset the repetition signals need.

    Pure Column expression built as a zip_with chain: gram i = words[i..i+n)
    joined — O(words·n) instead of the O(words²) slice-in-transform
    formulation, which measurably dominates at corpus scale."""
    words = F.split(F.trim(F.lower(text)), r"\s+")
    grams = words
    for j in range(1, n):
        shifted = F.slice(words, F.lit(j + 1), F.size(words))
        # zip_with pads the shorter side with null; concat_ws skips nulls,
        # so the trailing j entries are short grams — sliced off below.
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    grams = F.slice(grams, F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(0)))
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams — the SET form used by every dedup join."""
    return F.array_distinct(word_ngrams(text, n))


def hashed_shingles(text: Column, n: int = 3) -> Column:
    """Shingle set as distinct int64 hashes — 8 bytes per shingle through
    every downstream shuffle instead of a string."""
    return F.array_distinct(
        F.transform(word_shingles(text, n), lambda s: F.xxhash64(s))
    )


def has_min_words(text: Column, n: int) -> Column:
    """Cheap pushable equivalent of ``size(shingles) > 0``: at least n
    whitespace tokens. Filtering on the shingle expression itself is a
    trap — Catalyst inlines the alias into the pushed-down Filter and the
    (expensive) shingling evaluates 2-3× per row BELOW the balance
    repartition, i.e. serially on the narrow scan partition."""
    return F.size(F.split(F.trim(F.lower(text)), r"\s+")) >= n


# -- E2a: MinHash + LSH -----------------------------------------------------


def minhash_signature(shingle_hashes: Column, num_hashes: int = 32) -> Column:
    """k min-hash values from pre-hashed shingles: h_i(S) = min over s of
    (a_i·(s mod p) + b_i) mod p. One xxhash64 per shingle total; the k
    families are integer multiply-adds.

    The (a,b) families ride as ONE literal array<struct> driven by a
    nested lambda — k unrolled copies of the transform would generate k×
    the code and janino-compile for seconds per fresh JVM (a fixed cost,
    but it dominates short benches and slows every new executor)."""
    base = F.transform(shingle_hashes, lambda s: F.pmod(s, F.lit(_MERSENNE31)))
    params = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _affine_params(num_hashes)
        ]
    )
    return F.transform(
        params,
        lambda p: F.array_min(
            F.transform(
                base, lambda x: F.pmod(x * p["a"] + p["b"], F.lit(_MERSENNE31))
            )
        ),
    )


def minhash_signature_md5(shingles: Column, num_hashes: int = 16) -> Column:
    """Oracle-checkable MinHash signature: h_i(S) = min over grams g of the
    first 16 hex chars of md5(g || '#' || i).

    Same estimator as :func:`minhash_signature` (min over a hash family;
    collision probability = Jaccard) but every value is recomputable in
    ANSI SQL — ``min(substr(md5(gram || '#' || i), 1, 16))`` in DuckDB —
    so the gate hash-matches the SIGNATURE itself, not just downstream
    candidate rows. This is the md5-permutation trick that converted
    SimHash from rows-only to bit-exact in round 2.

    Cost: num_hashes md5 evaluations per gram, all inside whole-stage
    codegen (no Python). The xxhash64 affine family stays the production
    fast path for banding; this family is the verification surface.
    Reference parity: near-dup detection the reference's MySQL layer
    cannot express at all (SURVEY §2 E2).
    """
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.transform(
        idx,
        lambda i: F.array_min(
            F.transform(
                shingles,
                lambda g: F.substring(
                    F.md5(F.concat(g, F.lit("#"), i.cast("string"))), 1, 16
                ),
            )
        ),
    )


def _jaccard_hashed(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_band_dup_pairs_md5(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.3,
) -> DataFrame:
    """The full MinHash+LSH *pipeline* over the md5 hash family — banding,
    candidate self-join, exact-Jaccard verify — so the gate can hash-match
    the pipeline's OUTPUT, not just the signature stage
    (:func:`minhash_signature_md5` covers that). Every stage is ANSI-SQL
    expressible: the DuckDB dual recomputes signatures with
    ``min(substr(md5(gram || '#' || i), 1, 16))``, bands them with
    ``string_agg ORDER BY h_idx``, and verifies with ``list_intersect``.

    Same plan shape as the production :func:`minhash_lsh_dup_pairs`
    (xxhash64 affine family): banded equi-join carries (id, band, key)
    only; verify re-joins the shingle sets by id. Banding recall at the
    threshold is the standard S-curve 1-(1-j^r)^b (r=4, b=4 here —
    deterministic on BOTH engines, so the output is value-exact even
    where banding misses a true pair).
    """
    rows = num_hashes // bands
    base = scratch(
        balance(docs.where(has_min_words(F.col(text_col), shingle_n)), id_col)
        .select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        .persist()
    )
    sig = base.select("id", minhash_signature_md5(F.col("sh"), num_hashes).alias("sig"))
    band_entries = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.array_join(F.slice(F.col("sig"), b * rows + 1, rows), ",").alias(
                "band_key"
            ),
        ),
    )
    banded = scratch(
        sig.select("id", F.explode(band_entries).alias("bk"))
        .select("id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
        .persist()
    )
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", _jaccard_hashed(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


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

    Pipeline: hashed shingles (linear) → signature (linear) → explode b
    band keys → self-join on (band, band_hash) — candidates only share a
    bucket → re-join shingle sets by id → verify true Jaccard.
    Output: (id_a, id_b, jaccard) with id_a < id_b.

    At 100 TB the candidate shuffle carries (id, band, hash) triples only;
    bucket sizes are bounded by banding probability and AQE splits skewed
    buckets (boilerplate-heavy corpora).
    """
    rows = num_hashes // bands
    base = (
        balance(docs.where(has_min_words(F.col(text_col), shingle_n)), id_col)
        .select(
            F.col(id_col).alias("id"),
            hashed_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        # multi-pass algorithm: the shingle sets feed the signature pass AND
        # both sides of the verify join — persist instead of recomputing the
        # (expensive) shingling per branch. MEMORY_AND_DISK spills at scale.
        # Registered as scratch: callers release at the job boundary
        # (CacheManager would otherwise pin it for the session lifetime).
        .persist()
    )
    base = scratch(base)
    sig = base.select("id", minhash_signature(F.col("sh"), num_hashes).alias("sig"))

    # one lambda over a band-index sequence, not `bands` unrolled structs
    # (same codegen-size rationale as minhash_signature)
    band_entries = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), b * rows + 1, rows),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("band_hash"),
        ),
    )
    banded = (
        sig.select("id", F.explode(band_entries).alias("bk"))
        .select(
            "id", F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash")
        )
        # both sides of the candidate self-join read this — persist the
        # narrow (id, band, hash) triples, not the signature computation
        .persist()
    )
    banded = scratch(banded)

    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", _jaccard_hashed(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", **kw
) -> DataFrame:
    """Drop near-duplicates: connected-by-pair docs keep the smallest id.
    (Single-link within direct pairs; full transitive closure is an
    iterative connected-components job — see SURVEY.md §7.2 later phases.)
    """
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

    return balance(docs, id_col).select(
        F.col(id_col), simhash(F.col(text_col)).alias("simhash")
    )


# -- E2c: n-gram Jaccard via shingle equi-join ------------------------------


def ngram_jaccard_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    block_col: str | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold, computed by exploding
    hashed shingles and equi-joining on the int64 hash — co-occurrence
    counting rides the shuffle, so cost is Σ|bucket|² over shared
    shingles, not |docs|². Each token row carries its doc's shingle-set
    size (one extra int64 on the shuffle) so the union size falls out of
    the same aggregation — no second pass over the shingles, no persist,
    no size re-join. Output: (id_a, id_b, jaccard).

    ``block_col`` restricts pairing to documents sharing a blocking key
    (crawl dedup blocks by host: near-identical boilerplate pages live
    on one site, and cross-host shingle collisions are join fan-out with
    no dedup value). The key rides the shuffle as part of the join key,
    so each shingle bucket is (block, shingle)-local — at 100 TB this
    turns the worst-case Σ|bucket|² from corpus-global to per-site, the
    same containment the reference gets from day-partitioned deletes
    (/root/reference/internal/database/database.go:116).

    ``max_shingle_df`` is the hot-shingle defense: a stop-word-like
    shingle appearing in df documents contributes df² join rows, so ONE
    shingle in 1% of a 100 TB corpus makes its bucket quadratic. Shingles
    with document frequency > the cap are dropped from the join (standard
    df-capping); denominators keep the FULL shingle-set sizes, so the
    computed Jaccard only ever UNDERestimates — precision is exact, and
    the recall bound is quantifiable: a true-positive pair is missed only
    if its capped Jaccard (shared hot shingles removed from the
    intersection, none from the union) falls below the threshold. The
    hot set is provably small — ≤ total_tokens / cap shingles — so it
    broadcasts; the big token stream is never extra-shuffled for it."""
    block = [block_col] if block_col is not None else []
    sh = balance(docs.where(has_min_words(F.col(text_col), shingle_n)), id_col).select(
        F.col(id_col).alias("id"),
        *block,
        hashed_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    # explode_outer: plain explode triggers InferFiltersFromGenerate,
    # which re-derives size(sh)>0 and pushes the whole shingle expression
    # into a pre-shuffle Filter (evaluated serially on the narrow scan).
    # has_min_words already guarantees non-empty arrays, and a null
    # shingle key can never equi-join anyway.
    tokens = sh.select(
        "id", *block, F.size("sh").alias("n"), F.explode_outer("sh").alias("shingle")
    )
    if max_shingle_df is not None:
        # df is counted within the block when blocking is on — a shingle
        # hot on one giant site must not evict it from every other site.
        hot = (
            tokens.groupBy("shingle", *block)
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("shingle", *block)
        )
        tokens = tokens.join(F.broadcast(hot), ["shingle", *block], "left_anti")
    join_cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.id") < F.col("b.id")
    )
    if block_col is not None:
        join_cond = join_cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        # shuffle_hash, not broadcast: the token side is mid-sized (falls
        # under the broadcast threshold locally but never would at scale),
        # and building its HashedRelation serially on the driver is both a
        # bottleneck and a variance source. Shuffled hash join keeps the
        # whole pair-generation path executor-parallel — the same plan
        # shape a 100 TB run needs.
        tokens.alias("a").hint("shuffle_hash")
        .join(tokens.alias("b"), join_cond)
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            # n_a/n_b (and the block key) are functionally dependent on
            # the ids — free key cols
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            *[F.col(f"a.{c}").alias(c) for c in block],
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", *block, F.round("jaccard", 6).alias("jaccard"))
    )


def connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Duplicate-pair graph → cluster assignment: every node labeled with
    the smallest id reachable from it (the step that turns a pair list
    into actual KEEP/DROP decisions — near-dup clusters are equivalence
    classes, and pairs alone over-drop via A~B, B~C chains).

    Min-label propagation: each round every node takes the min of its own
    and its neighbors' labels — one equi-join plus one hash aggregation
    per round, all hash-partitioned on node id (the same loop GraphX's
    ConnectedComponents runs). Rounds needed = the eccentricity of each
    cluster's min node; near-dup clusters are shallow (pairs share most
    content), so this converges in a handful of rounds. The loop is
    driver-side CONTROL only — per-round data never leaves executors; the
    convergence check is a count aggregate.

    Output: (id, cluster_id) for every node that appears in ``pairs``.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("cluster_id"))
        .persist()
    )
    try:
        for _ in range(max_iterations):
            msgs = edges.join(
                labels.select(F.col("id").alias("src"), "cluster_id"), "src"
            ).select(F.col("dst").alias("id"), "cluster_id")
            new_labels = (
                labels.union(msgs)
                .groupBy("id")
                .agg(F.min("cluster_id").alias("cluster_id"))
                # cut lineage each round: without this, round k's plan
                # replays rounds 1..k-1 and the convergence count goes
                # quadratic
                .transform(materialize)
            )
            changed = (
                new_labels.join(
                    labels.select("id", F.col("cluster_id").alias("__old")), "id"
                )
                .where(F.col("cluster_id") != F.col("__old"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} rounds"
            )
    finally:
        # release caches on every exit path — a non-convergence raise in a
        # retry loop must not accumulate pinned partitions (unpersist on
        # an already-released frame is a no-op)
        edges.unpersist()
        labels.unpersist()
    return labels


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    **cc_kwargs,
) -> DataFrame:
    """Near-dup dedup decision: keep each cluster's canonical (min-id)
    member plus every unpaired doc. A left join against the cluster
    assignment; Catalyst/AQE picks broadcast when the assignment is
    actually small — NOT forced, because at web scale the paired-doc set
    is a large fraction of the corpus and a forced broadcast would
    collect it onto the driver."""
    clusters = connected_components(pairs, **cc_kwargs)
    return (
        docs.join(
            clusters.withColumnRenamed("id", id_col),
            id_col,
            "left",
        )
        .where(
            F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col(id_col))
        )
        .drop("cluster_id")
    )


# -- E-ext: paragraph-level exact dedup & substring-dup signal --------------


def paragraph_dedup_stats(
    docs: DataFrame,
    chunk_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Paragraph-granular exact dedup (the RefinedWeb recipe, with fixed
    ``chunk_tokens``-token chunks standing in for paragraphs — the
    fixture corpus has no newline structure): every chunk is hashed,
    each distinct chunk keeps its FIRST occurrence (min (doc_id, idx)),
    and each document reports how many of its chunks survived.

    Scale: chunking is a pure Column transform (no Python); the winner
    pass is ONE hash aggregation over (chunk-hash) with a min(struct)
    buffer; the verdict join shuffles (id, idx, 16-byte hash) triples
    only. Never a sort, never all-pairs.

    Output: (doc_id, n_chunks, kept_chunks).
    """
    L = chunk_tokens
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    n_chunks = F.ceil(F.size("__w") / F.lit(float(L))).cast("bigint")
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda i: F.array_join(F.slice(F.col("__w"), i * L + 1, L), " "),
    )
    ch = (
        docs.select(F.col(id_col).alias("doc_id"), words.alias("__w"))
        .where(F.size("__w") > 0)
        .withColumn("__n", n_chunks)
        .select("doc_id", "__n", F.posexplode(chunks).alias("idx", "chunk"))
        .select("doc_id", "__n", "idx", F.md5("chunk").alias("__h"))
    )
    winners = ch.groupBy("__h").agg(
        F.min(F.struct("doc_id", "idx")).alias("__first")
    )
    verdicts = ch.join(winners, "__h").select(
        "doc_id",
        "__n",
        (
            (F.col("__first.doc_id") == F.col("doc_id"))
            & (F.col("__first.idx") == F.col("idx"))
        ).alias("__kept"),
    )
    return verdicts.groupBy("doc_id").agg(
        F.max("__n").alias("n_chunks"),
        F.sum(F.col("__kept").cast("bigint")).cast("bigint").alias("kept_chunks"),
    )


def duplicated_span_stats(
    docs: DataFrame,
    span_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring duplication signal (Lee et al. 2022's suffix-dedup
    at fixed granularity): every SLIDING ``span_tokens``-token window is
    hashed, and a span occurrence counts as duplicated when its hash
    occurs anywhere else in the corpus (another doc or another position).
    Per document: total spans and duplicated spans — the mask a
    substring-dedup pass would cut.

    Scale: the gram pass reuses the O(words·n) zip_with chain
    (word_ngrams); global occurrence counts are one hash aggregation
    over 16-byte hashes; the verdict join ships (id, hash) pairs.

    Output: (doc_id, n_spans, dup_spans).
    """
    grams = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_ngrams(F.col(text_col), span_tokens)).alias("g"),
        )
        .select("doc_id", F.md5("g").alias("__h"))
    )
    counts = grams.groupBy("__h").agg(F.count(F.lit(1)).alias("__c"))
    return (
        grams.join(counts, "__h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("__c") > 1).cast("bigint")).cast("bigint").alias("dup_spans"),
        )
    )


def paragraph_dedup_rewrite(
    docs: DataFrame,
    chunk_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The REWRITE form of paragraph dedup: each document's text is
    reassembled from only its globally-surviving chunks (first occurrence
    by (doc_id, idx) wins — same winner rule as
    :func:`paragraph_dedup_stats`), in original chunk order. A document
    whose every chunk lost elsewhere becomes the empty string (kept as a
    row — dropping it is the caller's policy decision).

    Scale: identical shuffle profile to the stats pass (hash winner agg +
    verdict join on 16-byte hashes) plus one per-doc collect_list bounded
    by the document's own chunk count.

    Output: (doc_id, clean_text).
    """
    L = chunk_tokens
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda i: F.array_join(F.slice(F.col("__w"), i * L + 1, L), " "),
    )
    ch = (
        docs.select(F.col(id_col).alias("doc_id"), words.alias("__w"))
        .where(F.size("__w") > 0)
        .withColumn(
            "__n", F.ceil(F.size("__w") / F.lit(float(L))).cast("bigint")
        )
        .select("doc_id", F.posexplode(chunks).alias("idx", "chunk"))
        .withColumn("__h", F.md5("chunk"))
    )
    winners = ch.groupBy("__h").agg(
        F.min(F.struct("doc_id", "idx")).alias("__first")
    )
    kept = ch.join(winners, "__h").where(
        (F.col("__first.doc_id") == F.col("doc_id"))
        & (F.col("__first.idx") == F.col("idx"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text")
    )
    all_docs = docs.select(F.col(id_col).alias("doc_id")).where(
        F.size(words) > 0
    )
    return all_docs.join(rebuilt, "doc_id", "left").select(
        "doc_id", F.coalesce("clean_text", F.lit("")).alias("clean_text")
    )


def edit_verified_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_edit_ratio: float = 0.6,
) -> DataFrame:
    """Near-dup pairs verified by EXACT edit distance (r5): the same
    md5 MinHash banding as :func:`minhash_band_dup_pairs_md5` generates
    candidates, but verification is character-level Levenshtein — the
    classic candidate-generate/exact-verify split with a different,
    stricter verifier (Jaccard over shingle SETS ignores ordering and
    multiplicity; edit distance does not, so a shuffled bag of the same
    shingles scores near-0 Jaccard distance but large edit distance).
    Output: (id_a, id_b, edit_dist, max_len, edit_ratio) for candidate
    pairs with edit_dist <= max_edit_ratio * max(len_a, len_b).

    Scale: banding bounds candidates exactly as the MinHash pipeline;
    the verify joins only candidate ids back to their texts, and
    `levenshtein` is a JVM built-in (O(len_a*len_b) per pair — bounded
    by the candidate count, never all-pairs). Both engines implement
    the identical classic DP, so edit_dist is integer-exact across the
    oracle."""
    rows = num_hashes // bands
    base = scratch(
        balance(docs.where(has_min_words(F.col(text_col), shingle_n)), id_col)
        .select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("txt"),
            word_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        .persist()
    )
    sig = base.select(
        "id", minhash_signature_md5(F.col("sh"), num_hashes).alias("sig")
    )
    band_entries = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.array_join(
                F.slice(F.col("sig"), b * rows + 1, rows), ","
            ).alias("band_key"),
        ),
    )
    banded = (
        sig.select("id", F.explode(band_entries).alias("bk"))
        .select("id", "bk.band", "bk.band_key")
    )
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ta = base.select(F.col("id").alias("id_a"), F.col("txt").alias("t_a"))
    tb = base.select(F.col("id").alias("id_b"), F.col("txt").alias("t_b"))
    joined = cand.join(ta, "id_a").join(tb, "id_b")
    dist = F.levenshtein(F.col("t_a"), F.col("t_b"))
    mx = F.greatest(F.length("t_a"), F.length("t_b"))
    return (
        joined.select(
            "id_a",
            "id_b",
            dist.alias("edit_dist"),
            mx.alias("max_len"),
            F.round(dist / mx, 6).alias("edit_ratio"),
        )
        .where(F.col("edit_dist") <= F.lit(max_edit_ratio) * F.col("max_len"))
    )
