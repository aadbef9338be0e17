"""Deterministic sampling / splitting for training-data pipelines.

A 100 TB corpus can't use RNG-based sampling: `df.sample()` draws change
with partitioning, retries, and cluster size, so a re-run of one failed
stage silently changes the training set. Every operator here keys off a
content hash instead — the SAME row always lands in the SAME split/sample
regardless of cluster layout, which also makes the ops expressible as a
DuckDB oracle (md5 agrees everywhere, unlike engine-private hash64s).

The trick that keeps it oracle-able and codegen-friendly: a row's
position in [0, 1) is the first 8 hex chars of ``md5(key || salt)``, and
the threshold for fraction *f* is the hex string of ``floor(f · 16^8)``.
Lowercase hex compares lexicographically exactly like the number it
encodes, so the assignment is a plain STRING comparison — no hex→int
conversion on either engine, no UDF, whole-stage codegen all the way.

Reference scope note: the reference (samzong/prom-etl-db) has no sampling
surface at all — these are driver-mandated extensions (SURVEY.md §2.E)
for the LLM-pipeline role of this engine.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_position",
    "hex_threshold",
    "hash_split",
    "stratified_sample",
    "mix_by_column",
    "deterministic_topn",
    "cap_per_key",
    "weighted_sample",
    "global_shuffle",
    "pack_documents",
]

_HEX_SPAN = 16**8  # first 8 md5 hex chars span [0, 16^8)


def hash_position(key: Column, salt: str) -> Column:
    """First 8 hex chars of ``md5(key || salt)`` — the row's permanent
    position on the unit interval, encoded as a comparable hex string.
    Changing ``salt`` draws a fresh independent assignment (e.g. one salt
    for the split, another for a subsample)."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def hex_threshold(fraction: float) -> str:
    """``fraction`` of the unit interval as an 8-hex-char upper bound.
    fraction=1.0 returns "g" — lexicographically above every hex string,
    so ``pos < threshold`` keeps everything (a 9-char "100000000" would
    compare per-character and keep almost nothing)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    value = int(fraction * _HEX_SPAN)
    return "g" if value >= _HEX_SPAN else format(value, "08x")


def hash_split(
    df: DataFrame,
    key: str,
    fractions: Mapping[str, float],
    *,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hash.

    ``fractions`` maps split name → share; shares must sum to 1. The
    assignment is a pure projection (no shuffle, no sample()): stable
    under re-runs, repartitioning, and incremental appends — a new row
    joins a split without moving any existing row.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    pos = hash_position(F.col(key), salt)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = pos < hex_threshold(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return df.withColumn(
        split_col, last if expr is None else expr.otherwise(last)
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    fraction: float | Mapping[str, float],
    *,
    strata: str | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically, optionally with a
    per-stratum fraction map (e.g. downsample English, keep all Swahili —
    the usual language-rebalancing move in corpus curation).

    Unlike ``df.sampleBy`` this needs no driver-side fraction broadcast
    per seed and survives re-runs bit-identically; it is one codegen'd
    filter, so it pushes down past joins like any other predicate.
    """
    pos = hash_position(F.col(key), salt)
    if isinstance(fraction, Mapping):
        if strata is None:
            raise ValueError("strata= column required with per-stratum fractions")
        expr = None
        for value, frac in fraction.items():
            cond = (F.col(strata) == value) & (pos < hex_threshold(frac))
            expr = cond if expr is None else expr | cond
        return df.where(expr)
    return df.where(pos < hex_threshold(fraction))


def mix_by_column(
    df: DataFrame,
    strata: str,
    weights: Mapping[str, float],
    key: str,
    *,
    salt: str = "mix",
    counts: Mapping[str, int] | None = None,
) -> DataFrame:
    """Deterministic corpus mixing: downsample each stratum (source,
    language, domain...) so the OUTPUT composition matches ``weights``,
    keeping as much data as feasible without upsampling.

    The max total under the weights is T = min_i(n_i / w_i) — the binding
    stratum survives whole (fraction exactly 1.0) and every other stratum
    keeps w_i·T/n_i of its rows via the same md5-position trick as
    ``hash_split``: stable under re-runs, repartitioning, and appends.

    Scale shape: one tiny groupBy-count over the strata column (skippable
    at 100 TB by passing catalog-known ``counts``), then ONE codegen'd
    filter — a CASE over at most |strata| hex thresholds — that pushes
    down to the scan. No shuffle of the data, no sample(), no UDF.
    Strata absent from ``weights`` are dropped (weight 0); weights for
    absent strata are rejected loudly rather than silently renormalized.
    """
    for name, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {name!r} must be > 0, got {w}")
    if counts is None:
        counts = {
            r[strata]: r["n"]
            for r in df.groupBy(strata).agg(F.count(F.lit(1)).alias("n")).collect()
        }
    missing = [name for name in weights if name not in counts]
    if missing:
        raise ValueError(f"weights name strata absent from data: {missing}")
    # T = min over strata of n/w; fraction_i = (w_i * T) / n_i — written
    # with this exact association on both engines so the IEEE doubles
    # (and therefore the floor'd hex thresholds) are bit-identical.
    total = min(counts[name] / w for name, w in weights.items())
    pos = hash_position(F.col(key), salt)
    expr = None
    for name, w in weights.items():
        # the BINDING stratum (n/w == total) is kept whole BY IDENTITY,
        # not by computing (w*(n/w))/n — which can float-round to
        # 0.999… and drop a row whose hash position is exactly
        # 'ffffffff'. The oracle applies the same n/w == total test.
        frac = 1.0 if counts[name] / w == total else min(
            1.0, (w * total) / counts[name]
        )
        cond = (F.col(strata) == name) & (pos < hex_threshold(frac))
        expr = cond if expr is None else expr | cond
    return df.where(expr)


def deterministic_topn(df: DataFrame, key: str, n: int, *, salt: str = "topn") -> DataFrame:
    """A fixed-size uniform sample: the *n* rows with the smallest hash
    position (reservoir-sampling semantics without the sequential state).
    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    partial top-n, a tiny merge, never a global sort."""
    return (
        df.withColumn("__pos", hash_position(F.col(key), salt))
        .orderBy("__pos", key)
        .limit(n)
        .drop("__pos")
    )


def cap_per_key(
    df: DataFrame,
    strata: str,
    n: int,
    *,
    key: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Per-stratum cap: keep at most ``n`` rows per ``strata`` value
    (domain caps à la RefinedWeb — no single source may dominate the
    corpus), chosen uniformly-deterministically by hash position so the
    survivors are a stable random sample, not "whatever sorted first".

    Scale: one shuffle on the strata key + a per-group row_number window
    ordered by the 8-hex position — window state is one counter per
    group. A HOT stratum (one domain = 5% of the corpus) makes that
    partition wide; since output ≤ n per group, pre-filtering each MAP
    partition to its local top-n first (groupBy strata with a bounded
    heap) would cut the shuffle — at fixture scale the plain window is
    the clearer plan and AQE skew-split handles moderate imbalance.
    """
    if n < 1:
        raise ValueError(f"cap must be >= 1, got {n}")
    from pyspark.sql.window import Window

    pos = hash_position(F.col(key), salt)
    w = Window.partitionBy(strata).orderBy(pos, F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: Column,
    n: int,
    *,
    salt: str = "wsample",
    score_col: str = "sample_score",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    per row draw u from its hash position and keep the n largest
    u^(1/w) — equivalently the largest ln(u)/w, computed in log space to
    dodge underflow. Inclusion probability is proportional to weight
    (quality-weighted corpus selection: sample by quality score, recency,
    token budget, ...), yet the draw is DETERMINISTIC — same salt, same
    result, on any partitioning, any engine.

    u = (int(md5(key‖salt)[:13 hex]) + 1) / (16¹³ + 1) ∈ (0, 1] — 52
    bits of hash, never zero. Weights must be > 0 (rows with w ≤ 0 or
    NULL are excluded — they'd otherwise win with certainty).

    Scale: the score is a pure projection; top-n is an orderBy+limit —
    Spark plans TakeOrderedAndProject (per-partition heaps + driver
    merge of n), no global sort materializes. n is driver-bounded by
    construction (it's a sample).
    """
    span = 16**13
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))), 1, 13), 16, 10).cast("long")
        + F.lit(1)
    ) / F.lit(float(span + 1))
    score = F.log(u) / weight
    return (
        df.where(weight > 0)
        .withColumn(score_col, F.round(score, 10))
        .orderBy(F.col(score_col).desc(), F.col(key).asc())
        .limit(n)
    )


def global_shuffle(
    df: DataFrame, key: str, *, salt: str = "shuffle", partitions: int | None = None
) -> DataFrame:
    """Deterministically permute rows for training export, ordered by the
    md5 of (key, salt). Epoch *k* uses salt=f"epoch{k}" for an
    independent permutation of the same data.

    With ``partitions``, rows HASH-partition on an md5 prefix and sort
    within each shard: shard membership and within-shard order depend
    only on (key, salt) — rerunning a failed export reproduces the same
    shards. (``repartitionByRange`` would look prettier but samples its
    bounds with an RDD-id-dependent seed, so re-runs could split files
    differently.) Shards are not a single global order; omit
    ``partitions`` for one totally-ordered output."""
    order = F.md5(F.concat(F.col(key).cast("string"), F.lit(salt)))
    shuffled = df.withColumn("__ord", order)
    if partitions is not None:
        if partitions <= 0:
            raise ValueError(f"partitions must be positive, got {partitions}")
        return (
            # the key itself tiebreaks equal hashes (only possible when
            # key values repeat): order then depends on nothing but data
            shuffled.repartition(partitions, F.substring("__ord", 1, 8))
            .sortWithinPartitions("__ord", key)
            .drop("__ord")
        )
    return shuffled.orderBy("__ord", key).drop("__ord")


def pack_documents(
    docs: DataFrame,
    budget: int,
    *,
    key: str = "doc_id",
    tokens_col: Column | None = None,
    buckets: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing for training export: lay the
    corpus out in a deterministic (hashed) order and cut it into
    fixed-``budget`` token windows — the standard LLM-pretraining packing
    (documents may straddle a window boundary; the window a doc STARTS in
    is its pack).

    Distribution: docs hash into ``buckets`` independent streams (first
    md5 hex char → 16ⁿ buckets), each packed by one running-sum window —
    so parallelism = buckets and no global sort exists. Within a bucket
    the order is the md5 position, so re-runs, repartitioning, and
    cluster size cannot reorder a stream. Output adds (pack_bucket,
    pack_id, pack_offset): pack_id counts windows within the bucket,
    pack_offset is the doc's token offset inside its window.

    Requires a per-doc token count ≤ budget only if downstream forbids
    straddling; this operator itself allows any sizes.
    """
    if buckets not in (16, 256):
        raise ValueError("buckets must be 16 or 256 (1 or 2 md5 hex chars)")
    n_chars = 1 if buckets == 16 else 2
    from prom_etl_db_spark.functions.text import token_count

    n_tok = tokens_col if tokens_col is not None else token_count(F.col("text"))
    pos = hash_position(F.col(key), salt)
    df = docs.withColumn("__pos", pos).withColumn(
        "__bucket", F.substring(F.col("__pos"), 1, n_chars)
    ).withColumn("__tok", n_tok.cast("long"))
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("__bucket")
        .orderBy("__pos", key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("__tok").over(w), F.lit(0))
    return (
        df.withColumn("__start", start)
        .select(
            *docs.columns,
            F.col("__bucket").alias("pack_bucket"),
            (F.col("__start") / budget).cast("long").alias("pack_id"),
            (F.col("__start") % budget).alias("pack_offset"),
        )
    )


def dsir_logweights(
    docs: DataFrame,
    *,
    target: Column | None = None,
    m: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much it resembles a TARGET distribution, using hashed n-gram
    features — the published method behind quality-targeted pretraining
    corpus selection.

    Features are unigrams + bigrams of the whitespace-lowercased text,
    md5-hashed into ``m`` buckets (the same engine-portable hash idiom
    as the count-min sketch). Bucket unigram models for the target
    subset and the full (raw) corpus get add-one smoothing; each
    document's log importance weight is Σ_b c_doc[b]·(ln p_t[b] − ln
    p_r[b]). ``target`` is any boolean Column over ``docs`` (default:
    ``lang = 'en'`` — select data resembling the English slice).

    Scale architecture: ONE feature explosion feeds (a) a per-(doc,
    bucket) hash aggregation — the only corpus-sized shuffle, keyed and
    combinable map-side — and (b) an m-row bucket model built from that
    same aggregate; the m-row log-ratio table and its 1-row totals
    broadcast back onto (a). No windows, no per-doc Python; the paper's
    Gumbel resampling step is replaced by the deterministic weight (the
    caller ranks/thresholds — DIVERGENCES.md). Documents with no
    features at all (NULL/empty/whitespace-only text) carry no
    evidence and are omitted from the output — left-join the result
    back if every doc_id must survive (r5 note; same contract as
    bigram_lm_perplexity's single-word omission)."""
    if target is None:
        target = F.col("lang") == "en"
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    grams = F.concat(
        toks,
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    feats = docs.select(
        F.col(id_col), target.alias("is_target"), F.explode(grams).alias("g")
    ).select(
        id_col,
        "is_target",
        (
            F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10)
            .cast("long") % m
        ).alias("b"),
    )
    per_doc = feats.groupBy(id_col, "b").agg(
        F.count(F.lit(1)).alias("c"),
        F.first("is_target").alias("is_target"),
    )
    model = per_doc.groupBy("b").agg(
        F.sum("c").alias("r"),
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias("t"),
    )
    # Spark resolves column names case-insensitively by default, so the
    # totals must not be named R/T next to per-bucket r/t
    totals = model.agg(
        F.sum("r").alias("r_total"), F.sum("t").alias("t_total")
    )
    lr = (
        model.crossJoin(F.broadcast(totals))  # m rows × 1 row
        .select(
            "b",
            (
                F.log((F.col("t") + 1) / (F.col("t_total") + m))
                - F.log((F.col("r") + 1) / (F.col("r_total") + m))
            ).alias("lr"),
        )
    )
    return (
        per_doc.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("lr")), 4).alias("dsir_logw"),
        )
    )
