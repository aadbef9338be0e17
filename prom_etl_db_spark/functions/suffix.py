"""Distributed suffix array + LCP over a token corpus — the REAL
arbitrary-length repeated-substring machinery (r5).

Upgrades the fixed-granularity approximation documented in
DIVERGENCES.md ("Exact-substring dedup (Lee et al. 2022)"): the
sliding-L span hashes in `dedup.duplicated_span_stats` detect any
repeat ≥ L but report only fixed-L granularity. A suffix array + LCP
array gives the EXACT length of every maximal repeat — the data
structure the Lee et al. paper itself builds — and both are
constructible scalably:

* **Suffix array by prefix doubling** (Karp–Miller–Rosenberg): round k
  ranks every suffix by its first 2^k tokens using the pair
  (rank_k[i], rank_k[i + 2^k]); ⌈log2 n⌉ rounds, each one equi-join +
  one global dense-rank. This is the textbook distributed construction
  (Flick & Aluru, SC'15 build the same ladder with MPI sorts; Spark's
  range-partitioned sort plays that role here).
* **Global dense rank** is the one primitive Spark lacks as a narrow
  op: implemented JVM-side as distinct-keys → `repartitionByRange`
  (the distributed sort) → per-range-partition `row_number` window
  (partitioned by `spark_partition_id`, never global) → +prefix-sum
  offsets from the #partitions-row count frame. No single-partition
  window over data anywhere, and no Python on the hot path (an earlier
  revision used RDD sortBy/zipWithIndex — correct, but it pickled
  every row through Python once per doubling round).
* **LCP by rank-table binary lifting**: keep every round's rank table;
  LCP(p, q) accumulates 2^k for each level (high → low) where
  rank_k[p + acc] == rank_k[q + acc]. O(log n) equi-joins over the
  adjacency frame — the distributed substitute for Kasai's inherently
  sequential scan.

Cross-document phantom repeats are fenced with a unique-per-document
sentinel token (\\x02<doc_id>): a sentinel can never equal any real
token or another doc's sentinel, so no LCP window crosses a document
boundary and rank-equality at level k always certifies 2^k REAL
matching tokens.

At 100 TB: every round is (shuffle-sort + join) over (pos, rank)
pairs — 8/16-byte rows, ~60 rounds for 10^12 tokens; each round would
be checkpointed (the plan is otherwise a 60-deep join chain). The
fixture-scale gate queries slice the corpus (doc_id % 23 = 3) so the
driver hash still pins every SA entry, every LCP value, and every
rewritten document.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.scratch import materialize, scratch

__all__ = [
    "token_stream",
    "suffix_array_with_lcp",
    "mark_repeated_spans",
    "substring_dedup_rewrite",
]

SENTINEL = "\x02"  # + doc_id: unique per document, below any real token

# Initial prefix-doubling span (r12): round 0 ranks every suffix by its
# first SA_INIT_SPAN tokens directly instead of a single token, skipping
# log2(SA_INIT_SPAN) doubling rounds (each one equi-join + one global
# dense rank + a checkpoint barrier) and the same number of LCP-lifting
# levels (two joins each). Legal because the WITHIN-DOCUMENT token
# window decides the global suffix order: any two distinct suffixes
# differ at or before the earlier of their documents' sentinels (a
# sentinel is unique per document and below every real token), so the
# per-document K-token slice — truncated at the document end, sentinel
# included — orders and ties exactly like the true K-token global
# prefix. The LCP remainder below SA_INIT_SPAN is resolved by comparing
# the same slices element-wise (one join pair instead of
# log2(SA_INIT_SPAN) lifting levels).
#
# K = 16 (r13, raised from 8 on measurement): each doubling round a
# wider round-0 window removes costs one equi-join + one global dense
# rank + a checkpoint barrier + two LCP-lift joins, while the window
# itself only adds lead() columns to one per-document pass. Interleaved
# best-of-4 at sf0.1: the deep-tie curation corpus (ties ~100 tokens)
# reads 5.93 s vs 6.77 s (0.876) and the shallow-tie substring corpus
# (ties < 8, round-0-only either way) pays 2.35 s vs 2.21 s (1.065) for
# the wider sort keys — and at web scale ties beyond 8 tokens are
# guaranteed (boilerplate), so the deep-tie case is the 100 TB shape.
# K = 12 and K = 32 both measured worse than 16 on the deep corpus.
SA_INIT_SPAN = 16


def _with_pref(stream: DataFrame, k: int) -> DataFrame:
    """stream + ``pref``: the suffix's first ≤k tokens WITHIN its
    document (lead window per doc, nulls past the sentinel filtered) —
    the round-0 rank key and the LCP remainder comparator."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    cols = [F.col("token")] + [
        F.lead("token", i).over(w) for i in range(1, k)
    ]
    return stream.withColumn(
        "pref", F.filter(F.array(*cols), lambda x: x.isNotNull())
    )


def token_stream(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(gpos, doc_id, pos, token): the corpus as one global token
    sequence — whitespace-lowercased tokens per document plus the
    per-document sentinel, positioned by a document-offset prefix sum
    (a window over the DOCUMENT frame, corpus-bounded by doc count,
    never by tokens)."""
    from pyspark.sql.window import Window

    # \x02 (the sentinel prefix) is scrubbed from the TEXT first (r6
    # adversarial-review fix): a real token beginning with \x02 would
    # otherwise (a) be silently dropped by the rewrite's sentinel
    # filter and (b) — worse — a token spelled "\x02<digits>" would
    # EQUAL another document's sentinel, breaking the cross-document
    # fence that every LCP correctness claim rests on. STX never
    # carries meaning in text; replacing it with a space is the same
    # canon every tokenizing operator here applies to whitespace.
    toks = F.filter(
        F.split(
            F.lower(F.translate(F.coalesce(F.col(text_col), F.lit("")), SENTINEL, " ")),
            r"\s+",
        ),
        lambda x: x != "",
    )
    per_doc = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.concat(
            toks,
            F.array(F.concat(F.lit(SENTINEL), F.col(id_col).cast("string"))),
        ).alias("toks"),
    )
    # offsets: running sum of per-doc token counts in doc_id order. The
    # window runs over ONE ROW PER DOCUMENT (bounded by corpus doc
    # count, not token count); partitioned on a constant bucket of the
    # doc ordering is unnecessary at that cardinality.
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    offs = per_doc.select(
        "doc_id",
        "toks",
        F.coalesce(F.sum(F.size("toks")).over(w), F.lit(0)).alias("off"),
    )
    return offs.select(
        "doc_id",
        "off",
        F.posexplode("toks").alias("pos", "token"),
    ).select(
        (F.col("off") + F.col("pos")).alias("gpos"),
        "doc_id",
        "pos",
        "token",
    )


def _dense_rank(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Distributed global dense rank, entirely JVM-side (r5 rev 2; r12
    rev 3 — the r5 revision ran distinct → range-sort → row_number →
    join-back, i.e. TWO extra shuffles of the full frame per doubling
    round; this revision ranks in place): repartitionByRange(key) (the
    distributed sort) → dense_rank windowed PER RANGE PARTITION
    (partitioned by spark_partition_id — never a global window; the
    range partitioner puts equal keys in one partition, so a local
    dense rank is globally consistent) → global rank = partition
    offset + local rank, offsets from a prefix sum over the
    #partitions-row distinct-count frame. The ``_pid`` frame is
    MATERIALIZED (localCheckpoint) before fanning out to the two
    branches — r13 correctness fix: spark_partition_id() downstream of
    an AQE-coalescible exchange is evaluated independently per
    consumer branch, and the two reads can coalesce to DIFFERENT
    layouts (measured at 271k rows / 32 shuffle partitions: the rank
    branch and the offsets branch disagreed on _pid, the inner join
    dropped 2/3 of the rows, and prefix doubling silently stopped
    converging — invisible at gate-fixture scale where both branches
    coalesce to one partition). Materializing pins _pid as DATA, so
    any layout disagreement is impossible by construction (and the
    ADVICE r12 exchange-reuse hazard is gone with it — pinned by
    tests/test_r13_fixes_spark.py with exchange reuse disabled).
    Precondition: key_cols must be non-null (count_distinct drops
    null-containing tuples; every caller's keys — pref / r1 / r2 — are
    provably non-null). Output is deterministic regardless of where
    the sampled range boundaries fall: offset+local always
    reconstructs the one global order. Returns df + `rank` (long,
    0-based, equal keys share a rank)."""
    from pyspark.sql.window import Window

    parts = scratch(
        df.repartitionByRange(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(materialize)
    )
    local = parts.withColumn(
        "_local",
        F.dense_rank().over(
            Window.partitionBy("_pid").orderBy(*key_cols)
        ),
    )
    # offsets: one row per partition — bounded by the partition count,
    # so the ordering window here is over a tiny frame
    sizes = parts.groupBy("_pid").agg(
        F.count_distinct(*[F.col(k) for k in key_cols]).alias("_n")
    )
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "_pid", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    return local.join(F.broadcast(offs), "_pid").select(
        *df.columns,
        (F.col("_off") + F.col("_local") - 1).cast("long").alias("rank"),
    )


#: bucket count for the doubling rounds' deterministic partitioner —
#: scale-parameterised (64 buckets per core locally = 2048 at 32 cpus;
#: production sets SA_RANK_BUCKETS to ~64× the executor core count,
#: capped so the offsets frame stays broadcast-class)
SA_RANK_BUCKETS = int(os.environ.get("SA_RANK_BUCKETS", "0")) or None


def _dense_rank_pairs(df: DataFrame, n_ranks: int) -> DataFrame:
    """Doubling-round dense rank over the integer pair (r1, r2) — the
    same offset+local construction as ``_dense_rank`` but with a
    DETERMINISTIC bucket id computed from the key values instead of
    spark_partition_id() after a range exchange (r13, VERDICT r12 task
    #6). r1 ∈ [0, n_ranks) and r2 ∈ [-1, n_ranks) scalarize
    order-preservingly as s = r1·(m+1) + (r2+1) < (m+1)²; fixed-width
    buckets over that space (pid = s div ⌈(m+1)²/P⌉) are monotone in
    key order and keep equal keys together, which is all the
    offset-reconstruction needs. Wins per round vs the range form:
    ONE full-frame exchange instead of two (the range exchange AND the
    window's hash(_pid) exchange collapse into one hash exchange), no
    range-boundary sampling job, and no dependence on both branches
    seeing one physical exchange (ADVICE r12).

    Skew: when n_ranks+1 < P the bucket width is below one r1 group's
    scalar span, so hot first-key groups split across buckets by r2
    exactly like the range form. Above that cardinality the expected
    group is n/m rows (tiny); a residual boilerplate-hot (r1, *) group
    lands in one bucket where range could split it — corpora with
    single 2^k-token contexts hot enough to rival n/P rows should set
    SA_RANK_BUCKETS high or fall back to ``_dense_rank``. Keys must be
    non-null (callers' r1/r2 are coalesced).

    Falls back to the range form when (m+1)² would overflow a long
    (n_ranks ≥ 3·10⁹ — never at fixture scale; a 100 TB run reaches it
    only in late rounds where ranks are nearly distinct and the range
    form's sampling cost is amortized anyway)."""
    from pyspark.sql.window import Window

    m1 = n_ranks + 1  # r2 + 1 ∈ [0, m1); scalar space is m1²
    if m1 > 3_000_000_000:
        return _dense_rank(df, ["r1", "r2"])
    spark = df.sparkSession
    buckets = SA_RANK_BUCKETS or min(
        65536, max(256, 64 * spark.sparkContext.defaultParallelism))
    width = (m1 * m1) // buckets + 1
    parts = df.withColumn(
        "_pid",
        F.expr(f"(r1 * {m1}L + r2 + 1L) div {width}L"),
    )
    local = parts.withColumn(
        "_local",
        F.dense_rank().over(
            Window.partitionBy("_pid").orderBy("r1", "r2")
        ),
    )
    sizes = parts.groupBy("_pid").agg(
        F.count_distinct("r1", "r2").alias("_n")
    )
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "_pid", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    return local.join(F.broadcast(offs), "_pid").select(
        *df.columns,
        (F.col("_off") + F.col("_local") - 1).cast("long").alias("rank"),
    )


def suffix_array_with_lcp(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Full suffix array + LCP of the corpus token stream. Output: one
    row per corpus position — (sa_rank, gpos, doc_id, pos, lcp_prev)
    where sa_rank is the suffix's position in lexicographic suffix
    order (token-level, UTF-8 binary per token; a shorter suffix that
    prefixes a longer one sorts first) and lcp_prev is the exact
    token-level longest-common-prefix with the SA-previous suffix
    (0 for sa_rank 0). Any repeated substring of any length ℓ appears
    as an SA-adjacent pair with lcp_prev ≥ ℓ — the arbitrary-length
    upgrade of duplicated_span_stats' fixed-L spans."""
    out, _stream = _sa_lcp_and_stream(docs, id_col=id_col, text_col=text_col)
    return out


def _sa_lcp_and_stream(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> "tuple[DataFrame, DataFrame]":
    """``suffix_array_with_lcp`` + the persisted token stream it was
    built from, so callers that also need the stream (the rewrite)
    reuse the cached frame instead of re-tokenizing the corpus (r12)."""
    stream = scratch(
        token_stream(docs, id_col=id_col, text_col=text_col).persist()
    )
    n = stream.count()

    # round 0 (r12): rank by the first SA_INIT_SPAN tokens directly —
    # see the SA_INIT_SPAN comment for why the within-doc slice is a
    # legal stand-in for the global prefix
    pstream = _with_pref(stream, SA_INIT_SPAN)
    ranks = _dense_rank(pstream.select("gpos", "pref"), ["pref"]).select(
        "gpos", "rank"
    )
    rank_tables = []  # (span, ranks_df) — span = prefix length compared
    span = SA_INIT_SPAN
    while True:
        # Lineage MUST be truncated every round, not merely cached:
        # round k's pairing self-joins round k-1's frame, so the
        # LOGICAL plan doubles per round — 2^rounds analyzer nodes OOM
        # the driver near n≈10^5 (measured: 18 rounds = heap death)
        # even though the data is tiny. localCheckpoint materializes
        # the round and replaces the plan with an RDD-scan leaf; on a
        # real cluster use reliable checkpoint() for fault tolerance
        # (module docstring). scratch-registered so the caller's job
        # boundary releases the round caches (scratch.py contract).
        ranks = scratch(ranks.transform(materialize))
        rank_tables.append((span, ranks))
        # ranks are dense 0-based → distinct count = max + 1 (a plain
        # max is a cheaper action than count_distinct; r12)
        mx = ranks.agg(F.max("rank")).first()[0]
        n_ranks = (mx + 1) if mx is not None else 0
        if n_ranks == n or span >= n:
            break
        # pair (rank[i], rank[i+span]); absent tail -> -1 (sorts first,
        # so the shorter suffix precedes — the standard SA convention)
        paired = (
            ranks.alias("a")
            .join(
                ranks.alias("b"),
                F.col("a.gpos") + F.lit(span) == F.col("b.gpos"),
                "left",
            )
            .select(
                F.col("a.gpos").alias("gpos"),
                F.col("a.rank").alias("r1"),
                F.coalesce(F.col("b.rank"), F.lit(-1)).alias("r2"),
            )
        )
        ranks = _dense_rank_pairs(paired, n_ranks).select("gpos", "rank")
        span *= 2

    sa = ranks  # all ranks distinct: rank == SA position

    # SA-adjacent pairs + LCP by binary lifting over the kept tables.
    pairs = (
        sa.alias("x")
        .join(sa.alias("y"), F.col("x.rank") + 1 == F.col("y.rank"))
        .select(
            F.col("y.rank").alias("sa_rank"),
            F.col("x.gpos").alias("p"),
            F.col("y.gpos").alias("q"),
        )
        .withColumn("acc", F.lit(0).cast("long"))
    )
    # The FINAL rank table never lifts (r13): at loop exit every rank is
    # distinct, so rank_Sf[p+acc] == rank_Sf[q+acc] is impossible for
    # distinct positions — its level is two full-frame joins that can
    # never match. Coverage is unharmed: all-distinct at span Sf means
    # any two suffixes differ within Sf tokens (LCP ≤ Sf−1), and the
    # remaining spans {K..Sf/2} sum to Sf−K with the < K tail counted by
    # the remainder slice compare below — together exactly Sf−1. For a
    # corpus whose ties resolve in round 0 this removes the ONLY lifting
    # level, i.e. two joins from every shallow SA build.
    for sp, rk in reversed(rank_tables[:-1]):
        rp = rk.select(
            F.col("gpos").alias("p_at"), F.col("rank").alias("p_rank")
        )
        rq = rk.select(
            F.col("gpos").alias("q_at"), F.col("rank").alias("q_rank")
        )
        pairs = (
            pairs.join(
                rp, F.col("p") + F.col("acc") == F.col("p_at"), "left"
            )
            .join(rq, F.col("q") + F.col("acc") == F.col("q_at"), "left")
            .withColumn(
                "acc",
                F.when(
                    F.col("p_rank").isNotNull()
                    & (F.col("p_rank") == F.col("q_rank")),
                    F.col("acc") + F.lit(sp),
                ).otherwise(F.col("acc")),
            )
            .select("sa_rank", "p", "q", "acc")
        )

    # remainder < SA_INIT_SPAN (r12): the lifting tables stop at span
    # SA_INIT_SPAN, so the last ≤ SA_INIT_SPAN−1 matching tokens are
    # counted by comparing the two within-doc prefix slices directly —
    # the mismatch is guaranteed inside the slices (remainder < K and
    # the slices carry the sentinel fence). One join pair + one
    # element-wise expression replaces log2(K) lifting levels.
    pp = pstream.select(
        F.col("gpos").alias("p_at"), F.col("pref").alias("p_pref")
    )
    qq = pstream.select(
        F.col("gpos").alias("q_at"), F.col("pref").alias("q_pref")
    )
    empty_arr = F.expr("CAST(array() AS array<string>)")
    eqs = F.zip_with(
        F.coalesce(F.col("p_pref"), empty_arr),
        F.coalesce(F.col("q_pref"), empty_arr),
        lambda x, y: x.eqNullSafe(y),
    )
    first_false = F.array_position(eqs, F.lit(False))  # 1-based, 0=none
    rem = F.when(first_false > 0, first_false - 1).otherwise(F.size(eqs))
    pairs = (
        pairs.join(pp, F.col("p") + F.col("acc") == F.col("p_at"), "left")
        .join(qq, F.col("q") + F.col("acc") == F.col("q_at"), "left")
        .withColumn("acc", F.col("acc") + rem.cast("long"))
        .select("sa_rank", "p", "q", "acc")
    )

    out = (
        sa.join(stream, "gpos")
        .join(
            pairs.select(
                F.col("sa_rank").alias("rank"), F.col("acc").alias("lcp_prev")
            ),
            "rank",
            "left",
        )
        .select(
            F.col("rank").alias("sa_rank"),
            "gpos",
            "doc_id",
            "pos",
            F.coalesce("lcp_prev", F.lit(0)).alias("lcp_prev"),
        )
    )
    return out, stream


def mark_repeated_spans(sa_lcp: DataFrame, min_len: int) -> DataFrame:
    """(gpos) rows for every corpus position inside a removable repeated
    span: each SA row with lcp_prev >= min_len witnesses that its
    suffix's first lcp_prev tokens also occur at the SA-previous
    suffix — marking THAT row's span keeps exactly one occurrence per
    run of >= min_len-sharing suffixes (the SA-first one; Lee et al.
    2022 likewise keep a single occurrence, which one being an
    implementation choice). Overlapping spans merge via DISTINCT.
    Embarrassingly parallel: one explode + one distinct, no windows."""
    return (
        sa_lcp.where(F.col("lcp_prev") >= min_len)
        .select(
            F.explode(
                F.sequence(
                    F.col("gpos"), F.col("gpos") + F.col("lcp_prev") - 1
                )
            ).alias("gpos")
        )
        .distinct()
    )


def substring_dedup_rewrite(
    docs: DataFrame,
    *,
    min_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring deduplication with REMOVAL (Lee et al. 2022's
    actual operation, via the real suffix array rather than the fixed-L
    approximation): build SA + LCP, mark every repeated span of
    >= min_len tokens except one kept occurrence per run, and rewrite
    each document without the marked tokens. Returns (doc_id, n_tokens,
    n_removed, kept_text) — kept_text is the surviving tokens rejoined
    with single spaces (tokenization is lossy of original whitespace by
    construction, same as every tokenizing operator here). Documents
    with no tokens at all (empty/whitespace-only text) have nothing to
    rewrite and are ABSENT from the output — callers wanting them back
    left-join against the source (pinned by test, r6)."""
    sa, full_stream = _sa_lcp_and_stream(
        docs, id_col=id_col, text_col=text_col
    )
    # the SA build already tokenized and PERSISTED the stream — filter
    # the cached frame instead of re-tokenizing the corpus (r12)
    stream = full_stream.where(~F.col("token").startswith(SENTINEL))
    marked = mark_repeated_spans(sa, min_len).withColumn(
        "removed", F.lit(True)
    )
    kept = (
        stream.join(marked, "gpos", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("removed"), 1).otherwise(0)).alias(
                "n_removed"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.coalesce(F.col("removed"), F.lit(False)),
                                F.struct("pos", "token"),
                            )
                        )
                    ),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("kept_text"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("n_removed").cast("long").alias("n_removed"),
            "kept_text",
        )
    )
    return kept
