"""Link-graph analytics for crawl curation: integer-arithmetic PageRank.

Reference scope: samzong/prom-etl-db has no graph surface; this is a
§2.E training-data-pipeline extension (round 6) — host-graph link
analysis is a standard web-curation signal (Common Crawl publishes
harmonic-centrality/PageRank host rankings precisely so corpus builders
can weight or filter by site authority), and it completes the round's
web story: url_dedup names the hosts, the host graph ranks them.

Why INTEGER arithmetic (the repo's quantized-term pattern): the power
iteration r' = (1−d)/N + d·Σ r_src/outdeg(src) sums per-dst
contributions, and float summation order differs between Spark's
shuffle and any oracle — bit drift compounds per iteration. With ranks
held in integer billionths and every per-edge contribution floored as
(17·r) DIV (20·od) (d = 0.85 = 17/20 exactly), both engines perform
IDENTICAL integer operations: the recursive-CTE oracle replays the
whole iteration bit-for-bit, the repo's strongest verification class.
The floor loss (< 1 unit per edge per round) leaks total mass slightly
— ranking order and convergence are unaffected, determinism is total;
documented in DIVERGENCES.md.

Scale shape: per round, one equi-join of the edge list against the rank
vector on src (both hash-partitioned on their keys) + one hash
aggregation on dst — the textbook distributed PageRank round (the same
shape GraphX's Pregel emits). The rank vector is node-sized, never
edge-sized; lineage is truncated every round with
``scratch.materialize`` — localCheckpoint locally, RELIABLE
checkpoint() whenever the session has a checkpoint dir configured
(``sc.setCheckpointDir``; a lost executor otherwise loses its
localCheckpoint blocks and fails the query) — exactly like the suffix
array's doubling rounds and connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.scratch import materialize, scratch

SCALE = 1_000_000_000  # ranks in integer billionths
D_NUM, D_DEN = 17, 20  # damping 0.85 as an exact rational


def pagerank_integer(
    edges: DataFrame,
    *,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = SCALE,
) -> DataFrame:
    """PageRank over a directed edge list (duplicate edges are
    collapsed), ``n_iter`` rounds of the damped power iteration in
    exact integer units of 1/``scale`` (billionths by default). Every
    node present as a source or a destination participates; nodes
    without in-links settle at the teleport base. Dangling nodes (no
    out-links) simply leak their mass — the deterministic convention
    Common Crawl's host ranks also use; callers wanting strict mass
    conservation add a sink node. Self-loops are kept: a page linking
    to itself feeds its own rank (collapse them upstream if unwanted).

    Refuses loudly when the node count underflows the rank quantum
    (teleport base (1−d)·scale/N floors to 0 — every rank would decay
    to 0 and the iteration silently degenerates): at the default scale
    that is N > 1.5e8 nodes; raise ``scale`` (int64 headroom reaches
    ~9.2e18, so scale=1e12 covers any real host graph; per-edge terms
    stay ≤ D_NUM·scale).

    Output: (node long, pr_q9 long) — pr_q9 is the rank in 1/scale.
    """
    # Loop invariants: e / nodes / deg are referenced by EVERY power
    # iteration below — un-materialized, each round's plan re-runs the
    # edge scan + distinct (and the union-distinct for nodes) and the
    # per-round plans keep the whole subtree for the analyzer to chew
    # on. localCheckpoint materializes each ONCE and replaces it with an
    # RDD-scan leaf (the same lineage-truncation discipline as the rank
    # vector below). Measured r12 at sf0.1, interleaved best-of-4:
    # ckpt 2.25 s vs 3.87 s unmaterialized vs 3.68 s persist() — the
    # columnar cache write makes persist() strictly worse than the
    # checkpoint here. materialize() upgrades to reliable checkpoint()
    # automatically when a checkpoint dir is configured (r13).
    e = scratch(
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .transform(materialize)
    )
    nodes = scratch(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(materialize)
    )
    n = nodes.count()  # one scalar — broadcast-class driver state
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("pr_q9"))
    base = ((D_DEN - D_NUM) * scale) // (D_DEN * n)
    if base == 0:
        raise ValueError(
            f"pagerank_integer: {n} nodes underflows the rank quantum at "
            f"scale={scale} (teleport base floors to 0); raise `scale`"
        )
    deg = scratch(
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .transform(materialize)
    )
    ranks = scratch(
        nodes.select("node", F.lit(scale // n).cast("long").alias("pr_q9"))
        .transform(materialize)
    )
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"({D_NUM} * pr_q9) DIV ({D_DEN} * od)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("incoming"))
        )
        ranks = scratch(
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base) + F.coalesce(F.col("incoming"), F.lit(0))
                ).cast("long").alias("pr_q9"),
            )
            .transform(materialize)
        )
    return ranks


H_SCALE = 1_000_000  # harmonic contributions in integer millionths


def harmonic_centrality_integer(
    edges: DataFrame,
    *,
    radius: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """In-harmonic centrality H(v) = Σ_{u≠v} 1/d(u→v), truncated at
    ``radius`` hops, every 1/d term floored to integer millionths
    (H_SCALE DIV d) — the same quantized-term discipline as
    ``pagerank_integer``, so an oracle can replay the whole BFS
    bit-for-bit. Truncation is a documented variant: contributions
    beyond the radius are each < H_SCALE/radius (Boldi & Vigna's
    HyperBall computes the untruncated value approximately; EXACT
    all-pairs BFS is the right tool only for bounded node sets like
    per-partition host blocks — DIVERGENCES.md).

    Scale shape: multi-source BFS — the frontier is (root, node) pairs,
    expanded by one equi-join on the edge list per round, deduped
    against the visited set with one left_anti join; both sides hash-
    partition on the join key, lineage truncated per round. State is
    O(reachable pairs), the exact-variant's inherent cost.

    Output: (node long, harmonic_q6 long).
    """
    # e is joined by every BFS round and nodes by the final right-join —
    # materialized once via localCheckpoint (the pagerank_integer
    # loop-invariant fix, r12; checkpoint measured faster than persist)
    e = scratch(
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .transform(materialize)
    )
    nodes = scratch(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(materialize)
    )
    visited = scratch(
        nodes.select(
            F.col("node").alias("root"), "node", F.lit(0).alias("dist")
        ).transform(materialize)
    )
    frontier = visited
    for r in range(1, radius + 1):
        nxt = (
            frontier.join(e, frontier.node == e.src)
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["root", "node"], "left_anti")
            .select("root", "node", F.lit(r).alias("dist"))
        )
        nxt = scratch(nxt.transform(materialize))
        if nxt.isEmpty():
            break
        visited = scratch(visited.union(nxt).transform(materialize))
        frontier = nxt
    return (
        visited.where(F.col("dist") > 0)
        .groupBy("node")
        .agg(F.sum(F.expr(f"{H_SCALE} DIV dist")).cast("long").alias("harmonic_q6"))
        .join(nodes, "node", "right")
        .select("node", F.coalesce("harmonic_q6", F.lit(0)).cast("long").alias("harmonic_q6"))
    )


def hyperball_harmonic(
    edges: DataFrame,
    *,
    radius: int = 8,
    p: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013) harmonic-centrality APPROXIMATION
    — the web-scale path the exact BFS's docstring and DIVERGENCES.md
    name: per-node HLL counters of the in-ball B(v, r) = {u : d(u→v) ≤
    r}, grown one radius per round by merging each node's counter with
    its IN-neighbors' counters (registers are max-mergeable, so the
    update is ONE equi-join along edges + ONE (node, register) hash
    agg), then H(v) ≈ Σ_r (|B(v,r)| − |B(v,r−1)|)/r from the estimated
    ball sizes. State is O(nodes · 2^p) register rows — radius-
    independent, the whole point: exact BFS state is O(reachable
    pairs), quadratic on dense graphs, while HyperBall's is linear in
    nodes whatever the graph (2.5 KB/node at p=6 as (idx, rank) rows).

    Same md5 register algebra as functions/sketches.py (hash/idx/rank
    spelled identically), so a DuckDB oracle replays EVERY integer —
    the register fingerprints (Σ_r filled, Σ_r rank mass) hash-match
    bit-for-bit; only the float estimate needs the standing round-4
    (dyadic 2^-r sums are order-exact; ln and the 8-term increment sum
    carry ulp-level engine drift).

    Output: (node long, fp_filled long, fp_rank long,
    harmonic_est double) — fp_* are the exact register fingerprints
    across all radii 0..radius.
    """
    bits = 32 - p
    mask = (1 << bits) - 1
    m = 1 << p
    # e is joined by every HyperBall round — materialized once (the
    # pagerank_integer loop-invariant fix, r12; checkpoint measured
    # faster than persist); nodes feeds only the initial register
    # build, no reuse to materialize
    e = scratch(
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .transform(materialize)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    h32 = F.conv(
        F.substring(F.md5(F.col("node").cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = h32.bitwiseAND(F.lit(mask))
    rank = (
        F.when(w == 0, F.lit(bits + 1))
        .otherwise(F.lit(bits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    regs = scratch(
        nodes.select(
            "node", F.shiftright(h32, bits).alias("idx"), rank.alias("r")
        ).transform(materialize)
    )

    def ball_stats(reg: DataFrame, radius_val: int) -> DataFrame:
        return reg.groupBy("node").agg(
            F.lit(radius_val).alias("radius"),
            F.count(F.lit(1)).alias("n_filled"),
            F.sum("r").cast("long").alias("sum_rank"),
            F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s_filled"),
        )

    per_radius = [ball_stats(regs, 0)]
    for rad in range(1, radius + 1):
        pulled = (
            e.join(regs, e.src == regs.node)
            .select(F.col("dst").alias("node"), "idx", "r")
        )
        regs = scratch(
            regs.unionByName(pulled)
            .groupBy("node", "idx")
            .agg(F.max("r").alias("r"))
            .transform(materialize)
        )
        per_radius.append(ball_stats(regs, rad))
    stats = per_radius[0]
    for fr in per_radius[1:]:
        stats = stats.unionByName(fr)
    # the sketches.py estimator, spelled identically (same branch order)
    zero = (F.lit(m) - F.col("n_filled")).cast("double")
    s = F.col("s_filled") + zero
    alpha_m2 = _alpha_m2(m)
    raw = F.lit(alpha_m2) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zero),
    ).otherwise(raw)
    w_lag = Window.partitionBy("node").orderBy("radius")
    inc = stats.select(
        "node", "radius", "n_filled", "sum_rank", est.alias("e")
    ).withColumn("de", F.col("e") - F.lag("e").over(w_lag))
    return (
        inc.groupBy("node")
        .agg(
            F.sum("n_filled").cast("long").alias("fp_filled"),
            F.sum("sum_rank").cast("long").alias("fp_rank"),
            F.round(
                F.sum(
                    F.when(
                        F.col("radius") >= 1,
                        F.col("de") / F.col("radius").cast("double"),
                    ).otherwise(F.lit(0.0))
                ),
                4,
            ).alias("harmonic_est"),
        )
    )


def _alpha_m2(m: int) -> float:
    """sketches._alpha(m) * m^2 — spelled once for the SQL dual."""
    return (0.7213 / (1.0 + 1.079 / m)) * m * m
