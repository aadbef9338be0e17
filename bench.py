"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. The driver runs this per-round at
sf0.1 and compares against BASELINE.md; run locally at sf0.01 while
iterating.

Each query is timed to full materialization (count of the result — forces
every stage; avoids driver-side collect cost dominating small results).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from prom_etl_db_spark.functions.scratch import release_scratch  # noqa: E402
from prom_etl_db_spark.queries import QUERIES  # noqa: E402
from prom_etl_db_spark.session import get_spark  # noqa: E402

# Representative, scale-stressing subset of the registry: the flagship
# composite, wide aggregation, broadcast joins, shuffle-heavy dedup, the
# pandas-UDF path, and the similarity search. The legacy 17 keep their
# r1-era history; the last five (r7, VERDICT r6 task #2) are the
# heaviest modern operators — suffix-array substring rewrite, the
# five-stage curation flagship, iterative PageRank, the composed crawl
# pipeline and the WARC byte walk — so the mechanized --against A/B
# regression-gates them per round too.
HEADLINE = [
    "flagship_gpu_utilization",
    "ingest_normalize_events",
    "promql_sum_over_time",
    "promql_rate",
    "promql_gapfill_locf",
    "hourly_rollup",
    "tpch_q1_pricing_summary",
    "top_customers",
    "regional_revenue",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "similarity_topk",
    "embedding_neardup_pairs",
    "text_quality",
    "doc_fingerprint",
    "multimodal_decode",
    # --- r7 additions: heavy modern operators ---
    "doc_substring_dedup_rewrite",
    "curation_pipeline_v2",
    "host_graph_pagerank",
    "crawl_pipeline_v1",
    "warc_record_parse",
    # --- r11 addition (VERDICT r10 task #6): the native-histogram
    # surface is ~4,400 lines of modern code none of the 22 legacy
    # headliners touch — the parsed sum-by quantile idiom exercises
    # wire decode, the endpoint-snapshot increase, the group merge,
    # and the pure-Column quantile in one query
    "promql_parsed_native_quantile",
]


def bench_against(ref: str, only: "list[str] | None" = None) -> None:
    """Paired same-host A/B vs the prior round's CODE (VERDICT r5 task #2).

    Checks ``ref`` into a temp ``git worktree``, spawns one
    ``tools/bench_worker.py`` per build, and INTERLEAVES the two builds'
    best-of-3 runs — rep by rep, query by query, A then B back-to-back —
    so both builds see the same host load at the same moments. The emitted
    JSON carries ``against.ratio_vs_prior_code`` per query; the regression
    gate is "no query >1.3× the prior CODE on the same host", which unlike
    ratio-vs-prior-RECORDING cannot be tripped by a noisy measurement day
    (r5's flagship read 1.56× vs the r4 recording while being ≤1.0× vs the
    r4 code run the same day — BENCH_NOTES.md r5 adjudication, now
    mechanized here).
    """
    import subprocess
    import tempfile

    repo = str(Path(__file__).resolve().parent)
    wt = tempfile.mkdtemp(prefix="bench_against_")
    subprocess.run(
        ["git", "-C", repo, "worktree", "add", "--force", "--detach", wt, ref],
        check=True,
        capture_output=True,
    )

    def spawn(build_dir: str) -> subprocess.Popen:
        p = subprocess.Popen(
            [sys.executable, os.path.join(repo, "tools", "bench_worker.py"), build_dir],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
            bufsize=1,
        )
        while True:  # wait for boot + warmup
            line = p.stdout.readline()
            if not line:
                raise RuntimeError(f"worker for {build_dir} died during boot")
            if line.strip() == "READY":
                return p

    def ask(p: subprocess.Popen, cmd: str, name: str) -> dict:
        p.stdin.write(f"{cmd} {name}\n")
        p.stdin.flush()
        return json.loads(p.stdout.readline())

    try:
        cur = spawn(repo)
        pri = spawn(wt)
        # Codegen warmup both builds first (same order), then paired reps.
        common = []
        for name in (only or HEADLINE):
            a = ask(cur, "WARM", name)
            b = ask(pri, "WARM", name)
            if "error" in a or "error" in b:
                print(f"# {name}: skipped (absent in one build)", file=sys.stderr)
                continue
            common.append(name)
        best_cur: dict[str, float] = {}
        best_pri: dict[str, float] = {}
        for rep in range(3):
            for name in common:
                a = ask(cur, "RUN", name)["sec"]
                b = ask(pri, "RUN", name)["sec"]
                best_cur[name] = min(a, best_cur.get(name, a))
                best_pri[name] = min(b, best_pri.get(name, b))
                print(f"# rep{rep} {name}: cur={a:.3f}s prior={b:.3f}s", file=sys.stderr)
        for p in (cur, pri):
            p.stdin.write("EXIT\n")
            p.stdin.flush()
            p.wait(timeout=60)
    finally:
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            capture_output=True,
        )

    ratio = {
        n: round(best_cur[n] / best_pri[n], 3) if best_pri[n] > 0 else None
        for n in common
    }
    worst = max(common, key=lambda n: ratio[n] or 0.0)
    print(
        json.dumps(
            {
                "metric": "headline_ab_vs_prior_code",
                "value": round(sum(best_cur.values()), 3),
                "unit": "sec",
                "queries": {n: round(best_cur[n], 3) for n in common},
                "prior_code": {n: round(best_pri[n], 3) for n in common},
                "ratio_vs_prior_code": ratio,
                "worst": {"query": worst, "ratio": ratio[worst]},
                "against_ref": ref,
                "gate_1p3x": "pass" if (ratio[worst] or 0) <= 1.3 else "FAIL",
            }
        )
    )


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--against":
        # optional trailing query names restrict the A/B to a subset
        # (iteration aid; the official per-round A/B passes none)
        bench_against(sys.argv[2], only=sys.argv[3:] or None)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("prom-etl-db-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a trivial job so query 1 isn't charged for it.
    spark.range(1000).selectExpr("sum(id)").collect()
    # Python-worker warmup: fork + pandas/Arrow import on every core, so the
    # first pandas-UDF query isn't charged for process startup either.
    par = spark.sparkContext.defaultParallelism
    spark.range(par).repartition(par).mapInPandas(lambda it: it, "id long").count()
    # Datasource warmup: first parquet touch pays one-time reader/scan init
    # (~5 s measured) — that's session infrastructure, not query cost, so
    # don't charge it to whichever query happens to scan a table first.
    from prom_etl_db_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    # Load sentinel (r9, VERDICT r8 stretch): BENCH_r08.json entered the
    # record at 3.5x the code's real cost because the driver bench ran
    # under test load, and nothing in the JSON said so. A fixed
    # registry-independent canary job (pure JVM aggregation — identical
    # bytecode every round) runs best-of-3 BEFORE and AFTER the timed
    # block; its absolute seconds and the pre/post ratio are stamped into
    # the output, so a contaminated record is self-identifying against
    # the quiet-host canary value pinned in BENCH_NOTES.md.
    def canary() -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(50_000_000).selectExpr("sum(id % 7)").collect()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        return round(best, 3)

    canary()  # untimed: pay the canary's own codegen once, not in pre
    canary_pre = canary()

    # Codegen/JIT warmup per query: run the same plan once against the
    # smallest fixture so janino + C2 compilation is NOT charged to the
    # measured run (JMH-style steady-state measurement; the shingle
    # pipeline alone costs ~8 s of one-time compile). The expression
    # trees are scale-independent, so the generated classes are the same
    # ones the measured run hits.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        QUERIES[name](spark, warm_dir).count()
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    # per-query monotonic start/end stamps relative to the timed block
    # (r10 — BENCH_NOTES r9's honest scope note: the canary pair
    # certifies the ENDPOINTS, not a mid-run transient; with stamps, a
    # single-query outlier is attributable post-hoc — "which wall-clock
    # segment was this query measured in?" — without a re-run)
    spans: dict[str, list[float]] = {}
    block_t0 = time.perf_counter()
    for name in HEADLINE:
        fn = QUERIES[name]
        # best-of-3: the minimum of repeated materializations is the
        # standard noise-robust estimator for "what the engine costs" —
        # single-shot timings on this box swing 2-4× with host noise, and
        # back-to-back full-bench runs still swung ~2× at best-of-2 on
        # the pandas-UDF-heavy tail (Python-worker contention), so one
        # more repetition buys the driver's once-per-round number real
        # stability for ~10 s of extra wall time.
        best = None
        n = 0
        q_start = time.perf_counter() - block_t0
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            # several registry operators persist() intermediates for their
            # own multi-pass plans; dropping them between runs keeps each
            # measurement cold-cache and independent (lingering blocks
            # showed up as 2x run-to-run swings on later persist-heavy
            # queries). release_scratch() is the operators' own cleanup
            # hook; clearCache() stays as the backstop for anything not
            # registered.
            release_scratch()
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        spans[name] = [round(q_start, 3),
                       round(time.perf_counter() - block_t0, 3)]
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    canary_post = canary()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # host-load sentinel: compare against the quiet-host
                # canary value in BENCH_NOTES.md — an inflated canary
                # marks the WHOLE record as load-contaminated
                "canary_pre_sec": canary_pre,
                "canary_post_sec": canary_post,
                # [start, end] seconds of each query's best-of-3
                # measurement segment within the timed block — maps a
                # per-query outlier to its wall-clock window post-hoc
                "query_spans_sec": spans,
                "canary_spread": round(
                    max(canary_pre, canary_post)
                    / max(min(canary_pre, canary_post), 1e-9), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
