"""Benchmark worker: one build of the engine behind a line protocol.

Spawned by ``bench.py --against <ref>`` — once per build (the working tree
and a ``git worktree`` checkout of the prior round). The parent interleaves
RUN commands across the two workers so both builds are measured under the
SAME host load at the same moments; that paired design is what makes the
per-query ratio-vs-prior-CODE immune to measurement-day noise (the failure
mode that cost round 5 a manual adjudication essay, BENCH_NOTES.md r5).

Protocol (stdin → stdout, one JSON line per reply, ``READY`` after boot):

    WARM <query>   run once at the warmup sf dir (codegen/JIT warm)
    RUN <query>    run once at $SPARK_GRAFT_SF_DIR, timed to count()
    EXIT           stop the session and exit 0

Unknown queries reply ``{"error": "unknown_query"}`` — the parent drops
them from the paired comparison (a query added this round has no prior-code
twin). The worker imports the engine from ``sys.argv[1]`` only; it never
touches the repo that spawned it, so one copy of this file can drive any
build whose registry exposes ``QUERIES`` (stable since round 1).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    build_dir = sys.argv[1]
    sys.path.insert(0, build_dir)

    from prom_etl_db_spark.queries import QUERIES  # noqa: E402
    from prom_etl_db_spark.session import get_spark  # noqa: E402

    try:  # release_scratch exists from round 4 on; older builds no-op
        from prom_etl_db_spark.functions.scratch import release_scratch
    except ImportError:  # pragma: no cover - old-build compatibility
        def release_scratch() -> None:
            return None

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    spark = get_spark(f"bench-worker-{os.path.basename(build_dir.rstrip('/'))}")
    spark.sparkContext.setLogLevel("ERROR")

    # Same session warmups as bench.py main(): JVM codegen, Python workers,
    # one-time parquet reader init — infrastructure, not query cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    par = spark.sparkContext.defaultParallelism
    spark.range(par).repartition(par).mapInPandas(lambda it: it, "id long").count()
    from prom_etl_db_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    print("READY", flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line or line == "EXIT":
            break
        cmd, _, name = line.partition(" ")
        if name not in QUERIES:
            print(json.dumps({"name": name, "error": "unknown_query"}), flush=True)
            continue
        target = warm_dir if cmd == "WARM" else sf_dir
        t0 = time.perf_counter()
        n = QUERIES[name](spark, target).count()
        el = time.perf_counter() - t0
        release_scratch()
        spark.catalog.clearCache()
        print(json.dumps({"name": name, "sec": round(el, 4), "rows": n}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
