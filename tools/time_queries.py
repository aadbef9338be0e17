"""Quick best-of-N timer for individual registry queries at an sf dir.

Usage: python tools/time_queries.py [--reps N] [--sf DIR] query [query ...]
Mirrors bench.py methodology (count() materialization, smallest-fixture
codegen warmup, release_scratch + clearCache between reps).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from prom_etl_db_spark.functions.scratch import release_scratch  # noqa: E402
from prom_etl_db_spark.queries import QUERIES  # noqa: E402
from prom_etl_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    while args and args[0].startswith("--"):
        if args[0] == "--reps":
            reps = int(args[1]); args = args[2:]
        elif args[0] == "--sf":
            sf_dir = args[1]; args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args
    spark = get_spark("time-queries-r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    par = spark.sparkContext.defaultParallelism
    spark.range(par).repartition(par).mapInPandas(lambda it: it, "id long").count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        QUERIES[name](spark, warm_dir).count()
        release_scratch()
        spark.catalog.clearCache()
    for name in names:
        best, n = None, 0
        for _ in range(reps):
            t0 = time.perf_counter()
            n = QUERIES[name](spark, sf_dir).count()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            release_scratch()
            spark.catalog.clearCache()
        print(f"# {name}: {best:.3f}s ({n} rows)", flush=True)


if __name__ == "__main__":
    main()
