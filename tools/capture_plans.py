"""Dump .explain("formatted") for headline queries to plans/<round>/.

Usage: python tools/capture_plans.py before|after [query ...]
Writes plans/$PLANS_ROUND/<query>_<tag>.txt (PLANS_ROUND defaults to
r13). Defaults to the full headline list.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import HEADLINE  # noqa: E402
from prom_etl_db_spark.functions.scratch import release_scratch  # noqa: E402
from prom_etl_db_spark.queries import QUERIES  # noqa: E402
from prom_etl_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = "/root/testdata/sf0.01"
    import os
    rnd = os.environ.get("PLANS_ROUND", "r13")
    out_dir = Path(__file__).resolve().parents[1] / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        release_scratch()
        spark.catalog.clearCache()
        print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
