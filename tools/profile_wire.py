"""Profile the pure-Python remote-write wire codec (encode + decode)
on fixtures shaped like the bench's wire-gated queries.

Two shapes:
- "hist": promql_parsed_native_quantile's payload builder verbatim
  (1 series, 4 labels, 2 integer native histograms with 2 positive
  buckets each) — the native headline.
- "samples": a v2 samples payload (3 series x 4 samples, ms
  timestamps) — the remote_write_decode family.

Usage: python tools/profile_wire.py [n_payloads] [--cprofile]
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prom_etl_db_spark.functions import remote_write as RW  # noqa: E402


def hist_payload(u: int, e: int) -> bytes:
    c, d = u % 4 + 1, u % 3 + 1
    gc, gd = u % 5 + 1, u % 2 + 1
    z1 = u % 2 + 1
    o = u % 4 - 1
    hs = []
    for i, (counts, z) in enumerate(
            (([c, d], z1), ([c + gc, d + gd], z1 + u % 3))):
        hs.append({
            "schema": u % 2,
            "zero_threshold": 0.001,
            "zero_count": z,
            "count": z + sum(counts),
            "positive_spans": [(o, 2)],
            "positive_deltas": [counts[0], counts[1] - counts[0]],
            "timestamp": 1706572800000 + i * 300000,
        })
    return RW.encode_write_request_v2(
        [{"labels": {"__name__": "gpu_hist", "etype": f"type_{u % 7}",
                     "eid": str(e), "user": str(u)},
          "samples": [], "histograms": [h]} for h in hs])


def samples_payload(u: int, e: int) -> bytes:
    t0 = 1706572800000
    series = []
    for s in range(3):
        series.append({
            "labels": {"__name__": f"metric_{s}", "host": f"h{u % 13}",
                       "job": "node", "eid": str(e)},
            "samples": [(float(u % 97) + i, t0 + i * 15000)
                        for i in range(4)],
        })
    return RW.encode_write_request_v2(series)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    do_cprofile = "--cprofile" in sys.argv

    for shape, builder in (("hist", hist_payload), ("samples", samples_payload)):
        raws = [builder(i * 131 % 1000, i) for i in range(n)]
        comps = [RW.snappy_compress(r) for r in raws]

        t0 = time.perf_counter()
        encs = [builder(i * 131 % 1000, i) for i in range(n)]
        t1 = time.perf_counter()
        for r in encs:
            RW.snappy_compress(r)
        t2 = time.perf_counter()
        decs = [RW.snappy_decompress(c) for c in comps]
        t3 = time.perf_counter()
        outs = [RW.decode_write_request_v2(d) for d in decs]
        t4 = time.perf_counter()
        assert len(outs) == n
        print(f"[{shape}] n={n} bytes/payload={len(raws[0])} "
              f"encode={t1-t0:.3f}s snappy_c={t2-t1:.3f}s "
              f"snappy_d={t3-t2:.3f}s proto_decode={t4-t3:.3f}s")

        if do_cprofile:
            pr = cProfile.Profile()
            pr.enable()
            for d in decs:
                RW.decode_write_request_v2(d)
            pr.disable()
            st = pstats.Stats(pr)
            st.sort_stats("cumulative").print_stats(12)


if __name__ == "__main__":
    main()
