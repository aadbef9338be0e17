"""Round-11 property/differential tests: ``native_hist_changes_and_
resets`` (the round's most intricate pure-Column code — per-pair
downscale/align reset compare + nonzero-signature change compare)
pinned against an independent PYTHON reference over seeded-random
series, all in ONE Spark job (the test_r10_props batched pattern)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import Row


def _py_downscale(offset, counts, d):
    if d <= 0 or not counts:
        return offset, list(counts)
    m = 1 << d
    j_lo = -(-offset // m)
    j_hi = -(-(offset + len(counts) - 1) // m)
    out = [0] * (j_hi - j_lo + 1)
    for k, c in enumerate(counts):
        out[-(-(offset + k) // m) - j_lo] += int(c)
    return j_lo, out


def _py_pair_reset(prev, cur):
    """(schema, zero, off, counts) pair → reset? — the reference rule:
    downscale to min schema, align, any aligned drop; zero drop."""
    target = min(prev[0], cur[0])
    po, pc = _py_downscale(prev[2], prev[3], prev[0] - target)
    co, cc = _py_downscale(cur[2], cur[3], cur[0] - target)
    if cur[1] < prev[1]:
        return True
    if not pc and not cc:
        return False
    lo = min(po, co)
    hi = max(po + len(pc), co + len(cc))
    for i in range(lo, hi):
        p = pc[i - po] if 0 <= i - po < len(pc) else 0
        c = cc[i - co] if 0 <= i - co < len(cc) else 0
        if c < p:
            return True
    return False


def _py_changed(prev, cur):
    def sig(s):
        return (s[0], s[1],
                tuple((s[2] + i, c) for i, c in enumerate(s[3]) if c))
    return sig(prev) != sig(cur)


def test_changes_resets_match_python_reference(spark):
    from prom_etl_db_spark.operators.native_hist import (
        native_hist_changes_and_resets,
    )

    rng = random.Random(1107)
    t0 = datetime(2024, 1, 29)
    rows, expected = [], {}
    for s in range(60):
        n = rng.randint(1, 6)
        samples = []
        for i in range(n):
            schema = rng.randint(0, 2)
            zero = rng.randint(0, 3)
            off = rng.randint(-3, 3)
            counts = [rng.randint(0, 4) for _ in range(rng.randint(0, 4))]
            samples.append((schema, zero, off, counts))
            rows.append(Row(
                labels={"s": str(s)}, ts=t0 + timedelta(minutes=i),
                schema=schema, zero_count=zero, pos_offset=off,
                pos_counts=counts))
        n_chg = sum(_py_changed(a, b)
                    for a, b in zip(samples, samples[1:]))
        n_rst = sum(_py_pair_reset(a, b)
                    for a, b in zip(samples, samples[1:]))
        expected[str(s)] = (float(n_chg), float(n_rst))
    df = spark.createDataFrame(
        rows,
        "labels map<string,string>, ts timestamp, schema int, "
        "zero_count long, pos_offset int, pos_counts array<long>")
    got = {
        r["labels"]["s"]: (r["n_changes"], r["n_resets"])
        for r in native_hist_changes_and_resets(df).collect()
    }
    assert got == expected
