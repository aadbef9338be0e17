"""Round-10 property tests for the native-histogram merge primitives.

The Python twins (`_py_nh_downscale` / `_py_nh_align_add` — the
streaming folds' driver-side algebra, pinned equal to the Column forms
by the r9 restart tests and the differential below) carry the
hypothesis load at full example counts; one batched Spark differential
pins the Column forms against them over seeded-random cases in a
single job (per-example Spark jobs would be prohibitively slow)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prom_etl_db_spark.streaming.stateful import (
    _py_nh_align_add,
    _py_nh_downscale,
)

counts_st = st.lists(st.integers(min_value=0, max_value=1000),
                     min_size=0, max_size=12)
offset_st = st.integers(min_value=-20, max_value=20)


@given(offset_st, counts_st, st.integers(min_value=0, max_value=6))
@settings(max_examples=200, deadline=None)
def test_downscale_conserves_mass_and_brute_force(offset, counts, d):
    """Downscaling never creates or loses observations, and every fine
    bucket i lands in coarse ⌈i/2^d⌉ — checked against a brute-force
    dict accumulation."""
    o2, c2 = _py_nh_downscale(offset, counts, d)
    assert sum(c2) == sum(counts)
    brute: dict[int, int] = {}
    m = 1 << d
    for k, c in enumerate(counts):
        j = -(-(offset + k) // m)  # ceil division
        brute[j] = brute.get(j, 0) + c
    for j, c in enumerate(c2):
        assert brute.get(o2 + j, 0) == c
    assert sum(brute.values()) == sum(c2)


@given(offset_st, counts_st,
       st.integers(min_value=0, max_value=3),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=200, deadline=None)
def test_downscale_composes(offset, counts, d1, d2):
    """downscale(d1) ∘ downscale(d2) == downscale(d1+d2) — the rule
    that makes the min-schema group merge order-independent."""
    o_a, c_a = _py_nh_downscale(*_py_nh_downscale(offset, counts, d1), d2)
    o_b, c_b = _py_nh_downscale(offset, counts, d1 + d2)
    # normalize: strip leading/trailing zero runs (representations may
    # differ in span when counts are empty-ish)
    def norm(o, c):
        while c and c[0] == 0:
            o, c = o + 1, c[1:]
        while c and c[-1] == 0:
            c = c[:-1]
        return (o, c) if c else (None, [])
    assert norm(o_a, c_a) == norm(o_b, c_b)


@given(offset_st, counts_st, offset_st, counts_st)
@settings(max_examples=200, deadline=None)
def test_align_add_commutes_and_conserves(o1, c1, o2, c2):
    oa, ca = _py_nh_align_add(o1, c1, o2, c2)
    ob, cb = _py_nh_align_add(o2, c2, o1, c1)
    assert sum(ca) == sum(c1) + sum(c2)
    # commutative up to the empty-side offset convention
    if c1 and c2:
        assert (oa, ca) == (ob, cb)
    # every absolute index holds the sum of both sides' values there
    for j, c in enumerate(ca):
        i = oa + j
        a = c1[i - o1] if 0 <= i - o1 < len(c1) else 0
        b = c2[i - o2] if 0 <= i - o2 < len(c2) else 0
        assert c == a + b


def test_column_forms_match_python_twins(spark):
    """Batched differential: 60 seeded-random cases through the Column
    `_nh_downscale` / `_nh_align_add` in ONE Spark job, compared
    against the Python twins row by row."""
    from pyspark.sql import functions as F

    from prom_etl_db_spark.operators.promql import (
        _nh_align_add,
        _nh_downscale,
    )

    rng = np.random.RandomState(7)
    rows = []
    for i in range(60):
        n1, n2 = rng.randint(0, 9), rng.randint(0, 9)
        rows.append((
            i,
            int(rng.randint(-15, 15)),
            [int(x) for x in rng.randint(0, 50, n1)],
            int(rng.randint(-15, 15)),
            [int(x) for x in rng.randint(0, 50, n2)],
            int(rng.randint(0, 5)),
        ))
    df = spark.createDataFrame(
        rows, "i int, o1 int, c1 array<bigint>, o2 int, "
              "c2 array<bigint>, d int")
    do, dc = _nh_downscale(F.col("o1"), F.col("c1"), F.col("d"))
    ao, ac = _nh_align_add(
        F.col("o1"), F.col("c1"), F.col("o2"), F.col("c2"))
    got = {
        r["i"]: r for r in df.select(
            "i", do.alias("do"), dc.alias("dc"),
            ao.alias("ao"), ac.alias("ac")).collect()
    }
    for i, o1, c1, o2, c2, d in rows:
        po, pc = _py_nh_downscale(o1, c1, d)
        r = got[i]
        if c1:
            assert (r["do"], list(r["dc"])) == (po, pc), f"case {i}"
        else:
            assert list(r["dc"] or []) == []
        qo, qc = _py_nh_align_add(o1, c1, o2, c2)
        assert list(r["ac"] or []) == qc, f"case {i}"
        if qc:
            assert r["ao"] == qo, f"case {i}"
