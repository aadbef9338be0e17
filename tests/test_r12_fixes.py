"""Round-12 regression tests (optimization round).

1. ``native_hist_changes_and_resets`` gains the 4096 dense-expansion
   bomb guard its sibling ``native_hist_increase`` got in r11 (VERDICT
   r11 What's-wrong #1): the per-PAIR reset test materializes a
   sequence over the union of two consecutive samples' absolute bucket
   index ranges, so two far-apart offsets from a buggy producer must
   refuse loudly instead of building a multi-million-element array per
   pair row. The streaming twin's Python pair walk is bounded the same
   way (a protocol violation refuses; the visible-not-fatal ``n_late``
   convention is reserved for legal data races).
2. The r12 suffix-array rewrite (SA_INIT_SPAN=8 initial rank + in-place
   dense rank + LCP remainder compare) keeps exact SA/LCP values —
   pinned against a brute-force Python suffix sort over a corpus with
   ties deeper than SA_INIT_SPAN (so the doubling rounds AND the
   remainder path both exercise).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row

T0 = datetime(2024, 1, 29, 0, 0)
T1 = datetime(2024, 1, 29, 0, 5)
T2 = datetime(2024, 1, 29, 0, 10)

NH = (
    "labels map<string,string>, ts timestamp, schema int, "
    "zero_count long, pos_offset int, pos_counts array<long>"
)


def test_changes_resets_span_bomb_guard(spark):
    """Two consecutive samples whose offsets sit > 4096 indices apart
    refuse loudly (the native_hist_increase r11 guard, applied to the
    pair walk)."""
    from prom_etl_db_spark.operators.native_hist import (
        native_hist_changes_and_resets,
    )

    rows = [
        Row(labels={"n": "s"}, ts=T0, schema=0, zero_count=0,
            pos_offset=0, pos_counts=[1]),
        Row(labels={"n": "s"}, ts=T1, schema=0, zero_count=0,
            pos_offset=10_000, pos_counts=[2]),
    ]
    with pytest.raises(Exception, match="bomb guard"):
        native_hist_changes_and_resets(
            spark.createDataFrame(rows, NH)).collect()
    # a legal far-but-bounded span still evaluates: growth across a
    # wide occupied range is one change, no reset
    ok = [
        Row(labels={"n": "s"}, ts=T0, schema=0, zero_count=0,
            pos_offset=0, pos_counts=[1]),
        Row(labels={"n": "s"}, ts=T1, schema=0, zero_count=0,
            pos_offset=0, pos_counts=[1] + [0] * 99 + [2]),
    ]
    (r,) = native_hist_changes_and_resets(
        spark.createDataFrame(ok, NH)).collect()
    assert r["n_changes"] == 1.0 and r["n_resets"] == 0.0


def test_streaming_pair_walk_bomb_guard():
    """The streaming twin's Python pair walk refuses the same spans the
    batch guard refuses, and still counts legal pairs."""
    from prom_etl_db_spark.streaming.stateful import _py_nh_pair_reset

    # (schema, zero, po, pc, no, nc, count, sum)
    a = (0, 0, 0, [1], 0, [], 5, None)
    bomb = (0, 0, 10_000, [2], 0, [], 9, None)
    with pytest.raises(ValueError, match="bomb guard"):
        _py_nh_pair_reset(a, bomb)
    grow = (0, 0, 0, [1] + [0] * 99 + [2], 0, [], 9, None)
    assert _py_nh_pair_reset(a, grow) is False
    drop = (0, 0, 0, [0], 0, [], 9, None)
    assert _py_nh_pair_reset(a, drop) is True


def _brute_sa_lcp(docs: list[tuple[int, str]]):
    """Reference SA+LCP over the token stream, the module's exact
    semantics: lowercased whitespace tokens + per-doc sentinel, global
    lexicographic suffix order, token-level LCP with the SA-previous
    suffix."""
    toks: list[str] = []
    meta: list[tuple[int, int]] = []  # (doc_id, pos)
    for doc_id, text in docs:
        words = [w for w in text.lower().split() if w]
        words.append("\x02" + str(doc_id))
        for pos, w in enumerate(words):
            meta.append((doc_id, pos))
            toks.append(w)
    n = len(toks)
    order = sorted(range(n), key=lambda i: toks[i:])
    out = []
    for r, g in enumerate(order):
        if r == 0:
            lcp = 0
        else:
            p = order[r - 1]
            lcp = 0
            while (g + lcp < n and p + lcp < n
                   and toks[g + lcp] == toks[p + lcp]):
                lcp += 1
        out.append((r, g, meta[g][0], meta[g][1], lcp))
    return out


def test_sa_lcp_exact_vs_bruteforce_with_deep_ties(spark):
    """Ties deeper than SA_INIT_SPAN force doubling rounds past the
    initial 8-token rank; LCP values below 8 exercise the remainder
    compare. Both must match the brute-force suffix sort exactly."""
    from prom_etl_db_spark.functions.suffix import suffix_array_with_lcp

    docs = [
        (1, "a b c d e f g h i j k a b c d e f g h i j z"),
        (2, "a b c d e f g h i j k a b c d e f g h i j z"),
        (3, "x a b c x a b d"),
        (4, ""),
        (5, "q"),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs], "doc_id long, text string"
    )
    got = sorted(
        (r["sa_rank"], r["gpos"], r["doc_id"], r["pos"], r["lcp_prev"])
        for r in suffix_array_with_lcp(df).collect()
    )
    want = sorted(_brute_sa_lcp(docs))
    assert got == want
