"""Sequence packing (functions/packing.py — round 6): first-fit
semantics, truncation, shard independence, and the efficiency stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.packing import pack_sequences, packing_efficiency


def _pack(spark, rows, capacity):
    df = spark.createDataFrame(rows, "shard long, doc_id long, n_tokens int")
    out = pack_sequences(df, capacity=capacity).orderBy("shard", "doc_id")
    return [
        (r["doc_id"], r["bin_idx"], r["offset_in_bin"], r["eff_tokens"], r["truncated"])
        for r in out.collect()
    ]


def test_greedy_first_fit_sequence(spark):
    rows = [(0, 1, 30), (0, 2, 30), (0, 3, 10), (0, 4, 40), (0, 5, 64), (0, 6, 1)]
    got = _pack(spark, rows, 64)
    assert got == [
        (1, 0, 0, 30, False),
        (2, 0, 30, 30, False),   # 60 ≤ 64: same bin
        (3, 1, 0, 10, False),    # 60+10 > 64: new bin
        (4, 1, 10, 40, False),
        (5, 2, 0, 64, False),    # exactly full bin
        (6, 3, 0, 1, False),     # full bin forces the next one
    ]


def test_oversize_truncates_to_one_bin(spark):
    got = _pack(spark, [(0, 1, 10), (0, 2, 200), (0, 3, 10)], 64)
    assert got == [
        (1, 0, 0, 10, False),
        (2, 1, 0, 64, True),   # truncated, owns a full bin
        (3, 2, 0, 10, False),
    ]


def test_shards_pack_independently(spark):
    rows = [(s, s * 10 + i, 40) for s in (0, 1) for i in range(3)]
    got = _pack(spark, rows, 64)
    by_shard = {}
    for doc, b, off, eff, tr in got:
        by_shard.setdefault(doc // 10, []).append(b)
    assert by_shard[0] == by_shard[1] == [0, 1, 2]  # same pattern per shard


def test_efficiency_stats_exact_integer(spark):
    df = spark.createDataFrame(
        [(0, 1, 30), (0, 2, 30), (0, 3, 64)], "shard long, doc_id long, n_tokens int"
    )
    packed = pack_sequences(df, capacity=64)
    stats = packing_efficiency(packed, capacity=64).first()
    assert stats["n_bins"] == 2 and stats["packed_tokens"] == 124
    assert stats["utilization_ppm"] == (124 * 1_000_000) // (2 * 64)


def test_bad_capacity_refused(spark):
    df = spark.createDataFrame([(0, 1, 5)], "shard long, doc_id long, n_tokens int")
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(df, capacity=0)
