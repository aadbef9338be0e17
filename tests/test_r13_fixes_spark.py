"""Round-13 Spark-side regression pins: the suffix-array dense-rank
partitioner rework (deterministic pair buckets; ADVICE r12 hazards)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.suffix import (
    _dense_rank,
    _dense_rank_pairs,
    suffix_array_with_lcp,
)


def _brute_rank(rows):
    """(key -> 0-based dense rank) from plain Python."""
    keys = sorted(set(rows))
    return {k: i for i, k in enumerate(keys)}


def _pair_frame(spark, n, m, seed):
    import random

    rng = random.Random(seed)
    rows = [(i, rng.randrange(m), rng.randrange(-1, m)) for i in range(n)]
    df = spark.createDataFrame(rows, "gpos long, r1 long, r2 long")
    return df, rows


@pytest.mark.parametrize("n,m,seed", [(500, 7, 1), (2000, 97, 2), (300, 1, 3)])
def test_dense_rank_pairs_matches_bruteforce(spark, n, m, seed):
    df, rows = _pair_frame(spark, n, m, seed)
    want = _brute_rank([(r1, r2) for _, r1, r2 in rows])
    got = {r["gpos"]: r["rank"] for r in _dense_rank_pairs(df, m).collect()}
    for gpos, r1, r2 in rows:
        assert got[gpos] == want[(r1, r2)], (gpos, r1, r2)


def test_dense_rank_pairs_matches_range_form(spark):
    df, _ = _pair_frame(spark, 3000, 211, 7)
    a = {r["gpos"]: r["rank"]
         for r in _dense_rank_pairs(df, 211).collect()}
    b = {r["gpos"]: r["rank"] for r in _dense_rank(df, ["r1", "r2"]).collect()}
    assert a == b


def test_dense_rank_correct_with_exchange_reuse_disabled(spark):
    """ADVICE r12: the range-form _dense_rank's rank branch and offsets
    branch must agree on partition boundaries even when the physical
    exchange is NOT shared (range sampling is seeded per upstream
    partition, so identical inputs give identical boundaries)."""
    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        df, rows = _pair_frame(spark, 2000, 53, 11)
        want = _brute_rank([(r1, r2) for _, r1, r2 in rows])
        got = {r["gpos"]: r["rank"]
               for r in _dense_rank(df, ["r1", "r2"]).collect()}
        for gpos, r1, r2 in rows:
            assert got[gpos] == want[(r1, r2)]
        # the array-key (round-0) path, same conf
        docs = spark.createDataFrame(
            [(i, " ".join(f"w{(i * j) % 5}" for j in range(6)))
             for i in range(40)],
            "doc_id long, text string",
        )
        sa = suffix_array_with_lcp(docs).collect()
        assert len({r["sa_rank"] for r in sa}) == len(sa)  # a permutation
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)


def test_sa_lcp_bruteforce_with_new_partitioner(spark):
    """End-to-end SA + LCP differential against a brute-force suffix
    sort on a corpus with ties deeper than SA_INIT_SPAN (forces the
    doubling rounds through _dense_rank_pairs)."""
    texts = [
        "a b c d e f g h i j a b c d e f g h i j k",   # 10-token repeat
        "a b c d e f g h i j x y z",
        "z z z z z z z z z z z z",                      # deep self-ties
        "",
        "q",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = sorted(
        (r["sa_rank"], r["gpos"], r["lcp_prev"])
        for r in suffix_array_with_lcp(docs).collect()
    )

    # brute force over the same token stream (sentinel per doc)
    stream = []
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        toks.append("\x02" + str(i))
        stream.extend(toks)
    n = len(stream)
    suffixes = sorted(range(n), key=lambda p: stream[p:])
    want = []
    for rank, p in enumerate(suffixes):
        if rank == 0:
            lcp = 0
        else:
            q = suffixes[rank - 1]
            lcp = 0
            while (p + lcp < n and q + lcp < n
                   and stream[p + lcp] == stream[q + lcp]):
                lcp += 1
        want.append((rank, p, lcp))
    assert got == want
