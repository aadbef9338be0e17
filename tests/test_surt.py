"""SURT/CDX (functions/surt.py — round 6): key transform vectors, the
contiguous-range property, and the range-partitioned lookup layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions import surt as S


def _keys(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(S.surt_key(F.col("url")).alias("s")).collect()
    return [r["s"] for r in rows]


def test_transform_vectors(spark):
    got = _keys(
        spark,
        [
            "http://example.com/",
            "http://example.com",  # empty path → '/'
            "http://www.example.com/a/b?q=1",
            "https://a.b.site.co.uk/p?x=2",
            "http://wwww.example.com/x",  # only a literal 'www.' drops
            "http://www.com/x",  # www. drop leaves the TLD alone
        ],
    )
    assert got == [
        "com,example)/",
        "com,example)/",
        "com,example)/a/b?q=1",
        "uk,co,site,b,a)/p?x=2",
        "com,example,wwww)/x",
        "com)/x",
    ]


def test_domain_range_is_contiguous(spark):
    """The load-bearing property: every URL of a registered domain and
    its subdomains sorts into one contiguous SURT range."""
    inside = [
        "http://example.com/z",
        "http://a.example.com/1",
        "http://b.c.example.com/2",
        "http://www.example.com/",
    ]
    outside = [
        "http://examplea.com/x",  # sibling domain that shares a prefix
        "http://example.org/x",
        "http://com.example.net/x",
    ]
    keys = _keys(spark, inside + outside)
    lo, hi = "com,example", "com,example" + "￿"
    in_range = [lo <= k < hi and (k.startswith("com,example)") or k.startswith("com,example,")) for k in keys]
    assert in_range == [True] * len(inside) + [False] * len(outside)


def test_cdx_index_layout_and_lookup(spark):
    caps = spark.createDataFrame(
        [
            ("http://site1.com/a", 3),
            ("http://site1.com/a", 1),
            ("http://site1.com/b", 2),
            ("http://site2.com/a", 1),
            ("http://www.site1.com/c", 9),
        ],
        "url string, capture_ts long",
    )
    idx = S.cdx_index(caps, n_shards=4)
    hits = S.cdx_prefix_lookup(idx, "com,site1)").collect()
    assert len(hits) == 4
    assert all(h["surt"].startswith("com,site1)") for h in hits)
    # per-partition the layout is (surt, ts)-sorted — the archive shard
    # discipline a binary-search lookup needs
    parts = idx.select("surt", "capture_ts").rdd.glom().collect()
    for p in parts:
        assert p == sorted(p)
    # and the lookup is a RANGE predicate (shard-prunable), not a LIKE
    plan = S.cdx_prefix_lookup(idx, "com,site1)")._jdf.queryExecution().executedPlan().toString()
    assert "LIKE" not in plan


def test_pure_column_plan(spark):
    df = spark.createDataFrame([("http://x.com/",)], "url string")
    plan = df.select(S.surt_key(F.col("url")))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
