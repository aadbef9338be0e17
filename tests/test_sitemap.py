"""Sitemap parsing + frontier scheduling (functions/sitemap.py — r6):
entity-decode ordering, element-order independence, defaults, index
classification, and the politeness invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions import sitemap as S


def _entries(spark, xml: str):
    df = spark.createDataFrame([("h", xml)], "host string, xml string")
    return [r.asDict() for r in S.sitemap_entries(df).orderBy("loc").collect()]


def test_entries_order_independent_and_defaults(spark):
    xml = (
        "<urlset>"
        "<url><priority>0.9</priority><loc>http://h/a</loc></url>"
        "<url><loc>http://h/b</loc><lastmod>2024-02-01</lastmod>"
        "<changefreq>WEEKLY</changefreq><priority>0.2</priority></url>"
        "<url><loc>http://h/c</loc></url>"
        "</urlset>"
    )
    got = _entries(spark, xml)
    assert [(e["loc"], e["lastmod"], e["changefreq"], e["priority"]) for e in got] == [
        ("http://h/a", None, None, 0.9),
        ("http://h/b", "2024-02-01", "weekly", 0.2),
        ("http://h/c", None, None, 0.5),
    ]


def test_entity_decode_order_no_double_decode(spark):
    # &amp;lt; must decode to the five chars '&lt;', NOT to '<'
    xml = "<urlset><url><loc>http://h/p?a=1&amp;b=2&amp;lt;x</loc></url></urlset>"
    got = _entries(spark, xml)
    assert got[0]["loc"] == "http://h/p?a=1&b=2&lt;x"


def test_whitespace_and_case_tolerance(spark):
    xml = "<URLSET><URL ><LOC>\n  http://h/x \n</LOC></URL ></URLSET>"
    got = _entries(spark, xml)
    assert got[0]["loc"] == "http://h/x"


def test_missing_loc_dropped_and_bad_priority_defaults(spark):
    xml = (
        "<urlset><url><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>http://h/y</loc><priority>high</priority></url></urlset>"
    )
    got = _entries(spark, xml)
    assert len(got) == 1
    assert got[0]["priority"] == 0.5  # unparseable priority → spec default


def test_sitemap_index_classified_not_parsed(spark):
    idx = (
        '<sitemapindex><sitemap><loc>http://h/s1.xml</loc></sitemap></sitemapindex>'
    )
    df = spark.createDataFrame([("h", idx)], "host string, xml string")
    assert S.sitemap_entries(df).count() == 0  # no <url> blocks
    flag = df.select(S.is_sitemap_index(F.col("xml")).alias("i")).first()["i"]
    assert flag is True
    reg = spark.createDataFrame([("h", "<urlset></urlset>")], "host string, xml string")
    assert reg.select(S.is_sitemap_index(F.col("xml")).alias("i")).first()["i"] is False


def test_frontier_politeness_invariant(spark):
    urls = spark.createDataFrame(
        [
            ("h1", "/a", 0.9), ("h1", "/b", 0.9), ("h1", "/c", 0.1),
            ("h2", "/z", 0.5), ("h2", "/a", 0.5),
        ],
        "host string, url string, priority double",
    )
    rows = S.frontier_schedule(urls).collect()
    # no host twice in a slot; slots contiguous from 1 per host
    seen = {}
    for r in rows:
        assert (r["host"], r["slot"]) not in seen
        seen[(r["host"], r["slot"])] = r["url"]
    assert seen[("h1", 1)] == "/a"  # priority tie → url ASC tiebreak
    assert seen[("h1", 2)] == "/b"
    assert seen[("h1", 3)] == "/c"
    assert seen[("h2", 1)] == "/a"
    assert seen[("h2", 2)] == "/z"


def test_pure_column_plans(spark):
    df = spark.createDataFrame([("h", "<urlset></urlset>")], "host string, xml string")
    plan = S.sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_url_and_loc_tags_with_attributes(spark):
    xml = ('<urlset><url id="a"><loc xmlns:x="y">http://h/p</loc></url>'
           "<url><loc>http://h/q</loc></url></urlset>")
    got = _entries(spark, xml)
    assert [e["loc"] for e in got] == ["http://h/p", "http://h/q"]
    # '<urlset>' itself must NOT match the attribute-tolerant <url…> form
    assert len(got) == 2


def test_xml_tail_matches_regex_path_on_plain_input(spark):
    """The r7 ElementTree tail and the regex fast path must agree on
    plain (entity-free, namespace-free) sitemaps — the routing
    contract."""
    xml = (
        "<urlset>"
        "<url><loc>http://h/a</loc><lastmod>2024-01-01</lastmod>"
        "<priority>0.8</priority><changefreq>DAILY</changefreq></url>"
        "<url><priority>0.2</priority><loc>http://h/b</loc></url>"
        "<url><lastmod>x</lastmod></url>"  # no loc -> dropped
        "</urlset>"
    )
    df = spark.createDataFrame([("h", xml)], "host string, xml string")
    a = sorted(map(tuple, S.sitemap_entries(df).collect()))
    b = sorted(map(tuple, S.sitemap_entries_xml(df).collect()))
    assert a == b and len(a) == 2


def test_xml_tail_handles_cdata_entities_namespace(spark):
    """The cases the documented regex subset cannot serve: CDATA locs,
    numeric character references, and the sitemaps.org namespace."""
    xml = (
        '<ns:urlset xmlns:ns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<ns:url><ns:loc><![CDATA[http://h/p?a=1&b=2]]></ns:loc></ns:url>"
        "<ns:url><ns:loc>http://h/caf&#233;</ns:loc>"
        "<ns:priority>0.9</ns:priority></ns:url>"
        "</ns:urlset>"
    )
    df = spark.createDataFrame([("h", xml)], "host string, xml string")
    got = {r["loc"]: r["priority"] for r in S.sitemap_entries_xml(df).collect()}
    assert got == {"http://h/p?a=1&b=2": 0.5, "http://h/café": 0.9}
    # the regex path cannot see through CDATA — that's WHY the tail exists
    regex_locs = {r["loc"] for r in S.sitemap_entries(df).collect()}
    assert "http://h/p?a=1&b=2" not in regex_locs


def test_xml_tail_malformed_and_index_contribute_nothing(spark):
    rows = [
        ("h1", "<urlset><url><loc>http://h/ok</loc></url>"),  # unclosed
        ("h2", "<sitemapindex><sitemap><loc>http://h/s.xml</loc></sitemap></sitemapindex>"),
        ("h3", "<urlset><url><loc>http://h/good</loc></url></urlset>"),
    ]
    df = spark.createDataFrame(rows, "host string, xml string")
    got = [(r["host"], r["loc"]) for r in S.sitemap_entries_xml(df).collect()]
    assert got == [("h3", "http://h/good")]
