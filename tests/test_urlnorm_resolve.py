"""RFC 3986 §5 reference resolution + link harvesting
(functions/urlnorm.py — round 6): the spec's own §5.4 example tables,
merge edge cases, and the Spark extraction plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.urlnorm import extract_links, resolve_reference

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 — normal examples, verbatim
NORMAL = {
    "g": "http://a/b/c/g",
    "./g": "http://a/b/c/g",
    "g/": "http://a/b/c/g/",
    "/g": "http://a/g",
    "//g": "http://g",
    "?y": "http://a/b/c/d;p?y",
    "g?y": "http://a/b/c/g?y",
    "#s": "http://a/b/c/d;p?q#s",
    "g#s": "http://a/b/c/g#s",
    "g?y#s": "http://a/b/c/g?y#s",
    ";x": "http://a/b/c/;x",
    "g;x": "http://a/b/c/g;x",
    "g;x?y#s": "http://a/b/c/g;x?y#s",
    "": "http://a/b/c/d;p?q",
    ".": "http://a/b/c/",
    "./": "http://a/b/c/",
    "..": "http://a/b/",
    "../": "http://a/b/",
    "../g": "http://a/b/g",
    "../..": "http://a/",
    "../../": "http://a/",
    "../../g": "http://a/g",
}

# RFC 3986 §5.4.2 — abnormal examples, verbatim (strict parser: the
# 'http:g' case keeps the reference's scheme)
ABNORMAL = {
    "../../../g": "http://a/g",
    "../../../../g": "http://a/g",
    "/./g": "http://a/g",
    "/../g": "http://a/g",
    "g.": "http://a/b/c/g.",
    ".g": "http://a/b/c/.g",
    "g..": "http://a/b/c/g..",
    "..g": "http://a/b/c/..g",
    "./../g": "http://a/b/g",
    "./g/.": "http://a/b/c/g/",
    "g/./h": "http://a/b/c/g/h",
    "g/../h": "http://a/b/c/h",
    "g;x=1/./y": "http://a/b/c/g;x=1/y",
    "g;x=1/../y": "http://a/b/c/y",
    "g?y/./x": "http://a/b/c/g?y/./x",
    "g?y/../x": "http://a/b/c/g?y/../x",
    "g#s/./x": "http://a/b/c/g#s/./x",
    "g#s/../x": "http://a/b/c/g#s/../x",
    "http:g": "http:g",
}


def test_rfc_5_4_1_normal_examples():
    for ref, want in NORMAL.items():
        assert resolve_reference(BASE, ref) == want, ref


def test_rfc_5_4_2_abnormal_examples():
    for ref, want in ABNORMAL.items():
        assert resolve_reference(BASE, ref) == want, ref


def test_merge_against_authority_with_empty_path():
    # §5.2.3 first case: base has authority + empty path
    assert resolve_reference("http://h", "g") == "http://h/g"
    assert resolve_reference("http://h?q", "g") == "http://h/g"


def test_absolute_ref_still_dot_normalized():
    assert resolve_reference(BASE, "http://x/a/../b") == "http://x/b"


def test_extract_links_both_quotes_and_empty_skip(spark):
    html = (
        '<p>x</p><a href="/one">1</a><A HREF=\'two\'>2</A>'
        '<a href="">empty</a><a name=n>no href</a>'
        '<a data-x="y" href="#f">3</a>'
    )
    df = spark.createDataFrame(
        [(1, "http://h/base/page", html)], "doc_id int, base_url string, html string"
    )
    rows = extract_links(df).orderBy("href").collect()
    got = [(r["href"], r["resolved"]) for r in rows]
    assert got == [
        ("#f", "http://h/base/page#f"),
        ("/one", "http://h/one"),
        ("two", "http://h/base/two"),
    ]


def test_extract_links_plan_is_arrow(spark):
    df = spark.createDataFrame(
        [(1, "http://h/", '<a href="x">y</a>')],
        "doc_id int, base_url string, html string",
    )
    plan = extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
