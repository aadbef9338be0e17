"""robots.txt evaluation (functions/robots.py — round 6): RFC 9309
group selection, longest-match/Allow-tie verdicts, wildcard/$ pattern
translation, LIKE-metacharacter escaping, and the no-rules defaults."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions import robots as R


def _eval(spark, txt: str, paths: list[str], agent: str = "testbot"):
    rb = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    urls = spark.createDataFrame(
        [("h", p) for p in paths], "host string, url_path string"
    )
    rows = R.robots_allowed(urls, rb, agent=agent).collect()
    return {r["url_path"]: (r["allowed"], r["matched_pattern"]) for r in rows}


GROUPED = """# comment line
User-agent: TestBot
Disallow: /private/
Allow: /private/pub$
Crawl-delay: 5

User-agent: OtherBot
Disallow: /

User-agent: *
Disallow: /tmp/*
Allow:
"""


def test_group_selection_specific_wins(spark):
    out = _eval(spark, GROUPED, ["/private/doc", "/private/pub", "/tmp/z", "/x"])
    # TestBot group exists → the '*' group's /tmp/* rule must NOT apply
    assert out["/tmp/z"] == (True, "")
    assert out["/private/doc"] == (False, "/private/")
    # longer $-anchored Allow beats the shorter Disallow prefix
    assert out["/private/pub"] == (True, "/private/pub$")
    assert out["/x"] == (True, "")


def test_group_selection_fallback_to_star(spark):
    out = _eval(spark, GROUPED, ["/tmp/z", "/private/doc"], agent="unknownbot")
    assert out["/tmp/z"] == (False, "/tmp/*")
    # '*' group has no /private rule; OtherBot's 'Disallow: /' must not leak
    assert out["/private/doc"] == (True, "")


def test_agent_match_case_insensitive(spark):
    out = _eval(spark, GROUPED, ["/private/doc"], agent="TESTBOT")
    assert out["/private/doc"] == (False, "/private/")


def test_dollar_anchor_exact_only(spark):
    txt = "User-agent: *\nDisallow: /a$\n"
    out = _eval(spark, txt, ["/a", "/ab", "/a/"])
    assert out["/a"] == (False, "/a$")
    assert out["/ab"] == (True, "")
    assert out["/a/"] == (True, "")


def test_mid_pattern_wildcard_and_star_dollar(spark):
    txt = "User-agent: *\nDisallow: /q/*/sub\nDisallow: /dl/*$\n"
    out = _eval(spark, txt, ["/q/a/sub", "/q/a/b/subx", "/q/sub", "/dl/x", "/dlx"])
    assert out["/q/a/sub"][0] is False
    assert out["/q/a/b/subx"][0] is False  # prefix match past the pattern
    assert out["/q/sub"][0] is True  # '*' needs the middle segment? no —
    # '*' matches empty too: /q/*/sub ⇒ LIKE '/q/%/sub%' ⇒ '/q//sub' not '/q/sub'
    assert out["/dl/x"][0] is False
    assert out["/dlx"][0] is True


def test_like_metacharacters_stay_literal(spark):
    txt = "User-agent: *\nDisallow: /p_x\nDisallow: /pc%y\n"
    out = _eval(spark, txt, ["/p_x", "/pax", "/pc%y", "/pczy"])
    assert out["/p_x"][0] is False
    assert out["/pax"][0] is True  # '_' must not act as LIKE single-char
    assert out["/pc%y"][0] is False
    assert out["/pczy"][0] is True  # '%' must not act as LIKE wildcard


def test_allow_wins_length_ties(spark):
    txt = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    out = _eval(spark, txt, ["/page1"])
    assert out["/page1"] == (True, "/page")


def test_empty_disallow_matches_nothing(spark):
    txt = "User-agent: *\nDisallow:\n"
    out = _eval(spark, txt, ["/anything"])
    assert out["/anything"] == (True, "")


def test_empty_group_suppresses_star_fallback(spark):
    """RFC 9309: a group that NAMES the agent excludes the '*' fallback
    even when its only rule is an empty Disallow (the common
    allow-everything idiom) — membership is decided by User-agent
    lines, not by surviving rules (ADVICE r6 fix)."""
    txt = "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    out = _eval(spark, txt, ["/a", "/b/c"], agent="mybot")
    assert out["/a"] == (True, "")
    assert out["/b/c"] == (True, "")
    # everyone else still gets the '*' lockout
    out = _eval(spark, txt, ["/a"], agent="elsebot")
    assert out["/a"] == (False, "/")


def test_empty_group_via_dropped_rules_only(spark):
    """Same suppression when the agent's group has ONLY unusable lines
    (a comment and an empty Allow)."""
    txt = "User-agent: mybot\nAllow:\n# nothing\n\nUser-agent: *\nDisallow: /x\n"
    out = _eval(spark, txt, ["/x1"], agent="mybot")
    assert out["/x1"] == (True, "")


def test_multi_agent_run_shares_rules(spark):
    txt = "User-agent: alpha\nUser-agent: beta\nDisallow: /x\n"
    for agent in ("alpha", "beta"):
        out = _eval(spark, txt, ["/x1"], agent=agent)
        assert out["/x1"] == (False, "/x")
    # an agent in neither run and no '*' group ⇒ everything allowed
    out = _eval(spark, txt, ["/x1"], agent="gamma")
    assert out["/x1"] == (True, "")


def test_rules_before_any_group_dropped(spark):
    txt = "Disallow: /lost\nUser-agent: *\nDisallow: /kept\n"
    out = _eval(spark, txt, ["/lost1", "/kept1"])
    assert out["/lost1"] == (True, "")
    assert out["/kept1"] == (False, "/kept")


def test_host_without_robots_is_allowed(spark):
    rb = spark.createDataFrame(
        [("h1", "User-agent: *\nDisallow: /\n")], "host string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [("h1", "/a"), ("h2", "/a")], "host string, url_path string"
    )
    rows = {
        (r["host"], r["url_path"]): r["allowed"]
        for r in R.robots_allowed(urls, rb, agent="bot").collect()
    }
    assert rows[("h1", "/a")] is False
    assert rows[("h2", "/a")] is True


def test_directive_case_and_whitespace(spark):
    txt = "  user-AGENT :  *  \n  DISALLOW : /a # trailing comment\n"
    out = _eval(spark, txt, ["/a1"])
    assert out["/a1"] == (False, "/a")


def test_plan_is_pure_column(spark):
    """No Python evaluation anywhere in the plan — the gate must be
    whole-stage-codegen JVM work."""
    rb = spark.createDataFrame([("h", GROUPED)], "host string, robots_txt string")
    urls = spark.createDataFrame([("h", "/x")], "host string, url_path string")
    plan = R.robots_allowed(urls, rb, agent="testbot")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_crlf_line_endings(spark):
    txt = "User-agent: *\r\nDisallow: /a\r\nAllow: /a/pub\r\n"
    out = _eval(spark, txt, ["/a/x", "/a/pub2"])
    # '\r' must be stripped from values, not glued onto patterns
    assert out["/a/x"] == (False, "/a")
    assert out["/a/pub2"] == (True, "/a/pub")


def test_sitemap_directives_group_independent(spark):
    txt = (
        "User-agent: a\nDisallow: /x\n"
        "Sitemap: https://h/s1.xml\n"
        "User-agent: b\n"
        "SITEMAP: https://h/s2.xml # comment\n"
        "sitemapx: nope\nSitemap:\n"
    )
    rb = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    got = sorted(r["sitemap_url"] for r in R.sitemap_directives(rb).collect())
    assert got == ["https://h/s1.xml", "https://h/s2.xml"]


def test_agent_crawl_delay_group_selection(spark):
    rb = spark.createDataFrame(
        [
            ("h1", "User-agent: bot\nCrawl-delay: 3\nUser-agent: *\nCrawl-delay: 9\n"),
            ("h2", "User-agent: *\nCrawl-delay: 2.5\n"),
            ("h3", "User-agent: other\nCrawl-delay: 7\n"),  # no rule for bot → default
            ("h4", "User-agent: *\nCrawl-delay: junk\nCrawl-delay: 4\nCrawl-delay: 6\n"),
            # group NAMES bot but has no usable delay → membership
            # suppresses the '*' fallback, default applies (ADVICE r6 fix)
            ("h5", "User-agent: bot\nDisallow: /x\nUser-agent: *\nCrawl-delay: 9\n"),
            ("h6", "User-agent: bot\nCrawl-delay: junk\nUser-agent: *\nCrawl-delay: 9\n"),
        ],
        "host string, robots_txt string",
    )
    got = {
        r["host"]: r["delay_s"]
        for r in R.agent_crawl_delay(rb, agent="BOT", default_delay_s=1.0).collect()
    }
    # min wins; junk skipped; h5/h6: named group without delay → default
    assert got == {"h1": 3.0, "h2": 2.5, "h3": 1.0, "h4": 4.0, "h5": 1.0, "h6": 1.0}
