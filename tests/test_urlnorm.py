"""RFC 3986 URL normalization (functions/urlnorm.py — round 5): spec
examples, each §6.2.2 rule in isolation, idempotence, and hostile
inputs. These vectors are disjoint from the gate fixture's strata — the
registry docstring's claim that the normalizer is general, not
stratum-driven, rests here."""

import pytest

from prom_etl_db_spark.functions.urlnorm import (
    _remove_dot_segments,
    normalize_url,
)


def test_rfc_5_2_4_examples():
    # the two worked examples in RFC 3986 §5.2.4
    assert _remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert _remove_dot_segments("mid/content=5/../6") == "mid/6"


@pytest.mark.parametrize(
    "raw,want",
    [
        # case normalization
        ("HtTp://ExAmPlE.cOm/Path", "http://example.com/Path"),
        # percent: unreserved decoded, reserved preserved + uppercased
        ("http://h/%61%62%2f%3A", "http://h/ab%2F%3A"),
        ("http://h/%7e%2D%2e%5F", "http://h/~-._"),
        # default ports (scheme-specific) and empty colon
        ("http://h:80/", "http://h/"),
        ("https://h:443/", "https://h/"),
        ("http://h:443/", "http://h:443/"),
        ("http://h:/x", "http://h/x"),
        # dot segments incl. leading over-traversal and %2E forms
        ("http://h/a/b/../../../c", "http://h/c"),
        ("http://h/%2E%2E/a", "http://h/a"),
        ("http://h/a/%2e/b", "http://h/a/b"),
        # empty path with authority
        ("http://h", "http://h/"),
        ("http://h?q=1", "http://h/?q=1"),
        # fragment dropped, empty query dropped
        ("http://h/p#sec", "http://h/p"),
        ("http://h/p?", "http://h/p"),
        # stable param sort keeps duplicate-key order
        ("http://h/?b=2&a=1&b=1", "http://h/?a=1&b=2&b=1"),
        ("http://h/?flag&a=1", "http://h/?a=1&flag"),
        # userinfo preserved, host case folded behind it
        ("http://U:p@H.COM/x", "http://U:p@h.com/x"),
        # scheme-relative and relative references
        ("//H.com/A/./b", "//h.com/A/b"),
        ("a/b/../c?y=2&x=1", "a/c?x=1&y=2"),
        # non-ASCII percent triplets preserved (never decoded)
        ("http://h/%C3%A9", "http://h/%C3%A9"),
    ],
)
def test_normalization_rules(raw, want):
    assert normalize_url(raw) == want


def test_idempotent_on_canonical_forms():
    for u in (
        "http://example.com/a/c?a=1&b=2",
        "https://h/x%2Fy",
        "http://h:8080/",
        "ftp://h:21/f",
    ):
        assert normalize_url(u) == u
        assert normalize_url(normalize_url(u)) == normalize_url(u)


def test_hostile_inputs_do_not_crash():
    for u in ("", "   ", "%", "%zz", "http://", "::::", "?#", "a" * 5000):
        out = normalize_url(u)
        assert isinstance(out, str)
    # lone percent and bad hex are preserved, not mangled
    assert normalize_url("http://h/%zz") == "http://h/%zz"
    assert normalize_url("http://h/%a") == "http://h/%a"


# --- round 6: registered domain + URL dedup + blocked near-dup ----------


@pytest.mark.parametrize(
    "host,want",
    [
        ("www.example.com", "example.com"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("co.uk", "co.uk"),          # bare public suffix: returned whole
        ("deep.cdn.site.org", "site.org"),
        ("site.example", "site.example"),  # unlisted TLD, 2 labels
        ("localhost", "localhost"),        # single label
        ("x.com.au", "x.com.au"),
        ("a.x.com.au", "x.com.au"),
    ],
)
def test_registered_domain(spark, host, want):
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions.urlnorm import registered_domain

    df = spark.createDataFrame([(host,)], "host string")
    assert df.select(registered_domain(F.col("host")).alias("d")).first()["d"] == want


def test_url_dedup_collapses_syntactic_variants(spark):
    from prom_etl_db_spark.functions.urlnorm import url_dedup

    df = spark.createDataFrame(
        [
            (1, "http://www.Site.com:80/a/../p?b=2&a=1#f"),
            (2, "http://www.site.com/p?a=1&b=2"),
            (3, "HTTP://WWW.SITE.COM/./p?a=1&b=2"),
            (4, "http://other.co.uk/q"),
        ],
        "doc_id long, url string",
    )
    rows = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert set(rows) == {"http://www.site.com/p?a=1&b=2", "http://other.co.uk/q"}
    main = rows["http://www.site.com/p?a=1&b=2"]
    assert (main["keep_doc_id"], main["n_dups"]) == (1, 3)
    assert main["registered_domain"] == "site.com"
    other = rows["http://other.co.uk/q"]
    assert (other["keep_doc_id"], other["n_dups"]) == (4, 1)
    assert other["registered_domain"] == "other.co.uk"


def test_canonical_urls_ipv6_host(spark):
    """Bracketed IPv6 authorities keep the whole bracket form as host —
    the bare [^/?#:]* branch used to stop at the first inner colon and
    yield '[2001' (ADVICE r6 fix); consistent with normalize_url's own
    IPv6 branch."""
    from prom_etl_db_spark.functions.urlnorm import canonical_urls

    df = spark.createDataFrame(
        [
            (1, "http://[2001:db8::1]/x"),
            (2, "http://[::1]:8080/y?b=2&a=1"),
            (3, "http://user@[2001:db8::2]:80/z"),
            (4, "http://plain.example.com:443/w"),
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["host"] for r in canonical_urls(df).collect()}
    assert got[1] == "[2001:db8::1]"
    assert got[2] == "[::1]"
    assert got[3] == "[2001:db8::2]"
    assert got[4] == "plain.example.com"


def test_blocked_jaccard_pairs_only_within_block(spark):
    from prom_etl_db_spark.functions.dedup import ngram_jaccard_dup_pairs

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    near = base.replace("upsilon", "phi")
    df = spark.createDataFrame(
        [
            (1, "h1", base),
            (2, "h1", near),      # same block → must pair
            (3, "h2", base),      # identical text, other block → must NOT
            (4, "h2", near),      # pairs with 3 inside h2
        ],
        "doc_id long, host string, text string",
    )
    got = {
        (r["id_a"], r["id_b"], r["host"])
        for r in ngram_jaccard_dup_pairs(
            df, threshold=0.3, block_col="host"
        ).collect()
    }
    assert got == {(1, 2, "h1"), (3, 4, "h2")}
