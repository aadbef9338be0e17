"""RFC 3986 URL normalization — the canonicalization step URL-level
dedup and crawl-frontier management run on every link.

Reference scope: samzong/prom-etl-db has no URL surface; this is a §2.E
training-data-pipeline extension (web-corpus curation dedups by
canonical URL before any content hashing).

Implements RFC 3986 §6.2.2 syntax-based normalization from the spec,
stdlib-only:

- case: scheme and host lowercased; percent-triplet hex UPPERCASED;
- percent-encoding: triplets decoding to UNRESERVED characters
  (ALPHA / DIGIT / ``-._~``) are decoded; all others (reserved or
  non-ASCII) are preserved — ``%2F`` must NOT become ``/``;
- path: dot-segments removed per the §5.2.4 algorithm (applied after
  percent normalization, the §6.2.2 order, so ``%2E%2E`` is a real
  ``..`` segment); an empty path with an authority becomes ``/``;
- port: default ports dropped (http:80, https:443), empty ``:`` too;
- fragment: dropped (dedup canon — fragments never reach the server);
- query: parameters stably sorted by key (not RFC, but the standard
  crawl-dedup extra; documented divergence), empty query dropped.

The Spark surface is an Arrow-batched pandas UDF (string munging with
an iterative stack algorithm — exactly the case the HOF/Column algebra
can't express); one narrow no-shuffle projection per corpus.
"""

from __future__ import annotations

import re

_URL_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)"
    r"(?:\?([^#]*))?(?:#.*)?$"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED_EXTRA = "-._~"


def _pct_normalize(s: str) -> str:
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch.isascii() and (ch.isalnum() or ch in _UNRESERVED_EXTRA):
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _pct_normalize_host(s: str) -> str:
    """Host variant of :func:`_pct_normalize`: decoded unreserved
    characters are additionally LOWERCASED, because the host is
    case-insensitive and case normalization must see through percent
    encoding — ``h%41`` → ``ha``, not ``hA`` (r6 adversarial-review
    fix: lowercasing only before decode broke idempotence)."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch.isascii() and (ch.isalnum() or ch in _UNRESERVED_EXTRA):
            return ch.lower()
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s.lower())


def _remove_dot_segments(path: str) -> str:
    # RFC 3986 §5.2.4, the five-case loop verbatim
    inp, out = path, []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            seg, inp = (inp[:i], inp[i:]) if i >= 0 else (inp, "")
            out.append(seg)
    return "".join(out)


def normalize_url(url: str) -> str:
    """Canonical form of ``url`` per the module rules. Strings that do
    not parse as URL references come back percent/space-stripped but
    otherwise untouched (quarantine is the caller's concern)."""
    m = _URL_RE.match(url.strip())
    if not m:  # the regex matches any string; defensive
        return url.strip()
    scheme, auth, path, query = m.groups()
    scheme = (scheme or "").lower()
    out = f"{scheme}:" if scheme else ""
    if auth is not None:
        userinfo, _, hostport = auth.rpartition("@")
        if hostport.startswith("[") and "]" in hostport:
            # bracketed IP literal (RFC 3986 §3.2.2): the port colon is
            # the one AFTER ']' — partition-on-first-colon would split
            # inside the IPv6 address (r6 adversarial-review fix; the
            # hex literal lowercases per RFC 5952 canonical form)
            end = hostport.index("]") + 1
            host = hostport[:end].lower()
            rest = hostport[end:]
            colon = ":" if rest.startswith(":") else ""
            port = rest[1:] if colon else ""
        else:
            host, colon, port = hostport.partition(":")
            host = _pct_normalize_host(host)
        if colon and port and port != _DEFAULT_PORTS.get(scheme):
            host += ":" + port
        out += "//" + (_pct_normalize(userinfo) + "@" if userinfo else "") + host
    path = _remove_dot_segments(_pct_normalize(path))
    if auth is not None and not path:
        path = "/"
    out += path
    if query:
        params = query.split("&")
        params.sort(key=lambda p: p.partition("=")[0])  # stable
        out += "?" + "&".join(_pct_normalize(p) for p in params)
    return out


def canonical_col(url):
    """``normalize_url`` as an Arrow-batched Column expression — the
    composition hook pipelines use to canonicalize IN PLACE (keeping
    their other columns) instead of projecting through
    ``canonical_urls`` and re-joining, which would re-execute the
    upstream plan once per branch."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    # hint-free form: the module-level `from __future__ import
    # annotations` would stringify `pd.Series` hints, which pandas_udf
    # rejects with UNSUPPORTED_SIGNATURE
    _canon = F.pandas_udf(
        lambda s: s.map(normalize_url), returnType=StringType()
    )
    return _canon(url)


def canonical_urls(docs, url_col: str = "url", id_col: str = "doc_id"):
    """(id, url) → (id, canonical_url, host, changed) via one
    Arrow-batched pandas UDF projection — narrow plan, no shuffle."""
    from pyspark.sql import functions as F

    canon = canonical_col(F.col(url_col))
    # host group handles the bracketed-IPv6 authority form — '[::1]'
    # contains ':' so the bare [^/?#:]* branch alone would stop at the
    # first colon inside the brackets (ADVICE r6 fix)
    host = F.regexp_extract(
        canon, r"^[a-z][a-z0-9+.\-]*://(?:[^/?#@]*@)?(\[[^\]]*\]|[^/?#:]*)", 1
    )
    return docs.select(
        F.col(id_col),
        canon.alias("canonical_url"),
        host.alias("host"),
        (canon != F.col(url_col)).alias("changed"),
    )


# Multi-label public suffixes under which registrations happen one label
# deeper than the TLD — a representative subset of the public suffix list
# (publicsuffix.org; the full list is external data this environment
# cannot fetch, so the set is a documented built-in covering the major
# ccTLD second-level conventions; swap in the full PSL file in
# production). Single-label TLDs need no listing: the default rule is
# "registered domain = last two labels".
_MULTI_LABEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
    "com.sg", "com.tr", "com.ar", "co.kr", "com.tw",
]


def registered_domain(host):
    """Column: the registrable domain of ``host`` (the unit crawl dedup
    and per-site rate limiting group by — 'a.b.example.co.uk' →
    'example.co.uk', 'www.example.com' → 'example.com'). Pure Column
    algebra (split/slice/array_join), whole-stage codegen, no Python:
    if the last TWO labels form a listed multi-label public suffix the
    registered domain is the last THREE labels, else the last two; a
    host with no more labels than that (a bare suffix or single label)
    is returned whole."""
    from pyspark.sql import functions as F

    labels = F.split(host, r"\.")
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    depth = F.when(last2.isin(_MULTI_LABEL_SUFFIXES), F.lit(3)).otherwise(F.lit(2))
    return F.when(F.size(labels) <= depth, host).otherwise(
        F.array_join(F.slice(labels, -depth, depth), ".")
    )


def url_dedup(docs, url_col: str = "url", id_col: str = "doc_id"):
    """Exact URL-level dedup — the first stage of crawl curation
    (canonicalize, then collapse every syntactic variant of a page to
    one surviving fetch). Output one row per canonical URL:
    (canonical_url, host, registered_domain, keep_doc_id = min id,
    n_dups = variant count).

    Scale shape: one Arrow-batched projection (the normalizer) feeding
    one hash aggregation keyed on canonical_url — partial aggregation
    map-side, no sort, no window. The survivors table is bounded by
    distinct-page count, not fetch count (on a crawl, ~the dedup
    ratio smaller)."""
    from pyspark.sql import functions as F

    canon = canonical_urls(docs, url_col=url_col, id_col=id_col)
    return (
        canon.groupBy("canonical_url", "host")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .withColumn("registered_domain", registered_domain(F.col("host")))
        .select(
            "canonical_url", "host", "registered_domain", "keep_doc_id", "n_dups"
        )
    )


def resolve_reference(base: str, ref: str) -> str:
    """RFC 3986 §5.2 reference resolution (the transform-references
    algorithm verbatim, including the §5.2.3 merge and §5.2.4
    dot-segment removal), recomposed per §5.3. The crawl-pipeline use:
    every href harvested from a page is a URI REFERENCE (relative,
    protocol-relative, query-only, fragment-only, …) that must be
    resolved against the page URL before canonicalization — link-graph
    edges built from raw hrefs are wrong for every relative link.
    Pinned by the spec's own §5.4 normal + abnormal example tables in
    tests/test_urlnorm_resolve.py."""
    bm = _URL_RE.match(base.strip())
    rm = _URL_RE.match(ref.strip())
    b_scheme, b_auth, b_path, b_query = bm.group(1), bm.group(2), bm.group(3), bm.group(4)
    r_scheme, r_auth, r_path, r_query = rm.group(1), rm.group(2), rm.group(3), rm.group(4)
    frag = ref[ref.find("#"):] if "#" in ref else ""
    if r_scheme is not None:
        t = (r_scheme, r_auth, _remove_dot_segments(r_path), r_query)
    elif r_auth is not None:
        t = (b_scheme, r_auth, _remove_dot_segments(r_path), r_query)
    elif r_path == "":
        t = (b_scheme, b_auth, b_path, r_query if r_query is not None else b_query)
    else:
        if r_path.startswith("/"):
            merged = r_path
        elif b_auth is not None and b_path == "":
            merged = "/" + r_path  # §5.2.3 first case
        else:
            merged = b_path[: b_path.rfind("/") + 1] + r_path
        t = (b_scheme, b_auth, _remove_dot_segments(merged), r_query)
    scheme, auth, path, query = t
    out = (scheme + ":") if scheme is not None else ""
    if auth is not None:
        out += "//" + auth
    out += path
    if query is not None:
        out += "?" + query
    return out + frag


#: href attributes of <a> tags, either quote style (the common crawl
#: link-harvest shape; unquoted values are rare and skipped — documented)
_HREF_RE = r"""(?i)<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)')"""


def extract_links(docs, *, html_col: str = "html", base_col: str = "base_url",
                  id_col: str = "doc_id"):
    """(id, base_url, html) → one row per harvested <a href>, RESOLVED
    against the page URL: (id_col, base_url, href, resolved). The
    harvest is pure-Column ``regexp_extract_all`` (JVM regex); the
    resolution is one Arrow-batched pandas UDF over (base, ref) pairs.
    Fragment-only references resolve to the page itself + fragment
    (spec); canonicalization afterwards drops fragments — composition
    order matters and is the documented contract."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    quoted = F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), F.lit(1))
    hrefs = F.filter(
        F.transform(quoted, lambda x: x.substr(F.lit(2), F.length(x) - 2)),
        lambda x: x != "",
    )
    exploded = docs.select(
        F.col(id_col), F.col(base_col), F.explode(hrefs).alias("href")
    )
    _resolve = F.pandas_udf(
        lambda b, r: b.combine(r, resolve_reference), returnType=StringType()
    )
    return exploded.withColumn("resolved", _resolve(F.col(base_col), F.col("href")))
