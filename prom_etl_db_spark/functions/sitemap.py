"""Sitemap parsing (sitemaps.org protocol) and crawl-frontier
scheduling.

Reference scope: samzong/prom-etl-db has no web surface; these are
§2.E training-data-pipeline extensions (round 6) — sitemaps are the
crawl-discovery input the robots gate points at (``Sitemap:`` lines),
and frontier scheduling is how a polite crawler turns discovered URLs
into fetch order. Both specs are public: sitemaps.org/protocol.html
(the <urlset>/<url>/<loc>/<lastmod>/<changefreq>/<priority> schema and
the <sitemapindex> nesting), and the one-fetch-per-host-per-slot
politeness convention every production crawler documents.

Documented subset (DIVERGENCES.md): element-order-independent regex
extraction of the four standard child elements; CDATA and XML entities
beyond the five predefined ones are not decoded (sitemap <loc> values
are URLs — entity-bearing locs are vanishingly rare and a real
deployment would front an XML parser); nested <sitemapindex> files are
classified, not recursively fetched (no network in this environment).

Spark shape: pure Column end to end — one regexp_extract_all over
<url> blocks, explode, four per-block regexp_extracts, five-entity
unescape as a replace chain. The frontier schedule is ONE window
(row_number per host ordered by (-priority, url)): the per-host sort
is the semantics — a host's fetch order IS a sequence — and hosts
partition the work, so the window never sees more than one host's
frontier (the skew posture: a pathological host bounded by its own
URL count, mitigated by per-host frontier caps in production).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_URL_BLOCK_RE = r"(?is)<url(?:\s[^>]*)?>(.*?)</url\s*>"
_LOC_RE = r"(?is)<loc(?:\s[^>]*)?>\s*(.*?)\s*</loc\s*>"
_LASTMOD_RE = r"(?is)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"
_CHANGEFREQ_RE = r"(?is)<changefreq\s*>\s*(.*?)\s*</changefreq\s*>"
_PRIORITY_RE = r"(?is)<priority\s*>\s*(.*?)\s*</priority\s*>"


def _xml_unescape(c: Column) -> Column:
    """The five predefined XML entities, &amp; last so freshly-decoded
    ampersands cannot re-trigger earlier replacements (the classic
    double-decode bug — &amp;lt; must yield '&lt;', not '<')."""
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")]:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def sitemap_entries(
    sitemaps: DataFrame, *, xml_col: str = "xml", key_cols: tuple[str, ...] = ("host",)
) -> DataFrame:
    """One row per <url> entry across all sitemap documents:
    (key_cols…, loc, lastmod, changefreq, priority double). Missing
    optional elements come back NULL; priority defaults to the spec's
    0.5 when absent. A <sitemapindex> document contains no <url>
    blocks and so contributes no rows (classify with
    :func:`is_sitemap_index`)."""
    blocks = sitemaps.select(
        *key_cols,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), F.lit(1))
        ).alias("blk"),
    )
    loc = _xml_unescape(F.regexp_extract("blk", _LOC_RE, 1))
    lastmod = F.nullif(F.regexp_extract("blk", _LASTMOD_RE, 1), F.lit(""))
    changefreq = F.nullif(
        F.lower(F.regexp_extract("blk", _CHANGEFREQ_RE, 1)), F.lit("")
    )
    priority = F.coalesce(
        F.nullif(F.regexp_extract("blk", _PRIORITY_RE, 1), F.lit("")).try_cast("double"),
        F.lit(0.5),
    )
    return blocks.select(
        *key_cols,
        loc.alias("loc"),
        lastmod.alias("lastmod"),
        changefreq.alias("changefreq"),
        priority.alias("priority"),
    ).where(F.col("loc") != "")


def is_sitemap_index(xml: Column) -> Column:
    """True when the document is a <sitemapindex> (nested sitemap list)."""
    return xml.rlike(r"(?is)<\s*sitemapindex[\s>]")


def frontier_schedule(
    urls: DataFrame,
    *,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
) -> DataFrame:
    """Polite fetch schedule: within each host, order by (priority
    DESC, url ASC — the deterministic tiebreak) and assign ``slot`` =
    that rank. One fetch per host per slot is the politeness
    invariant: slot s across ALL hosts can be fetched concurrently,
    no host is hit twice in a slot. Output: urls columns + slot."""
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    return urls.withColumn("slot", F.row_number().over(w))


def paced_schedule(
    schedule: DataFrame,
    delays: DataFrame,
    *,
    host_col: str = "host",
    delay_col: str = "delay_s",
) -> DataFrame:
    """Attach fetch times to a frontier schedule: ``fetch_at_s`` =
    (slot − 1) × the host's Crawl-delay — the politeness pacing a
    fetcher fleet executes (slot waves spaced per host by its own
    delay). One broadcast-class equi-join on host."""
    return schedule.join(F.broadcast(delays), host_col, "left").select(
        *schedule.columns,
        ((F.col("slot") - 1) * F.coalesce(F.col(delay_col), F.lit(0.0))).alias(
            "fetch_at_s"
        ),
    )


SITEMAP_SCHEMA_TAIL = ("loc", "lastmod", "changefreq", "priority")


def sitemap_entries_xml(
    sitemaps: DataFrame, *, xml_col: str = "xml", key_cols: tuple[str, ...] = ("host",)
) -> DataFrame:
    """The XML-parser tail of :func:`sitemap_entries` (r7): a real XML
    parse (stdlib ElementTree — expat) for the inputs the documented
    regex subset cannot serve: CDATA sections, numeric/named character
    references beyond the five predefined entities, and namespaced
    documents (the sitemaps.org xmlns, or none). Same output schema as
    the regex path — (key_cols…, loc, lastmod, changefreq, priority) —
    so callers route by need: regex for the whole-stage-codegen fast
    path, this mapInPandas pass for the tail. Malformed XML documents
    contribute no rows (a crawler treats an unparseable sitemap as
    absent — logged upstream, never fatal); <sitemapindex> documents
    contain no <url> blocks and contribute none either."""
    import xml.etree.ElementTree as ET
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    key_fields = [sitemaps.schema[k] for k in key_cols]
    schema = T.StructType(
        key_fields
        + [
            T.StructField("loc", T.StringType()),
            T.StructField("lastmod", T.StringType()),
            T.StructField("changefreq", T.StringType()),
            T.StructField("priority", T.DoubleType()),
        ]
    )

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                keys = {k: getattr(tup, k) for k in key_cols}
                try:
                    root = ET.fromstring(getattr(tup, xml_col))
                except ET.ParseError:
                    continue
                if local(root.tag) != "urlset":
                    continue
                for url in root:
                    if local(url.tag) != "url":
                        continue
                    fields = {"loc": None, "lastmod": None,
                              "changefreq": None, "priority": None}
                    for child in url:
                        name = local(child.tag)
                        if name in fields:
                            fields[name] = (child.text or "").strip() or None
                    if not fields["loc"]:
                        continue
                    try:
                        prio = float(fields["priority"])
                    except (TypeError, ValueError):
                        prio = 0.5  # spec default, same as the regex path
                    cf = fields["changefreq"]
                    rows.append(
                        {
                            **keys,
                            "loc": fields["loc"],
                            "lastmod": fields["lastmod"],
                            "changefreq": cf.lower() if cf else None,
                            "priority": prio,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            ) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in schema.fields}
            )

    return sitemaps.select(*key_cols, xml_col).mapInPandas(walk, schema)
