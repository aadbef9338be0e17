"""SURT (Sort-friendly URI Reordering Transform) and CDX indexing.

Reference scope: samzong/prom-etl-db has no web surface; this is a
§2.E training-data-pipeline extension (round 6). SURT is the public
key format of web-archive CDX indexes (Internet Archive / Common Crawl
cdx-toolkit, pywb): the host's labels are REVERSED and comma-joined so
that lexicographic order groups every URL of a registered domain — and
every subdomain under it — into one contiguous key range. That is the
property a 100 TB archive lookup lives on: "all captures under
``com,example``" is ONE range scan over sorted keys instead of a
full-corpus host parse, and it is exactly the layout discipline this
repo's `layout.py` bucketing applies to joins, re-applied to archival
lookup.

Transform implemented (the common pywb/cdxj convention):
- scheme dropped; host lowercased; a single leading ``www.`` dropped
  (archives fold www/apex); ports dropped (canonical input already
  strips default ports; pywb keeps explicit non-default ports — a
  documented divergence, DIVERGENCES.md);
- host labels reversed and comma-joined: ``a.b.example.com`` →
  ``com,example,b,a``;
- then ``)`` + path (+ ``?`` + query when non-empty). Trailing-slash
  root path kept.

Inputs are CANONICAL urls (functions/urlnorm.normalize_url) — SURT is
a key transform, not a second normalizer; composing the two keeps one
owner for every RFC 3986 rule (same argument as robots.py).

Spark shape: pure Column expressions only (parse_url + split +
reverse + array_join + concat) — whole-stage codegen, zero Python,
zero shuffle. The CDX index itself is a repartitionByRange +
sortWithinPartitions layout over the SURT key (range-partitioned =
the distributed analogue of the archive's sorted .cdx shards), and a
prefix lookup is a range predicate that prunes to one partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key(url: Column) -> Column:
    """The SURT key of a canonical URL column, as pure Column algebra."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    host = F.when(host.startswith("www."), F.substring(host, 5, 2**30)).otherwise(host)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.parse_url(url, F.lit("QUERY"))
    tail = F.when(
        query.isNotNull() & (query != ""), F.concat(F.lit("?"), query)
    ).otherwise(F.lit(""))
    return F.concat(rev, F.lit(")"), path, tail)


def cdx_index(
    captures: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "capture_ts",
    n_shards: int = 16,
) -> DataFrame:
    """Lay out captures as a CDX-style index: add the SURT key and
    range-partition + sort by (surt, ts) — the sorted-shard layout
    archives serve lookups from. ``n_shards`` is the shard count a
    production run would size to the corpus (here: test-scale)."""
    keyed = captures.withColumn("surt", surt_key(F.col(url_col)))
    return keyed.repartitionByRange(n_shards, "surt", ts_col).sortWithinPartitions(
        "surt", ts_col
    )


def cdx_prefix_lookup(index: DataFrame, prefix: str) -> DataFrame:
    """All captures whose SURT key starts with ``prefix`` — a range
    predicate ``prefix <= surt < prefix+MAXCHAR`` so a range-partitioned
    index prunes to the shards that can hold the range (the archive's
    binary-search-in-shard discipline; a LIKE 'x%' filter would scan
    every shard)."""
    hi = prefix + "￿"
    return index.where((F.col("surt") >= prefix) & (F.col("surt") < hi))
