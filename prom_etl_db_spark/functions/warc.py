"""WARC (Web ARChive, ISO 28500) record parsing.

Reference scope: samzong/prom-etl-db has no web surface; this is a
§2.E training-data-pipeline extension (round 6) — Common Crawl, the
dominant public web corpus, ships as WARC files, so a crawl-curation
engine must read them before any of the downstream arc (MIME sniff →
HTML extract → url dedup → robots/PageRank weighting) has input. The
public spec implemented is ISO 28500 / the WARC 1.0/1.1 format as
published in the IIPC warc-specifications repository.

Format recap: a WARC file is a concatenation of records; each record is

    WARC/1.0<CRLF>
    <header-name>: <value><CRLF>   (repeated; names case-insensitive)
    <CRLF>
    <Content-Length bytes of block>
    <CRLF><CRLF>

Content-Length is MANDATORY and is the ONLY way to find the block end —
payloads may legally contain ``WARC/1.0`` lines (our tests plant one),
so any split-on-delimiter shortcut is wrong by construction. Files may
also be a concatenation of per-record gzip MEMBERS (ISO 28500 annex;
Common Crawl ships .warc.gz) — handled by inflating members in a loop
(stdlib zlib, the PNG codec's precedent) before the byte walk.

For ``response`` records the HTTP status line of the enclosed message
is parsed out (the field every curation filter wants first).

Spark shape: one ``mapInPandas`` over the binary column — Arrow-batched,
one pass per file, emits one row per record; no shuffle. Parallelism is
per-FILE (WARC's own gzip-member framing is what makes intra-file
splitting possible at 100 TB: a production reader seeks to member
boundaries; here each row is one file, the member walk is linear).
Malformed input refuses loudly (ValueError with byte offset), the
corrupt-stream-fuzz convention every codec in this repo follows.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Inflate a concatenation of gzip members (ISO 28500 annex /
    .warc.gz convention) into one byte string."""
    import zlib

    out, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data[pos:]))
        except zlib.error as exc:  # corrupt member: refuse loudly, one
            # exception class (the codec fuzz-gate convention)
            raise ValueError(f"warc.gz: bad gzip member at offset {pos}: {exc}")
        if not d.eof:
            raise ValueError(f"warc.gz: truncated gzip member at offset {pos}")
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # pragma: no cover - zlib guarantees progress
            raise ValueError(f"warc.gz: empty gzip member at offset {pos}")
        pos += consumed
    return b"".join(out)


def parse_warc_bytes(data: bytes, *, keep_payload: bool = False) -> list[dict]:
    """Walk one WARC file's bytes into record dicts (strict: any
    framing violation raises ValueError with the offending offset).
    With ``keep_payload`` each dict also carries the raw block bytes —
    the downstream-pipeline mode (MIME sniff / HTML extract need the
    body); off by default so the metadata-only path never ships
    payloads through the shuffle."""
    import hashlib

    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records, pos, idx = [], 0, 0
    n = len(data)
    while pos < n:
        line_end = data.find(_CRLF, pos)
        if line_end < 0:
            raise ValueError(f"warc: no CRLF after version at offset {pos}")
        version = data[pos:line_end]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"warc: bad version line at offset {pos}: {version[:20]!r}")
        pos = line_end + 2
        headers: dict[str, str] = {}
        while True:
            line_end = data.find(_CRLF, pos)
            if line_end < 0:
                raise ValueError(f"warc: unterminated header at offset {pos}")
            line = data[pos:line_end]
            pos = line_end + 2
            if line == b"":
                break
            colon = line.find(b":")
            if colon <= 0:
                raise ValueError(f"warc: malformed header at offset {pos}: {line[:40]!r}")
            headers[line[:colon].decode("ascii").strip().lower()] = (
                line[colon + 1 :].decode("utf-8", "replace").strip()
            )
        if "content-length" not in headers:
            raise ValueError(f"warc: record {idx} missing Content-Length")
        try:
            clen = int(headers["content-length"])
        except ValueError:
            raise ValueError(
                f"warc: record {idx} non-numeric Content-Length"
                f" {headers['content-length']!r}"
            )
        if clen < 0:
            # a flipped digit byte can read as '-': a negative length
            # would walk the cursor BACKWARDS (infinite loop), so it is
            # a framing violation, not a parse detail
            raise ValueError(f"warc: record {idx} negative Content-Length {clen}")
        if pos + clen > n:
            raise ValueError(
                f"warc: record {idx} block overruns file ({pos}+{clen}>{n})"
            )
        block = data[pos : pos + clen]
        pos += clen
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError(f"warc: record {idx} missing CRLFCRLF at offset {pos}")
        pos += 4
        wtype = headers.get("warc-type", "")
        status: Optional[int] = None
        if wtype == "response" and block[:5] == b"HTTP/":
            sp = block.find(b" ")
            if 0 < sp < 12:
                code = block[sp + 1 : sp + 4]
                if code.isdigit():
                    status = int(code)
        rec = {
            "rec_idx": idx,
            "warc_type": wtype,
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date", ""),
            "content_length": clen,
            "payload_md5": hashlib.md5(block).hexdigest(),
            "http_status": status,
        }
        if keep_payload:
            rec["payload"] = block
        records.append(rec)
        idx += 1
    return records


def parse_warc_records(
    files: DataFrame,
    *,
    payload_col: str = "warc",
    id_col: str = "file_id",
    keep_payload: bool = False,
) -> DataFrame:
    """One row per WARC record across all files: (id_col, rec_idx,
    warc_type, record_id, target_uri, warc_date, content_length,
    payload_md5, http_status[, payload])."""
    fields = list(WARC_RECORD_SCHEMA.fields)
    if keep_payload:
        fields.append(T.StructField("payload", T.BinaryType()))
    schema = T.StructType([files.schema[id_col]] + fields)
    cols = [id_col, payload_col]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[id_col], pdf[payload_col]):
                for rec in parse_warc_bytes(bytes(blob), keep_payload=keep_payload):
                    rows.append({id_col: fid, **rec})
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            ) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in schema.fields}
            )

    return files.select(*cols).mapInPandas(walk, schema=schema)


def build_warc_record(
    headers: list[tuple[str, str]], block: bytes, *, version: str = "WARC/1.0"
) -> bytes:
    """Serialize one record (test/fixture helper; Content-Length is
    computed, never trusted from the caller)."""
    head = [version.encode()] + [
        f"{k}: {v}".encode() for k, v in headers if k.lower() != "content-length"
    ]
    head.append(b"Content-Length: %d" % len(block))
    return _CRLF.join(head) + _CRLF + _CRLF + block + _CRLF + _CRLF


def wet_records(
    pages: DataFrame,
    *,
    id_col: str = "doc_id",
    uri_col: str = "target_uri",
    text_col: str = "clean_text",
    date: str = "2024-01-30T00:00:00Z",
) -> DataFrame:
    """Serialize extracted page text as WET ``conversion`` records —
    the derived format Common Crawl publishes next to its WARCs (one
    text/plain record per page, WARC-Refers-To the source response).
    Content-Length is the UTF-8 BYTE length (never the char count);
    the record is built with pure Column concat over binary, zero
    Python. Output: (id_col, wet binary) — one record per page;
    concatenating rows yields a valid WET file, and
    :func:`parse_warc_records` reads it back (the roundtrip the
    registry query hash-checks, including text that itself contains
    ``WARC/1.0`` lines)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    head = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        F.col(uri_col),
        F.lit("\r\nWARC-Record-ID: <urn:uuid:"),
        F.col(id_col).cast("string"),
        F.lit("-wet>\r\nWARC-Refers-To: <urn:uuid:"),
        F.col(id_col).cast("string"),
        F.lit("-2>\r\nWARC-Date: " + date),
        F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
    )
    rec = F.concat(F.encode(head, "UTF-8"), payload, F.encode(F.lit("\r\n\r\n"), "UTF-8"))
    return pages.select(F.col(id_col), rec.alias("wet"))


def wat_records(
    pages: DataFrame,
    *,
    id_col: str = "doc_id",
    uri_col: str = "target_uri",
    json_col: str = "wat_json",
    date: str = "2024-01-30T00:00:00Z",
) -> DataFrame:
    """Serialize per-page metadata JSON as WAT ``metadata`` records —
    the third member of Common Crawl's WARC/WET/WAT triple (WAT carries
    the envelope metadata, most importantly the outlink list the web
    graph is built from). Same pure-Column byte framing as
    :func:`wet_records`; Content-Type application/json."""
    payload = F.encode(F.col(json_col), "UTF-8")
    head = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "),
        F.col(uri_col),
        F.lit("\r\nWARC-Record-ID: <urn:uuid:"),
        F.col(id_col).cast("string"),
        F.lit("-wat>\r\nWARC-Refers-To: <urn:uuid:"),
        F.col(id_col).cast("string"),
        F.lit("-2>\r\nWARC-Date: " + date),
        F.lit("\r\nContent-Type: application/json\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
    )
    rec = F.concat(F.encode(head, "UTF-8"), payload, F.encode(F.lit("\r\n\r\n"), "UTF-8"))
    return pages.select(F.col(id_col), rec.alias("wat"))
