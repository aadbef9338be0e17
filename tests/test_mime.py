"""MIME sniffing (functions/mime.py — round 6): WHATWG signature table,
HTML tag sniff semantics, the binary-byte heuristic, and the hex-pair
alignment invariant both engines' regexes rely on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions import mime as M


def _sniff_all(spark, payloads: list[bytes]) -> list[str]:
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, payload binary"
    )
    rows = df.select("i", M.sniff_mime(F.col("payload")).alias("m")).collect()
    return [r["m"] for r in sorted(rows, key=lambda r: r["i"])]


CASES = [
    (b"\x89PNG\r\n\x1a\n....", "image/png"),
    (b"\xff\xd8\xff\xe0rest", "image/jpeg"),
    (b"GIF87a..", "image/gif"),
    (b"GIF89a..", "image/gif"),
    (b"BMxxxx", "image/bmp"),
    (b"RIFF\x10\x00\x00\x00WAVEfmt ", "audio/wave"),
    (b"RIFF\x10\x00\x00\x00AVI LIST", "video/avi"),
    (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
    (b"fLaC\x00\x00\x00\x22", "audio/flac"),
    (b"ID3\x03\x00junk", "audio/mpeg"),
    (b"\xff\xfb\x90\x44", "audio/mpeg"),
    (b"OggS\x00\x02", "application/ogg"),
    (b"FORM\x00\x00\x00\x10AIFFCOMM", "audio/aiff"),
    (b".snd\x00\x00", "audio/basic"),
    (b"\x1f\x8b\x08\x00", "application/x-gzip"),
    (b"PK\x03\x04....", "application/zip"),
    (b"%PDF-1.7 ...", "application/pdf"),
    (b"%!PS-Adobe-3.0", "application/postscript"),
    (b"\x00asm\x01\x00\x00\x00", "application/wasm"),
    (b"<!DOCTYPE html><head>", "text/html"),
    (b"  \t\r\n<html lang=en>", "text/html"),
    (b"<HtMl>upper", "text/html"),
    (b"<SCRIPT src=x>", "text/html"),
    (b"<!-- comment -->", "text/html"),
    (b'<?xml version="1.0"?>', "text/xml"),
    (b"\xef\xbb\xbfBOM text", "text/plain"),
    (b"\xfe\xffUTF16BE", "text/plain"),
    (b"\xff\xfeUTF16LE", "text/plain"),
    (b"just some words", "text/plain"),
    (b"tab\tand\rnewline\n ok \x1b[0m", "text/plain"),  # ESC 0x1B not binary
    (b"\x00starts with NUL", "application/octet-stream"),
    (b"text then \x01 control", "application/octet-stream"),
    (b" 1", "text/plain"),  # hex '2031': naive unaligned scan sees '03'
    (b"<htmlx>", "text/plain"),  # tag needs a terminating space/'>'
    (b"<p>", "text/html"),
    (b"\n\n<body >", "text/html"),
]


def test_signature_table(spark):
    got = _sniff_all(spark, [p for p, _ in CASES])
    assert got == [m for _, m in CASES]


def test_duckdb_oracle_chain_matches_spark(spark):
    """The rendered DuckDB CASE (RE2) must agree with the Spark CASE
    (java.util.regex) on every fixture payload — the cross-engine claim
    the registry oracle hash rests on."""
    con = duckdb.connect()
    sql = M.oracle_case_sql("h")
    for payload, want in CASES:
        hx = payload.hex().upper()
        got = con.execute(f"SELECT {sql} FROM (SELECT ? AS h)", [hx]).fetchone()[0]
        assert got == want, (payload, got, want)


def test_binary_byte_boundaries(spark):
    # every WHATWG binary byte must trip the heuristic; neighbors must not
    binary = list(range(0x00, 0x09)) + [0x0B] + list(range(0x0E, 0x1B)) + list(
        range(0x1C, 0x20)
    )
    texty = [0x09, 0x0A, 0x0C, 0x0D, 0x1B, 0x20, 0x7F, 0xFE]
    payloads = [b"safe prefix " + bytes([b]) for b in binary + texty]
    got = _sniff_all(spark, payloads)
    assert got[: len(binary)] == ["application/octet-stream"] * len(binary)
    assert got[len(binary):] == ["text/plain"] * len(texty)


def test_scan_window_is_bounded(spark):
    # a binary byte past the 1445-byte resource header is not scanned
    p = b"A" * M._SCAN_BYTES + b"\x00"
    assert _sniff_all(spark, [p]) == ["text/plain"]
    p2 = b"A" * (M._SCAN_BYTES - 1) + b"\x00"
    assert _sniff_all(spark, [p2]) == ["application/octet-stream"]


def test_plan_is_pure_column(spark):
    df = spark.createDataFrame([(b"x",)], "payload binary")
    plan = (
        df.select(M.sniff_mime(F.col("payload")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_null_payload_sniffs_null(spark):
    df = spark.createDataFrame([(1, None), (2, b"hi")], "i int, payload binary")
    rows = {r["i"]: r["m"] for r in df.select("i", M.sniff_mime(F.col("payload")).alias("m")).collect()}
    assert rows[1] is None
    assert rows[2] == "text/plain"
