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


def test_mp4_box_walk_edges():
    """WHATWG §6.2.1 byte-level edges (r7 container sniff)."""
    from prom_etl_db_spark.functions.mime import matches_mp4

    base = b"\x00\x00\x00\x14" + b"ftyp" + b"mp42" + b"\x00" * 4 + b"mp42"
    assert matches_mp4(base)
    assert not matches_mp4(base[:11])            # under 12 bytes
    assert not matches_mp4(base[:16])            # payload < box size
    bad_align = b"\x00\x00\x00\x13" + base[4:]   # size % 4 != 0
    assert not matches_mp4(bad_align)
    not_ftyp = base[:4] + b"moov" + base[8:]
    assert not matches_mp4(not_ftyp)
    # major brand mp4* counts even with no compatible brands
    major_only = b"\x00\x00\x00\x10" + b"ftyp" + b"mp41" + b"\x00" * 4
    assert matches_mp4(major_only)
    # brand must be 4-byte aligned within the box: 'mp4' at offset 18
    # is NOT scanned (offsets go 16, 20, ...)
    misaligned = (b"\x00\x00\x00\x18" + b"ftyp" + b"isom" + b"\x00" * 4
                  + b"\x00\x00mp" + b"4\x00\x00\x00")
    assert not matches_mp4(misaligned)
    # brand just past box_size ignored
    past_box = (b"\x00\x00\x00\x14" + b"ftyp" + b"isom" + b"\x00" * 4
                + b"zzzz" + b"mp41")
    assert not matches_mp4(past_box)


def test_webm_ebml_edges():
    from prom_etl_db_spark.functions.mime import matches_webm

    assert matches_webm(b"\x1a\x45\xdf\xa3" + b"\x42\x82\x84webm")
    # DocType further into the header (skipped bytes before 42 82)
    assert matches_webm(b"\x1a\x45\xdf\xa3" + b"\x9f\x42\x86\x81\x01"
                        + b"\x42\x82\x84webm")
    assert not matches_webm(b"\x1a\x45\xdf\xa3" + b"\x42\x82\x88matroska")
    assert not matches_webm(b"\x1a\x45\xdf\xa4" + b"\x42\x82\x84webm")  # bad id
    assert not matches_webm(b"\x1a\x45\xdf\xa3")  # no DocType at all
    # two-byte vint size (0x40 0x04 = width 2, value 4)
    assert matches_webm(b"\x1a\x45\xdf\xa3" + b"\x42\x82\x40\x04webm")
    # truncated vint refuses quietly (False, not an exception)
    assert not matches_webm(b"\x1a\x45\xdf\xa3" + b"\x42\x82")
    # DocType size shorter than 'webm' -> no match
    assert not matches_webm(b"\x1a\x45\xdf\xa3" + b"\x42\x82\x83web")
    # beyond the spec's 38-byte scan window -> no match
    far = b"\x1a\x45\xdf\xa3" + b"\x00" * 40 + b"\x42\x82\x84webm"
    assert not matches_webm(far)


def test_refine_container_mime_passthrough(spark):
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions.mime import refine_container_mime, sniff_mime

    rows = [
        (1, b"\x00\x00\x00\x14ftypmp42\x00\x00\x00\x00mp42"),
        (2, b"\x1a\x45\xdf\xa3\x42\x82\x84webm"),
        (3, b"\x89PNG\r\n\x1a\x0a rest"),
        (4, b"just text here"),
        (5, b"\x00\x01\x02 binary junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sniffed = df.select("doc_id", sniff_mime(F.col("payload")).alias("mime"), "payload")
    got = {r["doc_id"]: r["mime"] for r in refine_container_mime(sniffed).collect()}
    assert got == {
        1: "video/mp4",
        2: "video/webm",
        3: "image/png",
        4: "text/plain",
        5: "application/octet-stream",
    }
