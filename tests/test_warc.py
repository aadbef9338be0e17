"""WARC parsing (functions/warc.py — round 6): framing semantics,
the Content-Length-vs-delimiter trap, gzip member handling, Spark
plumbing, and the corrupt-stream fuzz gate every codec carries."""

from __future__ import annotations

import gzip
import hashlib

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions import warc as W


def _sample_file() -> bytes:
    r0 = W.build_warc_record(
        [("WARC-Type", "warcinfo"), ("WARC-Record-ID", "<urn:uuid:a>"),
         ("WARC-Date", "2024-01-30T00:00:00Z")],
        b"software: sparketl/1.0",
    )
    # payload embeds a full fake record header: Content-Length framing
    # is the only correct way to skip it
    trap = b"HTTP/1.1 200 OK\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nbody"
    r1 = W.build_warc_record(
        [("WARC-Type", "response"), ("WARC-Record-ID", "<urn:uuid:b>"),
         ("WARC-Target-URI", "http://x.example/p"),
         ("WARC-Date", "2024-01-30T00:00:00Z")],
        trap,
    )
    return r0 + r1


def test_content_length_framing_beats_delimiters():
    recs = W.parse_warc_bytes(_sample_file())
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["http_status"] == 200
    assert recs[1]["target_uri"] == "http://x.example/p"
    assert recs[0]["target_uri"] is None
    trap = b"HTTP/1.1 200 OK\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nbody"
    assert recs[1]["payload_md5"] == hashlib.md5(trap).hexdigest()
    assert recs[1]["content_length"] == len(trap)


def test_header_names_case_insensitive():
    r = W.build_warc_record(
        [("warc-type", "request"), ("WARC-RECORD-ID", "<urn:uuid:c>"),
         ("Warc-Target-Uri", "http://y.example/")],
        b"GET / HTTP/1.1\r\n\r\n",
    )
    recs = W.parse_warc_bytes(r)
    assert recs[0]["warc_type"] == "request"
    assert recs[0]["record_id"] == "<urn:uuid:c>"
    assert recs[0]["target_uri"] == "http://y.example/"


def test_gzip_members_roundtrip():
    plain = _sample_file()
    # per-record gzip members, the .warc.gz convention
    half = plain.find(b"WARC/1.0", 1)
    gz = gzip.compress(plain[:half]) + gzip.compress(plain[half:])
    assert W.parse_warc_bytes(gz) == W.parse_warc_bytes(plain)


def test_non_response_http_never_parsed():
    r = W.build_warc_record(
        [("WARC-Type", "request"), ("WARC-Record-ID", "<urn:uuid:d>")],
        b"HTTP/1.1 999 odd",  # request records carry requests, not statuses
    )
    assert W.parse_warc_bytes(r)[0]["http_status"] is None


def test_corrupt_stream_fuzz_refuses_loudly():
    """Every prefix truncation and every single-byte corruption either
    parses to valid records or raises ValueError — no other exception
    class, no hang, no silent garbage row with a wrong md5 length."""
    data = _sample_file()
    for cut in range(len(data)):
        try:
            recs = W.parse_warc_bytes(data[:cut])
        except ValueError:
            continue
        for r in recs:
            assert len(r["payload_md5"]) == 32
    for pos in range(0, len(data), 7):
        mutated = bytearray(data)
        mutated[pos] ^= 0xFF
        try:
            W.parse_warc_bytes(bytes(mutated))
        except ValueError:
            continue


def test_missing_content_length_refused():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        W.parse_warc_bytes(bad)


def test_spark_plumbing_arrow_batched(spark):
    files = spark.createDataFrame(
        [(1, _sample_file()), (2, _sample_file())], "file_id int, warc binary"
    )
    out = W.parse_warc_records(files)
    rows = out.collect()
    assert len(rows) == 4
    assert {r["file_id"] for r in rows} == {1, 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow path, never row-at-a-time


def test_negative_content_length_refused():
    # a single flipped digit byte can read as '-'; the walker must not
    # move backwards (infinite loop), it must refuse
    bad = b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: -5\r\n\r\npayload\r\n\r\n"
    with pytest.raises(ValueError, match="negative Content-Length"):
        W.parse_warc_bytes(bad)
    bad2 = b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 1e3\r\n\r\np\r\n\r\n"
    with pytest.raises(ValueError, match="non-numeric"):
        W.parse_warc_bytes(bad2)


def test_gzip_garbage_member_refused_with_valueerror():
    plain = _sample_file()
    data = gzip.compress(plain) + b"\x1f\x8bgarbage-not-a-member"
    with pytest.raises(ValueError):
        W.parse_warc_bytes(data)


def test_gz_corrupt_fuzz_single_exception_class():
    gz = gzip.compress(_sample_file())
    for pos in range(0, len(gz), 5):
        mutated = bytearray(gz)
        mutated[pos] ^= 0xFF
        try:
            W.parse_warc_bytes(bytes(mutated))
        except ValueError:
            continue


def test_wet_records_roundtrip_with_trap(spark):
    from prom_etl_db_spark.functions.warc import parse_warc_records, wet_records

    pages = spark.createDataFrame(
        [
            (1, "http://h/a", "plain text line\nWARC/1.0\r\n\r\nstill text"),
            (2, "http://h/b", "unicode é中 body"),  # byte-length != char-length
        ],
        "doc_id int, target_uri string, clean_text string",
    )
    wet = wet_records(pages)
    parsed = parse_warc_records(wet, payload_col="wet", id_col="doc_id")
    rows = {r["doc_id"]: r for r in parsed.collect()}
    assert len(rows) == 2  # the embedded WARC/1.0 did not split record 1
    assert rows[1]["warc_type"] == "conversion"
    assert rows[1]["target_uri"] == "http://h/a"
    import hashlib
    assert rows[2]["content_length"] == len("unicode é中 body".encode())
    assert rows[2]["payload_md5"] == hashlib.md5("unicode é中 body".encode()).hexdigest()
    # concatenating rows is a valid WET FILE
    blobs = [r["wet"] for r in wet.collect()]
    from prom_etl_db_spark.functions.warc import parse_warc_bytes
    assert len(parse_warc_bytes(b"".join(blobs))) == 2


def test_wat_records_roundtrip(spark):
    from prom_etl_db_spark.functions.warc import parse_warc_records, wat_records

    pages = spark.createDataFrame(
        [(1, "http://h/a", '{"WARC-Target-URI":"http://h/a","Links":[{"url":"http://x/"}]}')],
        "doc_id int, target_uri string, wat_json string",
    )
    rows = parse_warc_records(
        wat_records(pages), payload_col="wat", id_col="doc_id"
    ).collect()
    assert rows[0]["warc_type"] == "metadata"
    import hashlib
    want = hashlib.md5(
        '{"WARC-Target-URI":"http://h/a","Links":[{"url":"http://x/"}]}'.encode()
    ).hexdigest()
    assert rows[0]["payload_md5"] == want
