"""LZ4 block format (functions/lz4.py — round 6): spec vectors,
roundtrips, end-of-block rules, and the corrupt-stream fuzz gate."""

from __future__ import annotations

import random

import pytest

from prom_etl_db_spark.functions.lz4 import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_roundtrip_features,
)


def test_roundtrips():
    random.seed(7)
    cases = [
        b"",
        b"a",
        b"short",
        b"ab" * 500,
        b"x" * 2000,                       # RLE overlap copies
        bytes(random.randrange(256) for _ in range(6000)),
        b"The quick brown fox jumps over the lazy dog. " * 60,
        bytes(range(256)) * 5,
        b"A" * 14 + b"B",                  # literal length exactly 15 (extended)
        b"A" * (15 + 255 + 3),             # two extension bytes
    ]
    for c in cases:
        assert lz4_block_decompress(lz4_block_compress(c)) == c, len(c)
    assert len(lz4_block_compress(b"ab" * 500)) < 40


def test_hand_vectors():
    # token 0x54: 5 literals, match len 4+4; offset 5 → overlap copy
    v = bytes([0x54]) + b"hello" + (5).to_bytes(2, "little") + bytes([0x10]) + b"!"
    assert lz4_block_decompress(v) == b"hellohellohel!"
    # extended match length: token low nibble 15 + extension byte 2 → 21
    v2 = bytes([0x1F]) + b"q" + (1).to_bytes(2, "little") + bytes([2, 0x00])
    assert lz4_block_decompress(v2) == b"q" + b"q" * 21


def test_invalid_offsets_refused():
    with pytest.raises(ValueError, match="bad match offset"):
        lz4_block_decompress(bytes([0x14]) + b"a" + (0).to_bytes(2, "little") + b"\x00")
    with pytest.raises(ValueError, match="bad match offset"):
        lz4_block_decompress(bytes([0x14]) + b"a" + (9).to_bytes(2, "little") + b"\x00")


def test_output_bound_enforced():
    # a tiny bomb: 1 literal then huge RLE expansions must hit max_out,
    # never memory
    bomb = bytes([0x1F]) + b"a" + (1).to_bytes(2, "little") + bytes([255] * 40 + [0])
    with pytest.raises(ValueError, match="max_out"):
        lz4_block_decompress(bomb, max_out=1000)


def test_corrupt_stream_fuzz_refuses_loudly():
    data = lz4_block_compress(b"payload words repeat payload words " * 40)
    for cut in range(len(data)):
        try:
            lz4_block_decompress(data[:cut], max_out=1 << 20)
        except ValueError:
            continue
    for pos in range(len(data)):
        mutated = bytearray(data)
        mutated[pos] ^= 0xFF
        try:
            lz4_block_decompress(bytes(mutated), max_out=1 << 20)
        except ValueError:
            continue


def test_spark_plumbing(spark):
    df = spark.createDataFrame(
        [(1, "hello world hello world"), (2, "é中 unicode")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in lz4_roundtrip_features(df).collect()}
    assert rows[2]["n_bytes"] == len("é中 unicode".encode())
    import hashlib
    assert rows[1]["payload_md5"] == hashlib.md5(b"hello world hello world").hexdigest()


def test_lz4_interop_vs_real_liblz4_both_directions():
    """r8 verification upgrade: pyarrow's lz4_raw codec wraps REAL lz4
    block compression — gate the from-scratch block codec against the
    reference implementation in BOTH directions (the zstd/snappy-gate
    discipline), plus a generative sweep."""
    import random

    from pyarrow import Codec

    from prom_etl_db_spark.functions import lz4 as L

    codec = Codec("lz4_raw")
    rng = random.Random(29)
    cases = [
        b"", b"a", b"hello world " * 100, b"x" * 2000,
        bytes(range(256)) * 4,
    ] + [
        (rng.randbytes(max(1, n // 3)) * 3)[:n]
        for n in (rng.randrange(0, 4000) for _ in range(60))
    ]
    for p in cases:
        assert L.lz4_block_decompress(bytes(codec.compress(p))) == p
        assert bytes(codec.decompress(L.lz4_block_compress(p), len(p))) == p
