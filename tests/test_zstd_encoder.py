"""r8 zstd COMPRESSING encoder (VERDICT r7 #7): predefined-FSE
sequences over raw literals, greedy LZ parse, raw-block fallback.
The decisive gate mirrors the r7 decoder gate: REAL libzstd (pyarrow)
must decode every frame this encoder emits."""

from __future__ import annotations

import random

import pytest

from prom_etl_db_spark.functions import zstd as Z


def _payloads():
    rng = random.Random(11)
    return [
        b"",
        b"a",
        b"abc",
        b"abcabcabcabcabcabcabcabc",
        b"the quick brown fox jumps over the lazy dog " * 400,
        bytes(range(256)) * 200,
        rng.randbytes(50_000),                      # incompressible
        (b"mirror page " * 40 + b"!") * 120,        # highly repetitive
        b"\x00" * 10_000,                           # RLE-shaped
        (b"block spans " * 12_000),                 # > 128 KiB, multi-block
    ]


def test_libzstd_decodes_every_frame():
    """The mirror of the decoder's interop gate."""
    from pyarrow import Codec

    codec = Codec("zstd")
    for p in _payloads():
        enc = Z.zstd_compress(p)
        if p:
            assert bytes(codec.decompress(enc, len(p))) == p
        assert Z.zstd_decompress(enc, max_out=1 << 22) == p


def test_roundtrip_without_checksum():
    for p in _payloads():
        enc = Z.zstd_compress(p, checksum=False)
        assert Z.zstd_decompress(enc, max_out=1 << 22) == p


def test_compresses_at_several_ratios():
    """VERDICT asks for interop at several ratios: repetitive payloads
    must shrink hard, mixed ones modestly, random ones fall back to
    raw blocks with only header overhead."""
    rep = (b"abcdefgh" * 8192)        # 64 KiB of pure repeat
    mixed = b"".join(
        bytes([i & 0xFF]) + b"common-substring" for i in range(2000)
    )
    rnd = random.Random(5).randbytes(64 * 1024)
    r_rep = len(Z.zstd_compress(rep)) / len(rep)
    r_mix = len(Z.zstd_compress(mixed)) / len(mixed)
    r_rnd = len(Z.zstd_compress(rnd)) / len(rnd)
    assert r_rep < 0.01
    assert r_mix < 0.25
    assert 1.0 <= r_rnd < 1.001  # raw fallback: only frame/block headers


def test_checksum_detects_corruption():
    p = b"payload under checksum " * 100
    enc = bytearray(Z.zstd_compress(p))
    enc[-1] ^= 0xFF  # flip checksum bits
    with pytest.raises(ValueError, match="checksum"):
        Z.zstd_decompress(bytes(enc))


def test_cross_block_matches_decode():
    """Matches may reach into PREVIOUS blocks of the same frame
    (single-segment window = whole content)."""
    from pyarrow import Codec

    head = b"shared shingle material " * 32
    p = head + random.Random(9).randbytes(130_000) + head  # tail matches block 1
    enc = Z.zstd_compress(p)
    assert Z.zstd_decompress(enc, max_out=1 << 22) == p
    assert bytes(Codec("zstd").decompress(enc, len(p))) == p


def test_sequence_count_header_forms():
    """Exercise the 1-byte (<128) and 2-byte (>=128) nseq forms; the
    255-form is pinned decoder-side by test_advice_r8 (the encoder's
    5-bytes-per-sequence floor keeps blocks under 32512 sequences
    except in adversarial token streams)."""
    # few sequences
    p1 = b"aaaa" + b"XY" + b"aaaa"
    assert Z.zstd_decompress(Z.zstd_compress(p1)) == p1
    # many small matches -> hundreds of sequences
    rng = random.Random(13)
    p2 = b"".join(bytes([rng.randrange(256)]) + b"tok!" for _ in range(3000))
    assert Z.zstd_decompress(Z.zstd_compress(p2), max_out=1 << 22) == p2


def test_property_random_structured_payloads():
    """Generative: mixtures of random and repeated material roundtrip
    through self AND libzstd at every size tried."""
    from pyarrow import Codec

    codec = Codec("zstd")
    rng = random.Random(21)
    for _ in range(120):
        n = rng.randrange(0, 4000)
        base = rng.randbytes(max(1, n // 3)) if n else b""
        reps = rng.randrange(1, 5)
        p = (base * reps)[:n]
        enc = Z.zstd_compress(p, checksum=bool(rng.getrandbits(1)))
        assert Z.zstd_decompress(enc) == p
        if p:
            assert bytes(codec.decompress(enc, len(p))) == p


def test_cli_zstd_also_decodes(tmp_path):
    """Belt-and-braces: the standalone zstd CLI (a different libzstd
    entry point than pyarrow's) accepts the frames too."""
    import shutil
    import subprocess

    cli = shutil.which("zstd") or "/root/miniconda/bin/zstd"
    try:
        subprocess.run([cli, "--version"], capture_output=True, check=True)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("zstd CLI unavailable")
    p = b"cli-checked payload " * 2048
    f = tmp_path / "x.zst"
    f.write_bytes(Z.zstd_compress(p))
    out = subprocess.run(
        [cli, "-d", "-c", str(f)], capture_output=True, check=True
    )
    assert out.stdout == p
