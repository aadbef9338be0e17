"""zstd frame/block decode (functions/zstd.py — round 7): interop
against REAL libzstd (pyarrow) across compression levels, the raw/RLE
encoder accepted by libzstd, XXH64 vectors, checksum verification,
skippable/multi-frame input, and truncation/bit-flip fuzz."""

from __future__ import annotations

import random
import struct

import pytest

from prom_etl_db_spark.functions import zstd as Z


def _payloads():
    random.seed(0)
    return [
        b"",
        b"a",
        b"hello world",
        b"hello hello hello world " * 100,
        bytes(range(256)) * 50,
        b"\x00" * 10000,
        ("the quick brown fox jumps over the lazy dog. " * 400).encode(),
        bytes([i % 7 for i in range(50000)]),
        bytes(random.getrandbits(8) for _ in range(20000)),
    ]


def test_interop_decode_vs_libzstd_across_levels():
    """The decisive gate: frames produced by the reference
    implementation (libzstd via pyarrow) at levels spanning fast to
    max — exercising Huffman literals (direct + FSE weights, 1 and 4
    streams), predefined AND header-described FSE sequence tables,
    repeat offsets and treeless blocks — must decode bit-exactly.
    This is also what pins the predefined FSE distributions as
    correct rather than transcribed on trust."""
    from pyarrow import Codec

    n = 0
    for lvl in (1, 3, 6, 9, 15, 19, 22):
        codec = Codec("zstd", compression_level=lvl)
        for p in _payloads():
            comp = bytes(codec.compress(p))
            assert Z.zstd_decompress(comp, max_out=1 << 27) == p
            n += 1
    assert n == 63


def test_raw_rle_encoder_accepted_by_libzstd_and_self():
    from pyarrow import Codec

    codec = Codec("zstd")
    for p in _payloads():
        enc = Z.zstd_compress_raw(p)
        assert bytes(codec.decompress(enc, len(p))) == p
        assert Z.zstd_decompress(enc) == p
        # checksum-free variant decodes too
        enc2 = Z.zstd_compress_raw(p, checksum=False)
        assert Z.zstd_decompress(enc2) == p


def test_xxh64_known_vectors():
    assert Z.xxh64(b"") == 0xEF46DB3751D8E999
    # self-consistency across the 4-accumulator and short paths
    assert Z.xxh64(b"x" * 31) != Z.xxh64(b"x" * 32)
    # seed sensitivity
    assert Z.xxh64(b"abc", seed=1) != Z.xxh64(b"abc", seed=0)


def test_checksum_mismatch_refused():
    enc = bytearray(Z.zstd_compress_raw(b"payload bytes here"))
    enc[-1] ^= 0xFF  # corrupt the stored checksum
    with pytest.raises(ValueError, match="checksum"):
        Z.zstd_decompress(bytes(enc))


def test_content_size_mismatch_refused():
    enc = bytearray(Z.zstd_compress_raw(b"0123456789", checksum=False))
    enc[5] = 9  # frame says 9, blocks regenerate 10
    with pytest.raises(ValueError, match="content size"):
        Z.zstd_decompress(bytes(enc))


def test_skippable_and_multi_frame():
    skip = struct.pack("<II", 0x184D2A53, 5) + b"junk!"
    f1 = Z.zstd_compress_raw(b"first|")
    f2 = Z.zstd_compress_raw(b"second")
    assert Z.zstd_decompress(skip + f1 + skip + f2) == b"first|second"


def test_dictionary_frames_refused():
    frame = bytearray(Z.zstd_compress_raw(b"x"))
    frame[4] |= 0x01  # dictionary-id flag: 1 byte
    frame.insert(5 + 1, 7)  # nonzero dict id after FCS... craft simpler:
    # rebuild precisely: magic + fhd(single, fcs1, did1) + did + fcs + block
    frame = bytearray(struct.pack("<I", Z._MAGIC))
    frame.append(0x20 | 0x01)  # single-segment, dict flag 1
    frame.append(7)            # dictionary id 7
    frame.append(1)            # content size 1
    frame += ((1 << 3) | 1).to_bytes(3, "little")  # raw block, last, size 1
    frame += b"x"
    with pytest.raises(ValueError, match="dictionary"):
        Z.zstd_decompress(bytes(frame))


def test_truncation_fuzz_refuses_loudly():
    from pyarrow import Codec

    codec = Codec("zstd", compression_level=3)
    enc = bytes(codec.compress(b"hello hello hello world " * 50))
    for cut in range(len(enc)):
        try:
            Z.zstd_decompress(enc[:cut])
        except ValueError:
            continue
        # a truncation that still parses must be a clean frame prefix —
        # impossible here because content size is declared
        raise AssertionError(f"truncation at {cut} silently accepted")


def test_bitflip_fuzz_never_crashes_unbounded():
    """Every single-bit corruption either raises ValueError or yields
    SOME bounded output — never an unhandled exception or a hang."""
    from pyarrow import Codec

    codec = Codec("zstd", compression_level=1)
    enc = bytes(codec.compress(bytes(range(256)) * 20))
    random.seed(1)
    positions = random.sample(range(len(enc)), min(len(enc), 400))
    for pos in positions:
        mutated = bytearray(enc)
        mutated[pos] ^= 1 << random.randrange(8)
        try:
            out = Z.zstd_decompress(bytes(mutated), max_out=1 << 22)
            assert len(out) <= 1 << 22
        except ValueError:
            continue


def test_reserved_block_type_refused():
    frame = bytearray(struct.pack("<I", Z._MAGIC))
    frame.append(0x20)  # single-segment, fcs 1 byte
    frame.append(0)
    frame += ((0 << 3) | (3 << 1) | 1).to_bytes(3, "little")  # reserved type
    with pytest.raises(ValueError, match="reserved block type"):
        Z.zstd_decompress(bytes(frame))


def test_output_bomb_guard():
    # RLE block regenerating far beyond max_out must refuse, not allocate
    big = Z.zstd_compress_raw(b"\x00" * 100000, checksum=False)
    with pytest.raises(ValueError, match="max_out"):
        Z.zstd_decompress(big, max_out=1 << 10)


def test_roundtrip_features_spark(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma " * 30), (2, ""), (3, "zzz" * 1000)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in Z.zstd_roundtrip_features(docs).collect()}
    import hashlib

    for i, t in ((1, "alpha beta gamma " * 30), (2, ""), (3, "zzz" * 1000)):
        assert got[i]["n_bytes"] == len(t.encode())
        assert got[i]["payload_md5"] == hashlib.md5(t.encode()).hexdigest()


def test_property_interop_random_payloads():
    """Generative interop: arbitrary byte payloads through real libzstd
    at a random level must decode bit-exactly — hypothesis explores the
    literals/sequence shapes the fixed payload list cannot."""
    from hypothesis import given, settings, strategies as st
    from pyarrow import Codec

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.one_of(
            st.binary(max_size=4096),
            # highly repetitive payloads exercise RLE/repeat offsets
            st.builds(
                lambda unit, n: unit * n,
                st.binary(min_size=1, max_size=16),
                st.integers(min_value=1, max_value=600),
            ),
        ),
        level=st.sampled_from([1, 3, 9, 19]),
    )
    def roundtrip(data: bytes, level: int) -> None:
        comp = bytes(Codec("zstd", compression_level=level).compress(data))
        assert Z.zstd_decompress(comp, max_out=1 << 24) == data

    roundtrip()


def test_multi_block_frame_treeless_and_repeat_tables():
    """Payloads past the 128 KiB block ceiling force MULTI-BLOCK frames,
    where later blocks reuse the previous Huffman tree (treeless
    literals) and repeat-mode FSE tables — cross-block decoder state
    the single-block sweep cannot reach. 735 KB of structured text at
    four levels, bit-exact."""
    from pyarrow import Codec

    random.seed(7)
    words = ["alpha", "beta", "gamma", "delta",
             "epsilon", "zeta", "theta", "lambda"]
    big = (" ".join(random.choice(words) for _ in range(120_000))).encode()
    assert len(big) > 5 * (1 << 17)  # spans >5 max-size blocks
    for lvl in (1, 3, 9, 19):
        comp = bytes(Codec("zstd", compression_level=lvl).compress(big))
        assert Z.zstd_decompress(comp, max_out=1 << 24) == big
