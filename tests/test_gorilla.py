"""Gorilla TSDB compression (functions/gorilla.py — round 5): roundtrip
fuzz, hand-computed bit layouts, dod bucket boundaries, the mlen=64
quirk, and bitstream refusals."""

import random

import pytest

from prom_etl_db_spark.functions.gorilla import (
    _BitR,
    _BitW,
    decode_gorilla,
    encode_gorilla,
)


def test_bitio_roundtrip_and_bounds():
    w = _BitW()
    w.write(0b101, 3)
    w.write(1, 1)
    w.write(0xFFFF_FFFF_FFFF_FFFF, 64)
    r = _BitR(w.bytes(), w.bit_length)
    assert r.read(3) == 0b101 and r.read(1) == 1
    assert r.read(64) == 0xFFFF_FFFF_FFFF_FFFF
    with pytest.raises(AssertionError):
        r.read(1)  # underrun
    with pytest.raises(AssertionError):
        _BitW().write(4, 2)  # value too wide


def test_known_vector_bit_layout():
    # ts [0, 60, 120]: d0=60 -> dod 60 ('10'+7 = 9 bits); d1=60 -> dod 0
    # (1 bit). vs [5, 5, 7]: xor 0 (1 bit); xor 2 -> lz=62 cap 31,
    # tz=1, mlen=32 -> 2+5+6+32 = 45 bits.
    payload, nbits, tsb, vb = encode_gorilla([0, 60, 120], [5, 5, 7])
    assert tsb == [64, 9, 1]
    assert vb == [64, 1, 45]
    assert nbits == 64 + 64 + 9 + 1 + 1 + 45
    assert decode_gorilla(payload, nbits, 3) == ([0, 60, 120], [5, 5, 7])


def test_dod_bucket_boundaries():
    # deltas chosen so dod hits every bucket edge exactly
    cases = {
        0: 1, -63: 9, 64: 9, -64: 12, 65: 12, -255: 12, 256: 12,
        -256: 16, 257: 16, -2047: 16, 2048: 16, -2048: 36, 2049: 36,
    }
    for dod, bits in cases.items():
        # t0=0, d0 = 5000 (36-bit escape), d1 = 5000 + dod
        ts = [0, 5000, 10000 + dod]
        _, _, tsb, _ = encode_gorilla(ts, [1, 1, 1])
        assert tsb[2] == bits, (dod, tsb)


def test_mlen64_zero_encoding_quirk():
    # xor of 0 and -1 is all-ones: lead 0, trail 0, mlen 64 stored as 0
    payload, nbits, _, vb = encode_gorilla([0, 1], [0, -1])
    assert vb[1] == 2 + 5 + 6 + 64
    assert decode_gorilla(payload, nbits, 2)[1] == [0, -1]


def test_window_reuse_branch():
    # same xor twice: second one fits the window -> 2 + mlen bits
    payload, nbits, _, vb = encode_gorilla([0, 1, 2], [0, 12, 0])
    # xor = 12 both times: lz=60 cap 31, tz=2, mlen=31
    assert vb[1] == 13 + 31
    assert vb[2] == 2 + 31
    assert decode_gorilla(payload, nbits, 3)[1] == [0, 12, 0]


def test_fuzz_roundtrip_bit_exact():
    random.seed(7)
    for _ in range(200):
        n = random.randint(1, 150)
        t, ts = random.randint(0, 10**9), []
        for _ in range(n):
            ts.append(t)
            t += random.choice(
                [0, 1, 1, 15, 60, 3600, 86400, random.randint(0, 10**7)]
            )
        vs = [
            random.choice(
                [0, random.randint(-500, 500), random.randint(-2**40, 2**40)]
            )
            for _ in range(n)
        ]
        for i in range(1, n):
            if random.random() < 0.3:
                vs[i] = vs[i - 1]
        payload, nbits, tsb, vb = encode_gorilla(ts, vs)
        assert decode_gorilla(payload, nbits, n) == (ts, vs)
        assert sum(tsb) + sum(vb) == nbits
        assert len(payload) == (nbits + 7) // 8


def test_truncated_stream_refuses():
    payload, nbits, _, _ = encode_gorilla([0, 60, 120], [1, 2, 3])
    with pytest.raises(AssertionError):
        decode_gorilla(payload, nbits - 8, 3)
    with pytest.raises(AssertionError):
        decode_gorilla(payload, nbits, 2)  # trailing bits unconsumed


def test_corrupt_stream_fuzz_never_hangs_or_leaks():
    """The codec fuzz discipline (same gate as FLAC/JPEG/PNG): every
    prefix truncation and every single-bit flip of a real stream either
    decodes (possibly to different values — Gorilla has no checksum,
    which is faithful to the paper) or raises the module's own
    AssertionError; never an IndexError/OverflowError/hang."""
    random.seed(13)
    ts, t = [], 1000
    for i in range(40):
        ts.append(t)
        t += random.choice([0, 1, 60, 3600, 10**6])
    vs = [random.choice([0, 7, -7, 2**40, -(2**40)]) for _ in range(40)]
    payload, nbits, _, _ = encode_gorilla(ts, vs)
    for cut in range(0, nbits, 7):  # prefix truncations
        try:
            decode_gorilla(payload[: (cut + 7) // 8], cut, 40)
        except AssertionError:
            pass
    data = bytearray(payload)
    for bit in range(0, nbits, 3):  # bit flips
        data[bit >> 3] ^= 0x80 >> (bit & 7)
        try:
            out = decode_gorilla(bytes(data), nbits, 40)
            assert len(out[0]) == 40
        except AssertionError:
            pass
        data[bit >> 3] ^= 0x80 >> (bit & 7)
