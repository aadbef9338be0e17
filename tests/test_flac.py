"""FLAC codec (functions/flac.py — round 5): lossless roundtrips,
hand-assembled stereo-decorrelation known vectors, refusal paths, and
the corrupt-stream fuzz gate."""

import numpy as np
import pytest

from prom_etl_db_spark.functions.flac import (
    _BitW,
    _crc8,
    _crc16,
    _write_utf8_number,
    decode_flac,
    encode_flac,
    flac_samples,
)


def test_flac_lossless_roundtrip_all_fixed_orders_and_lengths():
    """decode(encode(x)) is BIT-EXACT for every fixed-predictor order
    0-4 across block-boundary edge lengths — losslessness is the whole
    verification story (the oracle's closed form relies on it)."""
    rng = np.random.default_rng(0)
    for order in range(5):
        for n in (1, 5, 255, 256, 257, 512):
            x = rng.integers(-2000, 2000, n).astype(np.int64)
            out, meta = decode_flac(encode_flac(x, block_size=128, order=order))
            assert np.array_equal(out[:, 0], x), (order, n)
    assert meta == {"sample_rate": 8000, "channels": 1, "bps": 16}
    # a smooth signal actually compresses below raw 16-bit PCM
    t = np.arange(1000)
    s = (3000 * np.sin(t / 20)).astype(np.int64)
    assert len(encode_flac(s, order=2)) < 2 * len(s)


def _stereo_frame(ch_code: int, sub1: int, sub2: int, bps1: int, bps2: int):
    """Hand-assemble a 2-channel 1-block FLAC stream with CONSTANT
    subframes under the given channel assignment."""
    out = bytearray(b"fLaC")
    info = _BitW()
    info.w(4, 16), info.w(4, 16), info.w(0, 24), info.w(0, 24)
    info.w(8000, 20), info.w(1, 3), info.w(15, 5), info.w(4, 36)
    body = info.tobytes() + b"\x00" * 16
    out += (0x80000000 | len(body)).to_bytes(4, "big") + body
    w = _BitW()
    w.w(0x3FFE, 14), w.w(0, 1), w.w(0, 1)
    w.w(6, 4)        # 8-bit blocksize-1 follows
    w.w(0, 4)        # sample rate from STREAMINFO
    w.w(ch_code, 4)  # stereo decorrelation mode
    w.w(4, 3)        # 16-bit samples
    w.w(0, 1)
    _write_utf8_number(w, 0)
    w.w(3, 8)        # blocksize 4
    w.align()
    w.w(_crc8(w.tobytes()), 8)
    for val, bits in ((sub1, bps1), (sub2, bps2)):
        w.w(0, 1), w.w(0, 6), w.w(0, 1)  # CONSTANT, no wasted bits
        w.w(val & ((1 << bits) - 1), bits)
    w.align()
    frame = w.tobytes()
    return bytes(out + frame + _crc16(frame).to_bytes(2, "big"))


def test_flac_stereo_decorrelation_known_vectors():
    """Mid/side, left/side and right/side reconstruction checked from
    first principles: left=100, right=37 -> mid=68, side=63 (the side
    channel carries bps+1 bits per the spec)."""
    left, right = 100, 37
    mid, side = (left + right) >> 1, left - right
    out, meta = decode_flac(_stereo_frame(10, mid, side, 16, 17))
    assert meta["channels"] == 2
    assert np.array_equal(out, np.tile([[left, right]], (4, 1)))
    out, _ = decode_flac(_stereo_frame(8, left, side, 16, 17))
    assert np.array_equal(out, np.tile([[left, right]], (4, 1)))
    out, _ = decode_flac(_stereo_frame(9, side, right, 17, 16))
    assert np.array_equal(out, np.tile([[left, right]], (4, 1)))
    # negative side (right louder) exercises the arithmetic shifts
    left2, right2 = -5, 9
    mid2, side2 = (left2 + right2) >> 1, left2 - right2
    out, _ = decode_flac(_stereo_frame(10, mid2, side2, 16, 17))
    assert np.array_equal(out, np.tile([[left2, right2]], (4, 1)))


def test_flac_refusals_and_crc():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"OggS")
    base = encode_flac(np.arange(100, dtype=np.int64), order=1)
    bad = bytearray(base)
    bad[60] ^= 0x04
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([40000], dtype=np.int64))
    assert flac_samples(base).shape == (100, 1)


def test_flac_corrupt_stream_fuzz_only_valueerror():
    """The r5 fuzz gate applied to the new codec: every prefix
    truncation and every single-bit flip decodes or raises ValueError."""
    rng = np.random.default_rng(3)
    base = encode_flac(
        rng.integers(-500, 500, 300).astype(np.int64), block_size=128
    )
    for cut in range(len(base)):
        try:
            decode_flac(base[:cut])
        except ValueError:
            pass
    for pos in range(len(base)):
        for bit in range(8):
            bb = bytearray(base)
            bb[pos] ^= 1 << bit
            try:
                decode_flac(bytes(bb))
            except ValueError:
                pass
    decode_flac(base)  # valid stream still decodes


def test_flac_real_decode_wiring():
    from prom_etl_db_spark.functions.multimodal import real_decode

    s = np.full(64, 250, np.int64)
    f = real_decode(encode_flac(s, order=0), "audio")
    assert f["format"] == "flac" and f["n_samples"] == 64
    assert f["rms"] == 250.0 and f["mean"] == 250.0
