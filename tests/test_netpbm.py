"""Netpbm codecs (functions/netpbm.py — round 6): header grammar
traps, all six magics, 16-bit rasters, and the corrupt-stream fuzz
gate."""

from __future__ import annotations

import pytest

from prom_etl_db_spark.functions.netpbm import (
    decode_netpbm,
    netpbm_roundtrip_features,
    synth_netpbm,
)


def test_all_magics_roundtrip():
    for mid in range(36):
        kind = mid % 6 + 1
        w, h = mid % 7 + 1, mid % 5 + 1
        maxval = 1023 if (kind in (5, 6) and mid % 12 >= 6) else 255
        f = decode_netpbm(synth_netpbm(kind, w, h, maxval))
        assert (f["magic"], f["width"], f["height"]) == (f"P{kind}", w, h)


def test_mid_header_comments_and_whitespace():
    data = b"P2 # c1\n# full line\n 3 #w\n\t2\r\n255 \n0 1 2 3 4 5"
    f = decode_netpbm(data)
    assert (f["width"], f["height"], f["maxval"]) == (3, 2, 255)
    assert f["sum_r"] == 15


def test_raw_raster_separator_is_one_byte():
    # raster may START with a whitespace-looking byte (0x20 = 32):
    # "skip all whitespace" parsers corrupt it
    hdr = b"P5 2 1 255\n"
    data = hdr + bytes([0x20, 0x21])
    f = decode_netpbm(data)
    assert f["sum_r"] == 0x20 + 0x21


def test_p1_unseparated_digits_and_black_inversion():
    f = decode_netpbm(b"P1 4 1\n0110")
    # PBM 1 = black; luminance sum counts the 0s
    assert f["sum_r"] == 2


def test_p4_bit_packing_and_row_padding():
    # width 9 → 2 bytes/row; pattern 101010101 per row
    row = bytes([0b10101010, 0b10000000])
    f = decode_netpbm(b"P4 9 2\n" + row + row)
    # ones (black) at even x → 5 black, 4 white per row
    assert f["sum_r"] == 8


def test_16bit_big_endian():
    hdr = b"P5 2 1 1000\n"
    f = decode_netpbm(hdr + (999).to_bytes(2, "big") + (1).to_bytes(2, "big"))
    assert f["sum_r"] == 1000 and f["maxval"] == 1000


def test_sample_over_maxval_refused():
    with pytest.raises(ValueError, match="> maxval"):
        decode_netpbm(b"P2 1 1 10\n11")
    with pytest.raises(ValueError, match="> maxval"):
        decode_netpbm(b"P5 1 1 100\n" + bytes([200]))


def test_corrupt_stream_fuzz_refuses_loudly():
    for mid in (3, 10, 17):
        kind = mid % 6 + 1
        data = synth_netpbm(kind, mid % 7 + 1, mid % 5 + 1)
        for cut in range(len(data)):
            try:
                decode_netpbm(data[:cut])
            except ValueError:
                continue
        for pos in range(len(data)):
            mutated = bytearray(data)
            mutated[pos] ^= 0xFF
            try:
                decode_netpbm(bytes(mutated))
            except ValueError:
                continue


def test_spark_plumbing(spark):
    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = netpbm_roundtrip_features(df)
    assert out.count() == 12
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
