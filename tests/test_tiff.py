"""Baseline TIFF (functions/tiff.py — round 6): IFD walk semantics,
both endians, strip/offset handling, refusals, and the fuzz gate."""

from __future__ import annotations

import pytest

from prom_etl_db_spark.functions.tiff import decode_tiff, synth_tiff, tiff_roundtrip_features


def test_both_endians_and_multipage():
    for big in (False, True):
        pages = decode_tiff(synth_tiff([(3, 4, 1), (2, 2, 2)], big=big))
        assert [p["page"] for p in pages] == [0, 1]
        assert (pages[0]["width"], pages[0]["height"], pages[0]["channels"]) == (3, 4, 1)
        assert pages[1]["channels"] == 3


def test_endian_results_identical():
    a = decode_tiff(synth_tiff([(5, 3, 2)], big=False))
    b = decode_tiff(synth_tiff([(5, 3, 2)], big=True))
    assert a == b  # the inline-slot left-justification trap


def test_white_is_zero_inversion():
    g0 = decode_tiff(synth_tiff([(4, 2, 0)]))[0]  # WhiteIsZero
    g1 = decode_tiff(synth_tiff([(4, 2, 1)]))[0]  # BlackIsZero
    n = 4 * 2
    assert g0["sum_r"] + g1["sum_r"] == 255 * n  # exact complements


def test_two_strip_reassembly():
    # height ≥ 2 → the writer splits into two strips; sums must match
    # the single-strip math exactly
    p = decode_tiff(synth_tiff([(3, 5, 1)]))[0]
    vals = [(i * 11) % 256 for i in range(15)]
    assert p["sum_r"] == sum(vals)


def test_non_baseline_refusals():
    blob = bytearray(synth_tiff([(2, 2, 1)]))
    # compression tag (259) value slot: find entry and set value to 5 (LZW)
    # entries start at offset 10 (header 8 + count 2), 12 bytes each, sorted
    # by tag: 256,257,258,259...; entry 3 is tag 259; value slot at +8
    entry = 10 + 12 * 3
    assert int.from_bytes(blob[entry : entry + 2], "little") == 259
    blob[entry + 8] = 5
    with pytest.raises(ValueError, match="compression 5"):
        decode_tiff(bytes(blob))
    with pytest.raises(ValueError, match="byte order"):
        decode_tiff(b"XX\x2a\x00" + b"\x00" * 8)


def test_corrupt_stream_fuzz_refuses_loudly():
    for big in (False, True):
        data = synth_tiff([(3, 3, 2), (2, 2, 1)], big=big)
        for cut in range(len(data)):
            try:
                decode_tiff(data[:cut])
            except ValueError:
                continue
        for pos in range(len(data)):
            mutated = bytearray(data)
            mutated[pos] ^= 0xFF
            try:
                decode_tiff(bytes(mutated))
            except ValueError:
                continue


def test_spark_plumbing(spark):
    df = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    out = tiff_roundtrip_features(df)
    assert out.count() == 16  # two pages per doc
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
