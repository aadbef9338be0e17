"""Perceptual image hashing (functions/phash.py): hash algebra against
hand-computed vectors, planted-pair geometry, and banded-candidate
completeness vs the definitional all-pairs scan."""

import numpy as np
import pytest

from prom_etl_db_spark.functions.phash import (
    ahash_dark_count,
    dhash_bands,
    image_dhash_codes,
    phash_neardup_pairs,
    synth_gray,
)


def test_dhash_hand_vector():
    # Left half dark (0), right half bright (200): every coarse cell in
    # columns 0..3 is 0, columns 4..8 are 200 -> the only 1-bit per row
    # is NONE (left > right never true: 0>0 false, 0>200 false,
    # 200>200 false). Flip: bright left, dark right -> bit fires where
    # left cell > right cell, i.e. at the boundary column 3 and inside
    # the bright run nothing (200>200 false).
    img = np.zeros((16, 18), dtype=np.uint8)
    img[:, 8:] = 200  # coarse cols 4..8 bright
    assert dhash_bands(img) == [0] * 8
    img2 = np.zeros((16, 18), dtype=np.uint8)
    img2[:, :8] = 200  # coarse cols 0..3 bright, 4..8 dark
    # bit C fires iff cell C > cell C+1 -> only C=3 (200 > 0) -> 2^3
    assert dhash_bands(img2) == [8] * 8


def test_dhash_gradient_monotone_rows():
    # Strictly decreasing brightness left->right: every neighbor bit on.
    img = np.tile(np.arange(18, 0, -1, dtype=np.uint8) * 10, (16, 1))
    assert dhash_bands(img) == [255] * 8


def test_ahash_dark_count_hand_vector():
    img = np.zeros((16, 18), dtype=np.uint8)
    img[:, 8:] = 200
    # coarse grid: 4*8=32 cells at 0, 5*8=40 at 200; mean=(40*200*8?)..
    # exact: sum=40*200=8000 over 72 cells -> mean 111; dark = 32
    assert ahash_dark_count(img) == 32


def test_planted_pair_is_close_others_far():
    a = dhash_bands(synth_gray(100))
    b = dhash_bands(synth_gray(101))  # planted twin of 100
    c = dhash_bands(synth_gray(102))
    ham_ab = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    ham_ac = sum(bin(x ^ y).count("1") for x, y in zip(a, c))
    assert ham_ab <= 2
    assert ham_ac > 10


def test_codes_and_pairs_match_definitional(spark):
    n = 200
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    codes = image_dhash_codes(docs)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(codes, 6).collect()
    }
    # definitional all-pairs scan in plain Python
    ref_codes = {i: dhash_bands(synth_gray(i)) for i in range(n)}
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            h = sum(
                bin(x ^ y).count("1")
                for x, y in zip(ref_codes[i], ref_codes[j])
            )
            if h <= 6:
                want[(i, j)] = h
    assert got == want
    assert all(i % 50 == 1 and i == j + 1 for (j, i) in want)  # planted


def test_bands_incomplete_threshold_rejected(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    codes = image_dhash_codes(docs)
    with pytest.raises(ValueError, match="complete"):
        phash_neardup_pairs(codes, 8)


def test_codes_roundtrip_through_real_png(spark):
    # the operator itself asserts decode(encode(img)) == img per row;
    # a passing collect over a slice IS the roundtrip evidence
    docs = spark.createDataFrame([(i,) for i in range(37)], "doc_id long")
    rows = image_dhash_codes(docs).collect()
    assert len(rows) == 37
    for r in rows:
        assert all(0 <= r[f"d{i}"] <= 255 for i in range(8))
        assert 0 <= r["n_dark"] <= 72
