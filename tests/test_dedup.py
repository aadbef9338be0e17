"""Dedup / similarity / text-function tests (SURVEY.md §2.E).

Planted-duplicate fixtures: near-dup pairs the pipeline MUST find, and
disjoint documents it must NOT pair (no false positives at these sizes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions import dedup
from prom_etl_db_spark.functions.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_dup_pairs,
    ngram_jaccard_dup_pairs,
    simhash_signature,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "as morning light fills the quiet house with a gentle golden glow"
)
NEAR = BASE.replace("golden glow", "silver glow")  # one-word edit → near-dup
OTHER = (
    "completely different subject matter entirely about distributed query "
    "engines shuffling partitioned columnar data across executor nodes "
    "with adaptive optimization and broadcast hash join strategies enabled"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, "tiny"), (5, BASE)],
        "doc_id long, text string",
    )


def test_exact_dedup_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [(3, "x", 30.0), (1, "x", 10.0), (2, "y", 20.0)],
        "doc_id long, k string, v double",
    )
    out = exact_dedup(df, ["k"], "doc_id")
    got = {r["k"]: (r["doc_id"], r["v"]) for r in out.collect()}
    # min(doc_id) row survives, with ITS OWN other-column values
    assert got == {"x": (1, 10.0), "y": (2, 20.0)}


def test_word_shingles_values(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    out = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    assert out[0]["s"] == ["a b c", "b c d"]
    assert out[1]["s"] == []  # shorter than n → empty, not partial grams


def test_minhash_finds_planted_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_dup_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in pairs  # the one-word edit
    assert (1, 5) in pairs and pairs[(1, 5)] == 1.0  # the exact copy
    assert not any(3 in p or 4 in p for p in pairs)  # no false pairs


def test_minhash_dedup_keeps_smallest_id(docs):
    kept = {r["doc_id"] for r in minhash_dedup(docs, threshold=0.5).collect()}
    assert kept == {1, 3, 4}  # 2 and 5 deduped into 1


def test_ngram_jaccard_exact_value(spark):
    # doc1: grams {a b c, b c d} ; doc2: grams {a b c, b c e}
    # intersection 1, union 3 → jaccard 1/3
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    rows = ngram_jaccard_dup_pairs(df, threshold=0.1).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard"] == pytest.approx(1 / 3, abs=1e-6)


def test_ngram_jaccard_respects_threshold(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             ngram_jaccard_dup_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs
    assert not any(3 in p for p in pairs)


def test_ngram_df_cap_drops_hot_shingles_conservatively(spark):
    # "x y z" appears in ALL four docs (the stop-shingle); with cap=3 it
    # leaves the join, so pairs related ONLY through it vanish and the
    # surviving pair's jaccard is an UNDERestimate (full-size denominator).
    df = spark.createDataFrame(
        [
            (1, "x y z a b c d"),   # grams: xyz, yza, zab, abc, bcd
            (2, "x y z a b c e"),   # grams: xyz, yza, zab, abc, bce
            (3, "x y z p q r"),     # grams: xyz, yzp, zpq, pqr
            (4, "x y z s t u"),     # grams: xyz, yzs, zst, stu
        ],
        "doc_id long, text string",
    )
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_dup_pairs(df, threshold=0.05).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_dup_pairs(
            df, threshold=0.05, max_shingle_df=3
        ).collect()
    }
    # uncapped: every pair shares at least the hot shingle
    assert set(uncapped) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    # capped: pairs held together only by the hot shingle are gone
    assert set(capped) == {(1, 2)}
    # (1,2): inter drops 4→3, union stays 5+5-3=7 → 3/7, strictly below
    # the uncapped 4/6 — never an overestimate
    assert capped[(1, 2)] == pytest.approx(3 / 7, abs=1e-6)
    assert capped[(1, 2)] < uncapped[(1, 2)]


def test_ngram_df_cap_noop_when_no_bucket_is_hot(docs):
    # cap far above any fixture df → byte-identical results (the
    # registry runs the capped path; this pins its no-hot-bucket parity)
    base = sorted(map(tuple, ngram_jaccard_dup_pairs(docs, threshold=0.5).collect()))
    capped = sorted(map(tuple, ngram_jaccard_dup_pairs(
        docs, threshold=0.5, max_shingle_df=100
    ).collect()))
    assert base == capped


def test_simhash_deterministic_and_close_for_near_dups(docs):
    sig = {r["doc_id"]: r["simhash"] for r in simhash_signature(docs).collect()}
    sig2 = {r["doc_id"]: r["simhash"] for r in simhash_signature(docs).collect()}
    assert sig == sig2  # deterministic across runs
    assert sig[1] == sig[5]  # identical text → identical signature

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert hamming(sig[1], sig[2]) <= 6  # one-word edit → few bits flip
    assert hamming(sig[1], sig[3]) > 10  # unrelated text → far apart


def test_connected_components_chain_propagates_past_diameter_one(spark):
    # 1-2, 2-3, 3-4, 4-5: min label must travel 4 hops, not 1
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
    )
    out = {r["id"]: r["cluster_id"]
           for r in dedup.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_connected_components_raises_when_not_converged(spark):
    import pytest as _pytest

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with _pytest.raises(RuntimeError, match="converge"):
        dedup.connected_components(pairs, max_iterations=1)


def test_keep_canonical_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in dedup.keep_canonical(docs, pairs).collect())
    assert kept == [1, 9]  # cluster {1,2,3} → keep 1; 9 unpaired → kept


def test_bpe_like_token_count_hand_examples(spark):
    from prom_etl_db_spark.functions.text import bpe_like_token_count

    rows = [
        ("Hello, world!", 4),   # Hello | , | _world | !
        ("It's fine", 3),       # It | 's | _fine
        ("a1b2", 4),            # a | 1 | b | 2 (letter/digit runs split)
        ("   ", 0),             # blank → 0 by definition
        ("x  y", 3),            # x | one residual space | _y
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [
        r["n"]
        for r in df.select(bpe_like_token_count(F.col("text")).alias("n")).collect()
    ]
    assert got == [n for _, n in rows]


def test_image_header_parsing_real_formats(spark):
    from prom_etl_db_spark.functions.multimodal import (
        image_dimensions,
        image_header_features,
    )

    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    jpeg = (
        b"\xff\xd8"                                       # SOI
        + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"  # SOF0, 8-bit
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big") + b"\x03"
        + b"\x00" * 9
    )
    assert image_dimensions(png) == ("png", 640, 480)
    assert image_dimensions(gif) == ("gif", 320, 200)
    assert image_dimensions(jpeg) == ("jpeg", 640, 480)
    assert image_dimensions(b"not an image at all") is None

    media = spark.createDataFrame(
        [(1, "image", png, len(png)), (2, "image", gif, len(gif)),
         (3, "image", jpeg, len(jpeg)), (4, "image", b"junk", 4)],
        "media_id long, kind string, payload binary, n_bytes int",
    )
    got = {r["media_id"]: (r["format"], r["width"], r["height"])
           for r in image_header_features(media).collect()}
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("gif", 320, 200)
    assert got[3] == ("jpeg", 640, 480)
    assert got[4] == (None, None, None)


def test_image_header_adversarial_and_fill_bytes(spark):
    from prom_etl_db_spark.functions.multimodal import (
        image_dimensions,
        image_header_features,
    )

    # PNG header CLAIMING width 2^31 — must be None, and must not crash
    # the Arrow batch (Int32 cast) when it flows through the feature fn
    evil = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (2**31).to_bytes(4, "big") + (480).to_bytes(4, "big") + b"\x00" * 9
    )
    assert image_dimensions(evil) is None
    media = spark.createDataFrame(
        [(1, "image", evil, len(evil))],
        "media_id long, kind string, payload binary, n_bytes int",
    )
    row = image_header_features(media).collect()[0]
    assert (row["format"], row["width"], row["height"]) == (None, None, None)

    # ITU T.81 fill bytes (0xFF padding before a marker) must not desync
    jpeg_fill = (
        b"\xff\xd8\xff"                                  # SOI + fill byte
        + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big") + b"\x03"
        + b"\x00" * 9
    )
    assert image_dimensions(jpeg_fill) == ("jpeg", 640, 480)


def test_bmp_roundtrip_decodes_real_pixels():
    import numpy as np

    from prom_etl_db_spark.functions.multimodal import decode_bmp, synth_bmp

    f = decode_bmp(synth_bmp(5, 3, 200, 100, 50))
    assert (f["width"], f["height"]) == (5, 3)
    assert (f["mean_r"], f["mean_g"], f["mean_b"]) == (200.0, 100.0, 50.0)

    # a NON-solid BMP proves the decoder reads actual pixels, not headers:
    # hand-build 2x2 with distinct corner colors (stride pads 6 -> 8)
    px_rows = [
        bytes((10, 20, 30)) + bytes((40, 50, 60)) + b"\x00\x00",   # bottom row
        bytes((70, 80, 90)) + bytes((100, 110, 120)) + b"\x00\x00",
    ]
    base = synth_bmp(2, 2, 0, 0, 0)
    img = base[: 14 + 40] + b"".join(px_rows)
    f2 = decode_bmp(img)
    # means over the four BGR pixels
    assert f2["mean_b"] == np.mean([10, 40, 70, 100])
    assert f2["mean_g"] == np.mean([20, 50, 80, 110])
    assert f2["mean_r"] == np.mean([30, 60, 90, 120])

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_bmp(b"PNG pretending")
    with _pytest.raises(ValueError):
        decode_bmp(synth_bmp(4, 4, 1, 2, 3)[:30])  # truncated pixel array


def test_wav_roundtrip_decodes_real_samples():
    from prom_etl_db_spark.functions.multimodal import decode_wav, synth_wav

    f = decode_wav(synth_wav(400, 123))
    assert f["n_samples"] == 400
    assert f["sample_rate"] == 8000
    assert f["channels"] == 1
    assert f["rms"] == 123.0  # alternating +/-123 -> RMS exactly 123
    assert f["duration_s"] == 400 / 8000

    # an extra chunk BEFORE data must not desync the RIFF walk
    wav = synth_wav(10, 7)
    fmt_end = 12 + 8 + 16
    padded = wav[:fmt_end] + b"LIST" + (4).to_bytes(4, "little") + b"INFO" + wav[fmt_end:]
    padded = padded[:4] + (len(padded) - 8).to_bytes(4, "little") + padded[8:]
    assert decode_wav(padded)["n_samples"] == 10

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_real_decode_dispatches_bmp_png_wav_and_stubs_lossy():
    import numpy as _np
    import pytest as _pytest

    from prom_etl_db_spark.functions.multimodal import (
        encode_png,
        real_decode,
        synth_bmp,
        synth_wav,
    )

    assert real_decode(synth_bmp(2, 2, 9, 9, 9), "image")["format"] == "bmp"
    assert real_decode(synth_wav(10, 5), "audio")["format"] == "wav"
    png = encode_png(_np.full((3, 2, 3), 42, dtype=_np.uint8))
    assert real_decode(png, "image") == {
        "format": "png", "width": 2, "height": 3,
        "mean_r": 42.0, "mean_g": 42.0, "mean_b": 42.0,
    }
    # JPEG is REAL as of r4 (functions/jpeg.py) — dispatch proves it
    from prom_etl_db_spark.functions.jpeg import encode_jpeg

    jf = real_decode(encode_jpeg(_np.full((8, 8), 77, _np.uint8),
                                 qtables="flat"), "image")
    assert jf["format"] == "jpeg" and jf["mean_r"] == 77.0
    with _pytest.raises(NotImplementedError):
        real_decode(b"ID3\x04...mp3ish", "audio")  # MP3: env-stubbed


def test_png_codec_reconstructs_every_filter_type():
    """The encoder cycles filters None/Sub/Up/Average/Paeth by row, so a
    ≥5-row roundtrip exercises every reconstruction branch; random pixel
    content makes a wrong branch certain to corrupt some byte."""
    import numpy as _np
    import pytest as _pytest

    from prom_etl_db_spark.functions.multimodal import (
        decode_png,
        encode_png,
        png_pixels,
    )

    rng = _np.random.default_rng(123)
    px = rng.integers(0, 256, (9, 7, 3), dtype=_np.uint8)
    assert (png_pixels(encode_png(px)) == px).all()
    f = decode_png(encode_png(px))
    assert f["width"] == 7 and f["height"] == 9
    assert f["mean_r"] == _pytest.approx(px[:, :, 0].mean())

    with _pytest.raises(ValueError):
        png_pixels(b"BM not a png")
    with _pytest.raises(ValueError):
        png_pixels(encode_png(px)[:40])  # truncated: no IDAT
    # unsupported bit depth must refuse, not garble
    bad = bytearray(encode_png(px))
    bad[24] = 16  # IHDR depth byte
    with _pytest.raises(ValueError):
        png_pixels(bytes(bad))


def test_media_roundtrip_operators_match_closed_forms(spark):
    from prom_etl_db_spark.functions.multimodal import (
        bmp_roundtrip_features,
        wav_roundtrip_features,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in (0, 1, 17, 255, 511, 999)], "doc_id long, text string"
    )
    bmp = {r["media_id"]: r for r in bmp_roundtrip_features(docs).collect()}
    assert bmp[17]["width"] == 17 % 16 + 1 and bmp[17]["height"] == 17 % 8 + 1
    assert bmp[511]["mean_r"] == float(511 % 256)
    assert bmp[999]["mean_g"] == float((999 * 7) % 256)
    wav = {r["media_id"]: r for r in wav_roundtrip_features(docs).collect()}
    assert wav[999]["rms"] == float(999 % 1000)
    assert wav[0]["rms"] == 0.0
    assert wav[17]["n_samples"] == (17 % 50 + 1) * 100


def test_minhash_md5_signature_estimates_jaccard(docs, spark):
    """The md5-permutation signature is (a) deterministic, (b) identical
    for identical texts, and (c) an unbiased Jaccard estimator: equal
    signature positions / k approximates the exact shingle Jaccard."""
    sig_df = docs.where(dedup.has_min_words(F.col("text"), 3)).select(
        "doc_id",
        dedup.minhash_signature_md5(word_shingles(F.col("text"), 3), 32).alias("sig"),
    )
    sigs = {r["doc_id"]: r["sig"] for r in sig_df.collect()}
    assert sigs[1] == sigs[5]  # identical text, identical signature
    assert sig_df.collect() == sig_df.collect()  # deterministic re-eval

    est = sum(a == b for a, b in zip(sigs[1], sigs[2])) / 32
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    true_j = len(sh[1] & sh[2]) / len(sh[1] | sh[2])
    assert abs(est - true_j) < 0.25  # k=32 -> sigma ~ sqrt(j(1-j)/32) ~ 0.09
    disjoint = sum(a == b for a, b in zip(sigs[1], sigs[3])) / 32
    assert disjoint == 0.0  # no shared shingles -> no collisions at 64 bits


def test_minhash_band_pairs_md5_subset_of_exact(docs, spark):
    """Every pair the md5 band pipeline emits must also be an exact-
    Jaccard pair with the same (rounded) value — banding can only lose
    recall, never precision (the verify stage recomputes true Jaccard)."""
    banded = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_band_dup_pairs_md5(docs, threshold=0.2).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_dup_pairs(docs, threshold=0.2).collect()
    }
    assert banded, "identical docs 1 and 5 must band together"
    for pair, j in banded.items():
        assert pair in exact and exact[pair] == j
    assert banded[(1, 5)] == 1.0  # identical texts: all bands collide


def test_gif_codec_known_vector_and_roundtrips():
    """Decoder interop proof: the canonical hand-assembled 1x1 white-pixel
    GIF (2-color table, LZW data 0x44 0x01 = clear, index 0, EOI) decodes
    correctly — a self-consistent-but-wrong LZW width rule would fail
    here. Roundtrips then cover width growth, the 4096-entry table reset
    (clear-code path), 256- and 2-color palettes."""
    import numpy as _np
    import pytest as _pytest

    from prom_etl_db_spark.functions.multimodal import (
        decode_gif,
        encode_gif,
        gif_pixels,
        real_decode,
    )

    onepx = bytes(
        [0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00, 0x80,
         0x00, 0x00, 0xFF, 0xFF, 0xFF, 0x00, 0x00, 0x00,
         0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00,
         0x2C, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
         0x02, 0x02, 0x44, 0x01, 0x00, 0x3B]
    )
    assert (gif_pixels(onepx) == [[[255, 255, 255]]]).all()
    assert real_decode(onepx, "image")["format"] == "gif"

    rng = _np.random.default_rng(7)
    pal64 = [((3 * i) % 256, (5 * i) % 256, (7 * i) % 256) for i in range(64)]
    # 100x120 random indices: > 4095 LZW misses, so the encoder emits a
    # mid-stream clear and both sides rebuild the table
    big = rng.integers(0, 64, size=(100, 120), dtype=_np.uint8)
    assert (
        gif_pixels(encode_gif(big, pal64))
        == _np.array(pal64, dtype=_np.uint8)[big]
    ).all()
    pal256 = [(i, (2 * i) % 256, (3 * i) % 256) for i in range(256)]
    px256 = rng.integers(0, 256, size=(31, 9), dtype=_np.uint8)
    assert (
        gif_pixels(encode_gif(px256, pal256))
        == _np.array(pal256, dtype=_np.uint8)[px256]
    ).all()
    pal2 = [(0, 0, 0), (255, 255, 255)]
    bits = rng.integers(0, 2, size=(5, 13), dtype=_np.uint8)
    assert (
        gif_pixels(encode_gif(bits, pal2))
        == _np.array(pal2, dtype=_np.uint8)[bits]
    ).all()

    f = decode_gif(encode_gif(bits, pal2))
    assert f["width"] == 13 and f["height"] == 5
    assert f["mean_r"] == _pytest.approx(255.0 * bits.mean())

    with _pytest.raises(ValueError):
        gif_pixels(b"BM not a gif")
    with _pytest.raises(ValueError):
        encode_gif(bits, pal2 + [(1, 1, 1)])  # non-power-of-two palette
    # interlace flag must refuse, not garble
    g = bytearray(encode_gif(bits, pal2))
    # image descriptor packed byte: 0x2C offset + 9 bytes into descriptor
    desc = g.index(0x2C, 13 + 6)
    g[desc + 9] |= 0x40
    with _pytest.raises(ValueError):
        gif_pixels(bytes(g))


def test_gif_lzw_roundtrip_property():
    """Property: ANY index stream roundtrips through the GIF LZW pair —
    random sizes, palette depths, and content mixes (runs favor deep
    dictionary chains; uniform noise favors width growth and resets)."""
    import numpy as _np
    from hypothesis import given, settings, strategies as st

    from prom_etl_db_spark.functions.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=2, max_value=8),  # min code size (palette depth)
        st.integers(min_value=0, max_value=2**31 - 1),
        st.integers(min_value=1, max_value=9000),
        st.sampled_from(["uniform", "runs", "two-symbol"]),
    )
    def check(mcs, seed, n, flavor):
        rng = _np.random.default_rng(seed)
        hi = 1 << mcs
        if flavor == "uniform":
            data = rng.integers(0, hi, size=n, dtype=_np.uint8)
        elif flavor == "runs":
            data = _np.repeat(
                rng.integers(0, hi, size=max(1, n // 8), dtype=_np.uint8), 8
            )[:n]
        else:
            data = (rng.integers(0, 2, size=n, dtype=_np.uint8) * (hi - 1)).astype(
                _np.uint8
            )
        raw = data.tobytes()
        assert _lzw_decode_gif(mcs, _lzw_encode_gif(mcs, raw)) == raw

    check()


def test_gif_local_color_table_and_gif87a():
    """Hand-assembled GIF87a with NO global table and a LOCAL color
    table on the image descriptor — the decoder branch the encoder never
    produces (it always writes a GCT)."""
    import numpy as _np

    from prom_etl_db_spark.functions.multimodal import (
        _lzw_encode_gif,
        gif_pixels,
    )

    idx = _np.array([[0, 1], [1, 0]], dtype=_np.uint8)
    lzw = _lzw_encode_gif(2, idx.tobytes())
    g = bytearray(b"GIF87a")
    g += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    g += bytes((0x00, 0x00, 0x00))  # no GCT
    g += b"\x2c" + b"\x00\x00\x00\x00"
    g += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    g.append(0x80)  # local color table, size field 0 -> 2 entries
    g += bytes((10, 20, 30)) + bytes((200, 210, 220))  # the LCT
    g.append(2)  # min code size
    g.append(len(lzw))
    g += lzw
    g += b"\x00\x3b"
    px = gif_pixels(bytes(g))
    assert (px[0, 0] == [10, 20, 30]).all()
    assert (px[0, 1] == [200, 210, 220]).all()
    assert (px[1, 1] == [10, 20, 30]).all()

    # no GCT and no LCT -> must refuse, not crash
    import pytest as _pytest

    bad = bytearray(g)
    bad[bad.index(0x2C) + 9] = 0x00  # clear the LCT flag
    del bad[bad.index(0x2C) + 10 : bad.index(0x2C) + 16]
    with _pytest.raises(ValueError):
        gif_pixels(bytes(bad))


def test_scratch_release_frees_operator_caches(spark):
    """Multi-pass operators persist() intermediates and register them as
    scratch; release_scratch() at the job boundary must leave NO cached
    RDD blocks behind (the CacheManager would otherwise pin them for the
    session lifetime — the serve-daemon leak)."""
    from prom_etl_db_spark.functions.scratch import release_scratch

    docs = spark.createDataFrame(
        [(i, f"w{i} common text tail {' '.join(str(j) for j in range(6))}")
         for i in range(8)],
        "doc_id long, text string",
    )
    # assert on the REGISTERED frames themselves, not global storage
    # counts — other tests' localCheckpoint blocks come and go with the
    # ContextCleaner, which made any whole-session census racy
    from prom_etl_db_spark.functions import scratch as scratch_mod

    release_scratch(all_threads=True)  # drain earlier tests' registrations
    dedup.minhash_band_dup_pairs_md5(docs, threshold=0.0).collect()
    frames = [f for _, fs in scratch_mod._SCRATCH.values() for f in fs]
    assert len(frames) >= 2  # base shingles + banded triples registered
    assert all(
        f.storageLevel.useMemory or f.storageLevel.useDisk for f in frames
    )
    released = release_scratch()
    assert released == len(frames)
    assert all(
        not (f.storageLevel.useMemory or f.storageLevel.useDisk)
        for f in frames
    )


def test_scratch_release_is_scoped_to_the_calling_job(spark):
    """One job's boundary release must NOT unpersist a concurrent job's
    live caches (ADVICE r3): frames registered by a still-running other
    thread survive; frames from exited threads are reaped."""
    import threading

    from prom_etl_db_spark.functions import scratch as scratch_mod
    from prom_etl_db_spark.functions.scratch import release_scratch, scratch

    release_scratch(all_threads=True)
    df_other = spark.range(4).persist()
    df_other.count()
    hold = threading.Event()
    started = threading.Event()

    def other_job():
        scratch(df_other)
        started.set()
        hold.wait(timeout=30)

    t = threading.Thread(target=other_job)
    t.start()
    started.wait(timeout=30)
    try:
        df_mine = scratch(spark.range(3).persist())
        df_mine.count()
        assert release_scratch() == 1  # only my frame
        assert df_other.storageLevel.useMemory  # other job untouched
    finally:
        hold.set()
        t.join(timeout=30)
    # the other thread has exited without releasing: the next boundary
    # release reaps its stranded frames so they cannot leak
    assert release_scratch() == 1
    assert not df_other.storageLevel.useMemory


def test_exact_dedup_survivor_is_one_row_not_stitched(spark):
    # per-column min_by could stitch c1 from row A and c2 from row B when
    # two rows tie on order_col; the single-struct form keeps the payload
    # from ONE row, and tiebreakers pin WHICH one
    rows = [
        ("k", 1, "a1", "b1", 10),
        ("k", 1, "a2", "b2", 5),  # ties on ord; uid 5 < 10
    ]
    df = spark.createDataFrame(rows, "k string, ord int, c1 string, c2 string, uid int")
    out = exact_dedup(df, ["k"], "ord", tiebreakers=["uid"]).collect()
    assert len(out) == 1
    r = out[0]
    # whole row comes from uid=5: never (a1, b2) or (a2, b1)
    assert (r["c1"], r["c2"], r["uid"]) == ("a2", "b2", 5)


def test_exact_dedup_keys_and_order_only(spark):
    # no payload columns at all (the registry dedup_exact shape)
    df = spark.createDataFrame(
        [("k", 3), ("k", 1), ("j", 2)], "k string, ord int"
    )
    out = {r["k"]: r["ord"] for r in exact_dedup(df, ["k"], "ord").collect()}
    assert out == {"k": 1, "j": 2}


def test_edit_verified_dup_pairs_exact_distance_and_candidate_gating(spark):
    """r5: banding generates candidates (docs sharing no shingles never
    pair), and the verifier is the exact character-level DP — the
    appended-suffix pair measures edit_dist == the suffix length."""
    from prom_etl_db_spark.functions.dedup import edit_verified_dup_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta"),
            (3, "totally different words over here now"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in edit_verified_dup_pairs(docs, max_edit_ratio=0.6).collect()
    }
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["edit_dist"] == len(" eta")
    assert r["max_len"] == len("alpha beta gamma delta epsilon zeta eta")
    assert all(3 not in k for k in rows)  # never a candidate
