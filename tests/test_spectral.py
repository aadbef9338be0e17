"""Fixed-point spectrogram (functions/spectral.py — round 5): twiddle
table integrity, WAV roundtrip, DFT known vectors against numpy's float
FFT, dominant-bin tone recovery, overflow headroom, and Spark parity."""

import math

import numpy as np
import pytest

from prom_etl_db_spark.functions.spectral import (
    COS_Q15,
    HOP,
    N_BINS,
    N_FFT,
    Q15,
    SIN_Q15,
    decode_pcm16,
    fixture_samples,
    spectrogram_frame_features,
    spectrogram_power,
    synth_wav_pcm16,
    twiddle_values_sql,
)


def _py_power(x):
    """Reference fixed-point spectrogram in plain Python loops (no
    numpy matmul) — the independent arithmetic the Spark path must
    reproduce exactly."""
    wc, ws = COS_Q15, SIN_Q15
    nf = (len(x) - N_FFT) // HOP + 1
    out = {}
    for f in range(nf):
        win = x[f * HOP : f * HOP + N_FFT]
        for k in range(N_BINS):
            re = sum(int(win[n]) * wc[(k * n) % N_FFT] for n in range(N_FFT))
            im = -sum(int(win[n]) * ws[(k * n) % N_FFT] for n in range(N_FFT))
            out[(f, k)] = re * re + im * im
    return out


def test_twiddle_table_is_correctly_rounded_and_tie_free():
    # each entry is the nearest integer to cos/sin·2^15, and no exact
    # value sits near a half-integer (so round-half-even vs half-away
    # can never produce a different table — the oracle inlines these)
    for m in range(N_FFT):
        for tab, fn in ((COS_Q15, math.cos), (SIN_Q15, math.sin)):
            exact = fn(2 * math.pi * m / N_FFT) * Q15
            assert abs(tab[m] - exact) <= 0.5
            assert abs(abs(exact - math.floor(exact)) - 0.5) > 1e-6
    # symmetries of the sampled circle
    for m in range(N_FFT):
        assert COS_Q15[m] == -COS_Q15[(m + 16) % N_FFT]
        assert SIN_Q15[m] == COS_Q15[(m + 24) % N_FFT]
    assert COS_Q15[0] == Q15 and SIN_Q15[0] == 0


def test_twiddle_sql_literal_matches_table():
    sql = twiddle_values_sql()
    assert sql.count("(") == N_FFT
    assert f"(0, {Q15}, 0)" in sql
    assert f"(16, {-Q15}, 0)" in sql


def test_wav_roundtrip_bit_exact_and_refusals():
    x = np.array([0, 1, -1, 32767, -32768, 848, -848], dtype=np.int64)
    assert np.array_equal(decode_pcm16(synth_wav_pcm16(x)), x)
    # odd byte count (RIFF pad) still roundtrips
    y = np.array([5], dtype=np.int64)
    assert np.array_equal(decode_pcm16(synth_wav_pcm16(y)), y)
    with pytest.raises(ValueError):
        decode_pcm16(b"not a wav")
    with pytest.raises(ValueError):
        decode_pcm16(synth_wav_pcm16(x)[:-3])  # truncated data chunk
    with pytest.raises(ValueError):
        decode_pcm16(b"RIFF" + b"\x00" * 4 + b"WAVE")  # no data chunk


def test_fixture_headroom_and_shape():
    for d in range(0, 4000, 37):
        x = fixture_samples(d)
        assert len(x) == 16 * (2 + d % 3) + 16
        assert np.abs(x).max() <= 48 + 800  # proves the int64 power bound


def test_power_matches_float_fft_within_quantization():
    """The Q15 integer DFT is the float FFT up to twiddle quantization:
    each component differs by at most N·|x|max·0.5 = 32·848·0.5 ≈
    1.36e4 (at Q15 scale), so power differs by ≤ 2·|X|·1.36e4 + 1.36e4²
    — assert that analytic bound, bin by bin."""
    x = fixture_samples(123)
    p = _py_power(x)
    comp = N_FFT * int(np.abs(x).max()) * 0.5
    nf = (len(x) - N_FFT) // HOP + 1
    for f in range(nf):
        win = x[f * HOP : f * HOP + N_FFT].astype(np.float64)
        xf = np.fft.rfft(win)
        for k in range(N_BINS):
            ref = abs(xf[k]) ** 2 * Q15 * Q15
            got = p[(f, k)]
            # |X_fp|, |X_float| ≤ |X| + comp; bound uses the measured one
            bound = 2 * (abs(xf[k]) * Q15 + comp) * (2**0.5 * comp) + 2 * comp**2
            assert abs(got - ref) <= bound, (f, k)


def test_dominant_bin_recovers_planted_tone():
    for d in (1, 7, 44, 100, 1003):
        k0 = 1 + d % 15
        p = _py_power(fixture_samples(d))
        nf = max(f for f, _ in p) + 1
        for f in range(nf):
            dom = max(range(1, N_BINS), key=lambda k: (p[(f, k)], -k))
            assert dom == k0, (d, f)


def test_spark_parity_and_frame_features(spark):
    docs = spark.createDataFrame([(i,) for i in (0, 5, 12, 44)], ["doc_id"])
    rows = spectrogram_power(docs).collect()
    byid = {}
    for r in rows:
        byid.setdefault(r.media_id, {})[(r.frame, r.bin)] = r.power_fp
    for d, got in byid.items():
        assert got == _py_power(fixture_samples(d)), d
    # frame features: dominant bin is the planted tone; bands sum to total
    feats = spectrogram_frame_features(docs).collect()
    assert len(feats) == sum(2 + d % 3 for d in (0, 5, 12, 44))
    for r in feats:
        assert r.dominant_bin == 1 + r.media_id % 15
        assert r.e_low + r.e_mid + r.e_high == r.e_total


def test_vad_fixture_gates_tone_and_keeps_headroom():
    from prom_etl_db_spark.functions.spectral import (
        VAD_THRESHOLD,
        vad_fixture_samples,
    )

    for d in range(0, 300, 17):
        x = vad_fixture_samples(d)
        assert len(x) == 16 * (8 + d % 5) + 16
        assert np.abs(x).max() <= 848
        # gated blocks are residue-only (|x| ≤ 48)
        blk = (d + np.arange(len(x)) // 32) % 3 == 0
        assert np.abs(x[blk]).max() <= 48
    # frame energies split cleanly around the threshold with margin
    x = vad_fixture_samples(7)
    p = _py_power(x)
    nf = max(f for f, _ in p) + 1
    totals = [sum(p[(f, k)] for k in range(N_BINS)) for f in range(nf)]
    assert any(t >= 10 * VAD_THRESHOLD // 1 for t in totals)
    assert any(t <= VAD_THRESHOLD // 10 for t in totals)
    assert not any(VAD_THRESHOLD / 5 < t < VAD_THRESHOLD * 5 for t in totals)


def test_vad_segments_islands(spark):
    from prom_etl_db_spark.functions.spectral import (
        VAD_THRESHOLD,
        vad_fixture_samples,
        vad_segments,
    )

    ids = (0, 3, 7, 11)
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    rows = vad_segments(docs).collect()
    for d in ids:
        p = _py_power(vad_fixture_samples(d))
        nf = max(f for f, _ in p) + 1
        active = [
            f
            for f in range(nf)
            if sum(p[(f, k)] for k in range(N_BINS)) >= VAD_THRESHOLD
        ]
        # expected islands from the reference computation
        islands = []
        for f in active:
            if islands and f == islands[-1][-1] + 1:
                islands[-1].append(f)
            else:
                islands.append([f])
        got = sorted(
            (r.start_frame, r.end_frame, r.n_frames)
            for r in rows
            if r.media_id == d
        )
        assert got == sorted((i[0], i[-1], len(i)) for i in islands), d
        # segments never touch (they'd have merged), and all frames active
        for (s1, e1, _), (s2, _, _) in zip(got, got[1:]):
            assert s2 > e1 + 1


def test_fingerprint_neardup_pairs_acoustic_not_byte(spark):
    from prom_etl_db_spark.functions.spectral import fingerprint_neardup_pairs

    # 0 and 45: same k0 (45%15==0%15) and same nf (45%3==0%3) -> pair,
    # though their residue bytes differ; 0 and 1: different k0 -> no pair
    docs = spark.createDataFrame([(0,), (1,), (45,)], ["doc_id"])
    rows = fingerprint_neardup_pairs(docs).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(0, 45)]
    assert rows[0].fingerprint == ",".join(["1"] * rows[0].n_frames)


def test_resample_q15_properties():
    from prom_etl_db_spark.functions.spectral import resample_q15

    # constant signal -> constant output of the rational length
    x = np.full(80, 123, dtype=np.int64)
    y = resample_q15(x, 8000, 11025)
    assert len(y) == 80 * 11025 // 8000
    assert (y == 123).all()
    # a linear ramp stays a ramp under linear interpolation (within the
    # Q15 floor: monotone nondecreasing, endpoints preserved)
    r = np.arange(0, 400, 4, dtype=np.int64)
    yr = resample_q15(r, 8000, 16000)
    assert yr[0] == r[0] and (np.diff(yr) >= 0).all()
    # 2x upsample of a ramp interpolates the exact midpoints
    assert yr[1] == (r[0] + r[1]) // 2
    # downsample identity: fs_out == fs_in is the identity
    assert np.array_equal(resample_q15(r, 8000, 8000), r)
    # negative values floor toward -inf exactly like the SQL oracle
    neg = np.array([-100, 100], dtype=np.int64)
    y2 = resample_q15(neg, 2, 3)
    assert y2[0] == -100 and y2[1] == -100 + (200 * (32768 * 2 // 3) // 32768)


def test_speech_pipeline_recovers_tone_per_segment(spark):
    from prom_etl_db_spark.functions.spectral import (
        speech_segments_with_descriptors,
    )

    ids = (0, 4, 9)
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    rows = speech_segments_with_descriptors(docs).collect()
    assert rows, "fixture must produce active segments"
    for r in rows:
        # every segment's peak frame is tone-dominated -> planted bin
        assert r.peak_dominant_bin == 1 + r.media_id % 15, r
        assert r.end_frame - r.start_frame + 1 == r.n_frames
        assert r.seg_energy > 0
