"""Real byte-level media codecs: BMP resize, WAV decimation (functions/multimodal.py)."""
# -- resize / decimate (real pixel & sample transforms) ---------------------


def test_bmp_resize_nearest_neighbor_exact():
    import numpy as np

    from prom_etl_db_spark.functions.multimodal import (
        bmp_pixels,
        encode_bmp,
        resize_bmp,
    )

    # 2x2 checkerboard: BGR white/black / black/white (top-down array)
    board = np.array(
        [[[255, 255, 255], [0, 0, 0]], [[0, 0, 0], [255, 255, 255]]],
        dtype=np.uint8,
    )
    payload = encode_bmp(board)
    assert (bmp_pixels(payload) == board).all()  # encode/decode roundtrip

    up = bmp_pixels(resize_bmp(payload, 4, 4))
    # nearest-neighbor 2x upscale: each source pixel becomes a 2x2 block
    expect = board.repeat(2, axis=0).repeat(2, axis=1)
    assert (up == expect).all()

    down = bmp_pixels(resize_bmp(resize_bmp(payload, 4, 4), 2, 2))
    # src = floor(dst*4/2) picks rows/cols 0 and 2 -> the original board
    assert (down == board).all()


def test_bmp_resize_rejects_degenerate_target():
    import pytest as _pytest

    from prom_etl_db_spark.functions.multimodal import resize_bmp, synth_bmp

    with _pytest.raises(ValueError):
        resize_bmp(synth_bmp(2, 2, 1, 2, 3), 0, 4)


def test_wav_decimation_halves_rate_and_keeps_rms():
    from prom_etl_db_spark.functions.multimodal import decode_wav, decimate_wav, synth_wav

    wav = synth_wav(1000, 700, sample_rate=8000)
    out = decode_wav(decimate_wav(wav, 2))
    assert out["n_samples"] == 500 and out["sample_rate"] == 4000
    # duration is preserved by construction (n/2 samples at rate/2)
    assert out["duration_s"] == 0.125
    # the alternating +-amp signal decimated by 2 keeps only +amp samples;
    # RMS is still exactly amp - the aliasing the docstring warns about,
    # demonstrated concretely (a DC signal emerged from a square wave)
    assert out["rms"] == 700.0


def test_wav_decimation_factor_one_is_identity():
    from prom_etl_db_spark.functions.multimodal import decode_wav, decimate_wav, synth_wav

    wav = synth_wav(64, 123, sample_rate=8000, channels=2)
    a, b = decode_wav(wav), decode_wav(decimate_wav(wav, 1))
    assert a == b


def test_audio_features_pure_sine_and_square():
    """audio_features is a real FFT pipeline: a 440 Hz sine's spectral
    centroid lands on 440 (±1 Hz for leakage) with zcr = 2f/fs; the
    fixture's alternating square wave is pure Nyquist (4000 Hz, zcr 1,
    bandwidth ~0); silence is all-zero with no div-by-zero."""
    import numpy as np

    from prom_etl_db_spark.functions.multimodal import audio_features, synth_wav

    sq = audio_features(synth_wav(400, 123))
    assert sq["zcr"] == 1.0 and sq["peak"] == 123.0
    assert abs(sq["spectral_centroid_hz"] - 4000.0) < 1e-6
    assert sq["spectral_bandwidth_hz"] < 0.05

    silent = audio_features(synth_wav(400, 0))
    assert (silent["zcr"], silent["peak"]) == (0.0, 0.0)
    assert silent["spectral_centroid_hz"] == 0.0

    n, rate, freq, amp = 8000, 8000, 440.0, 10000
    s = (amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)).astype(np.int16)
    data = s.tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    wav = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    sine = audio_features(wav)
    assert abs(sine["spectral_centroid_hz"] - freq) < 1.0
    assert abs(sine["zcr"] - 2 * freq / rate) < 0.01
    assert sine["peak"] == amp


def test_animated_gif_roundtrip_and_uniform_sampling():
    """Animated GIF89a: every frame survives the encode→decode roundtrip
    bit-exactly (per-frame LZW streams, GCE/NETSCAPE extension skipping),
    and uniform-K sampling picks floor(j·(F−1)/(k−1)) with endpoints."""
    import numpy as np

    from prom_etl_db_spark.functions.multimodal import (
        encode_gif_animation,
        gif_frames,
        gif_pixels,
        sample_gif_frames,
    )

    palette = [((3 * i) % 256, (5 * i) % 256, (7 * i) % 256) for i in range(64)]
    pal = np.array(palette, dtype=np.uint8)
    frames = [
        ((7 * f + 3 * np.arange(6)[None, :] + 5 * np.arange(4)[:, None]) % 64)
        .astype(np.uint8)
        for f in range(5)
    ]
    payload = encode_gif_animation(frames, palette)
    dec = gif_frames(payload)
    assert len(dec) == 5
    for f in range(5):
        assert (dec[f] == pal[frames[f]]).all()
    # first-frame view stays the still-image API
    assert (gif_pixels(payload) == pal[frames[0]]).all()
    assert [(j, fi) for j, fi, _ in sample_gif_frames(payload, 3)] == [
        (0, 0), (1, 2), (2, 4),
    ]
    # k > F repeats endpoints rather than inventing frames
    assert [fi for _, fi, _ in sample_gif_frames(payload, 9)] == [
        0, 0, 1, 1, 2, 2, 3, 3, 4,
    ]
    assert [fi for _, fi, _ in sample_gif_frames(payload, 1)] == [0]


def test_audio_features_zero_sample_rate_and_multi_data_chunk():
    from prom_etl_db_spark.functions.multimodal import audio_features, synth_wav

    # sample_rate=0: decode_wav tolerates it (duration 0.0) — features
    # must report time-domain zcr/peak and zero spectra, not divide by 0
    f0 = audio_features(synth_wav(100, 500, sample_rate=0))
    assert f0["zcr"] == 1.0 and f0["peak"] == 500.0
    assert f0["spectral_centroid_hz"] == 0.0
    assert f0["spectral_bandwidth_hz"] == 0.0

    # two data chunks: decode_wav keeps the LAST — zcr/peak/spectra must
    # come from the same chunk as rms, not the first
    base = synth_wav(50, 100)  # chunk A: ±100 square wave
    import numpy as np

    quiet = np.full(50, 7, dtype="<i2").tobytes()  # chunk B: constant 7
    extra = b"data" + len(quiet).to_bytes(4, "little") + quiet
    riff_len = int.from_bytes(base[4:8], "little") + len(extra)
    two = b"RIFF" + riff_len.to_bytes(4, "little") + base[8:] + extra
    f = audio_features(two)
    assert f["rms"] == 7.0          # decode_wav: last chunk
    assert f["peak"] == 7.0         # features: SAME chunk
    assert f["zcr"] == 0.0          # constant signal never crosses zero
