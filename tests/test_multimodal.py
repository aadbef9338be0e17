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
