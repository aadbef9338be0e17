"""YUV4MPEG2 codec + BT.601 integer colorimetry (functions/video.py)."""

import numpy as np
import pytest

from prom_etl_db_spark.functions.video import (
    encode_y4m,
    parse_y4m,
    yuv_to_rgb_bt601,
)


def _frame(h=8, w=16, seed=0, cs=(2, 2)):
    rng = np.random.RandomState(seed)
    return (
        rng.randint(0, 256, (h, w)).astype(np.uint8),
        rng.randint(0, 256, (h // cs[1], w // cs[0])).astype(np.uint8),
        rng.randint(0, 256, (h // cs[1], w // cs[0])).astype(np.uint8),
    )


def test_roundtrip_c420_multiframe():
    frames = [_frame(seed=s) for s in range(3)]
    params, got = parse_y4m(encode_y4m(frames, fps=(30000, 1001)))
    assert params == {
        "width": 16, "height": 8, "fps_num": 30000, "fps_den": 1001,
        "interlace": "p", "colorspace": "C420jpeg",
    }
    assert len(got) == 3
    for (ye, ue, ve), (yg, ug, vg) in zip(frames, got):
        assert np.array_equal(ye, yg)
        assert np.array_equal(ue, ug)
        assert np.array_equal(ve, vg)


@pytest.mark.parametrize("cs,divs", [("C422", (2, 1)), ("C444", (1, 1))])
def test_roundtrip_other_colorspaces(cs, divs):
    frames = [_frame(seed=7, cs=divs)]
    params, got = parse_y4m(encode_y4m(frames, colorspace=cs))
    assert params["colorspace"] == cs
    assert got[0][1].shape == (8 // divs[1], 16 // divs[0])
    assert np.array_equal(got[0][2], frames[0][2])


def test_header_known_vector_bytes():
    data = encode_y4m([_frame()], fps=(25, 1))
    assert data.startswith(b"YUV4MPEG2 W16 H8 F25:1 Ip A1:1 C420jpeg\nFRAME\n")
    # frame payload size: 16*8 + 2*(8*4) = 192 bytes exactly
    assert len(data) == data.find(b"FRAME\n") + 6 + 192


def test_parse_skips_x_tags_defaults_c420():
    y, u, v = _frame()
    raw = (b"YUV4MPEG2 W16 H8 F25:1 Xcustom\nFRAME\n"
           + y.tobytes() + u.tobytes() + v.tobytes())
    params, got = parse_y4m(raw)
    assert params["colorspace"] == "C420jpeg" and len(got) == 1


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"JUNK" + d[4:],                      # bad magic
        lambda d: d[: d.find(b"FRAME") + 40],           # truncated frame
        lambda d: d.replace(b"FRAME\n", b"FRAMX\n", 1), # bad marker
        lambda d: d.replace(b" W16", b" W15", 1),       # odd width for 420
        lambda d: d.replace(b" Ip", b" Qz", 1),         # unknown tag
    ],
)
def test_corrupt_streams_raise(mutate):
    data = encode_y4m([_frame()])
    with pytest.raises(ValueError):
        parse_y4m(mutate(data))


def test_bt601_known_vectors():
    # (Y,U,V) -> (R,G,B): limited-range black, white, 75% red
    y = np.array([[16, 235, 81]], dtype=np.uint8)
    u = np.array([[128, 128, 90]], dtype=np.uint8)
    v = np.array([[128, 128, 240]], dtype=np.uint8)
    rgb = yuv_to_rgb_bt601(y, u, v)
    assert rgb.tolist() == [[[0, 0, 0], [255, 255, 255], [255, 0, 0]]]


def test_bt601_chroma_upsampling_sample_and_hold():
    y = np.full((2, 4), 126, dtype=np.uint8)
    u = np.array([[0, 255]], dtype=np.uint8)   # (1, 2) -> 2x2 blocks
    v = np.full((1, 2), 128, dtype=np.uint8)
    rgb = yuv_to_rgb_bt601(y, u, v)
    # left 2x2 block shares u=0, right shares u=255 -> blue differs
    assert (rgb[:, :2, 2] == rgb[0, 0, 2]).all()
    assert (rgb[:, 2:, 2] == rgb[0, 2, 2]).all()
    assert int(rgb[0, 0, 2]) < int(rgb[0, 2, 2])
