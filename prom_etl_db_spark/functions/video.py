"""MJPEG-in-AVI video container codec — pure stdlib, from the public
RIFF/AVI format (Microsoft "AVI RIFF File Reference") + our own baseline
JPEG codec (``functions.jpeg``).

Round 4: with JPEG decode real, a VIDEO decode path becomes fully
implementable from bytes — Motion-JPEG stores each frame as an
independent baseline JPEG inside RIFF ``00dc`` chunks, no inter-frame
prediction. This clears "video containers" from the environment-stub
list for the one video codec that needs no entropy machinery beyond
JPEG's: real container walk, real per-frame pixel decode, real
uniform-K frame sampling (same sampling contract as the animated-GIF
path, ``multimodal.sample_gif_frames``).

Scope: AVI with a single MJPG video stream. Writer emits a spec-valid
file (hdrl with avih/strh/strf, movi with even-padded 00dc chunks,
idx1 keyframe index); reader walks any single-video-stream AVI,
tolerates '00db' uncompressed-flagged chunks that still hold JPEG
bytes (encoders disagree), and refuses non-MJPEG streams loudly.
Inter-frame codecs (H.26x, VP9, AV1) remain environment-limited — they
need arithmetic coders and motion compensation, not a container walk.

Reference parity note: the reference system (samzong/prom-etl-db) has
no media path at all — this is E4 extension surface (SURVEY.md §2.E).
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_avi_mjpeg",
    "avi_mjpeg_frames",
    "avi_frame_count",
    "sample_avi_frames",
    "encode_y4m",
    "parse_y4m",
    "yuv_to_rgb_bt601",
]


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are even-aligned
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: list[bytes], *, fps: int = 10) -> bytes:
    """A real, valid single-stream Motion-JPEG AVI from a list of JPEG
    byte strings (one per frame). Dimensions come from the first frame's
    SOF header; every frame must be a JPEG (SOI-led)."""
    from prom_etl_db_spark.functions.multimodal import image_dimensions

    if not frames:
        raise ValueError("AVI needs at least one frame")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("every MJPEG frame must be a JPEG payload")
    dims = image_dimensions(frames[0])
    if dims is None:
        raise ValueError("first frame has no parseable JPEG dimensions")
    _, w, h = dims
    max_bytes = max(len(f) for f in frames)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            len(frames),  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: variable-size frames)
        )
        + struct.pack("<4h", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        max_bytes,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    offsets = []
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position; the
        # first chunk sits 4 bytes after it
        offsets.append(4 + len(movi_body))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_body))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
            for off, f in zip(offsets, frames)
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_avi(payload: bytes):
    """Yield (fourcc, body) for every top-level-and-movi chunk we care
    about; validates the RIFF/AVI envelope."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    declared = struct.unpack("<I", payload[4:8])[0]
    if declared + 8 > len(payload) + 1:  # +1: final pad byte may be absent
        raise ValueError("AVI RIFF size exceeds payload")
    pos = 12
    end = min(len(payload), 8 + declared)
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated AVI chunk")
        yield fourcc, body
        pos += 8 + size + (size % 2)


def avi_mjpeg_frames(payload: bytes) -> list[bytes]:
    """REAL container decode: walk the RIFF tree, check the stream is
    MJPG (strf.biCompression), and return the per-frame JPEG payloads
    from the movi list's 00dc/00db chunks, in stream order."""
    compression = None
    frames: list[bytes] = []
    for fourcc, body in _walk_avi(payload):
        if fourcc == b"LIST" and body[:4] == b"hdrl":
            # find strf inside: LIST strl -> strf (BITMAPINFOHEADER)
            i = 4
            while i + 8 <= len(body):
                cc = body[i : i + 4]
                sz = struct.unpack("<I", body[i + 4 : i + 8])[0]
                inner = body[i + 8 : i + 8 + sz]
                if cc == b"LIST" and inner[:4] == b"strl":
                    j = 4
                    while j + 8 <= len(inner):
                        cc2 = inner[j : j + 4]
                        sz2 = struct.unpack("<I", inner[j + 4 : j + 8])[0]
                        if cc2 == b"strf":
                            compression = inner[j + 8 + 16 : j + 8 + 20]
                        j += 8 + sz2 + (sz2 % 2)
                i += 8 + sz + (sz % 2)
        elif fourcc == b"LIST" and body[:4] == b"movi":
            i = 4
            while i + 8 <= len(body):
                cc = body[i : i + 4]
                sz = struct.unpack("<I", body[i + 4 : i + 8])[0]
                if cc[2:4] in (b"dc", b"db"):
                    frames.append(bytes(body[i + 8 : i + 8 + sz]))
                i += 8 + sz + (sz % 2)
    if compression is not None and compression not in (b"MJPG", b"mjpg"):
        raise ValueError(
            f"unsupported AVI video codec {compression!r} — only MJPG "
            "(inter-frame codecs need more than a container walk)"
        )
    if not frames:
        raise ValueError("AVI has no video frames")
    return frames


def avi_frame_count(payload: bytes) -> int:
    return len(avi_mjpeg_frames(payload))


def sample_avi_frames(payload: bytes, k: int):
    """Uniform-K frame sampling from an MJPEG AVI, fully decoding each
    sampled frame to pixels — the same sampling contract as the
    animated-GIF path (``multimodal.sample_gif_frames``): position j in
    0..k−1 maps to frame index floor(j·(F−1)/(k−1)), endpoints
    included, repeats allowed when k > F. Returns [(j, frame_index,
    (h, w, 3) uint8 array), ...]."""
    from prom_etl_db_spark.functions.jpeg import jpeg_pixels

    frames = avi_mjpeg_frames(payload)
    nf = len(frames)
    if k < 1:
        raise ValueError("k must be >= 1")
    picks = [0] if k == 1 else [(j * (nf - 1)) // (k - 1) for j in range(k)]
    return [(j, fi, jpeg_pixels(frames[fi])) for j, fi in enumerate(picks)]


# ---------------------------------------------------------------------------
# YUV4MPEG2 (.y4m) — the RAW video interchange format (public mjpegtools
# spec): one ASCII parameter line, then uncompressed planar YUV frames
# behind FRAME markers. This is the format video pipelines actually pass
# between tools before/after codecs, and — being raw — it needs no
# entropy machinery at all: the decode path is header parsing + plane
# slicing + colorimetry. BT.601 conversion below uses the classic
# integer fixed-point form, so every decoded RGB value is exact integer
# arithmetic (SQL-replayable).
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"
# plane-size rule per colorspace tag prefix: (chroma_w_div, chroma_h_div)
_Y4M_SUBSAMPLE = {"C420": (2, 2), "C422": (2, 1), "C444": (1, 1)}


def _y4m_subsample(ctag: str) -> tuple[int, int]:
    for prefix, divs in _Y4M_SUBSAMPLE.items():
        if ctag.startswith(prefix):
            return divs
    raise ValueError(f"unsupported Y4M colorspace {ctag!r}")


def encode_y4m(frames, *, fps=(25, 1), colorspace: str = "C420jpeg") -> bytes:
    """A real, valid YUV4MPEG2 writer from [(Y, U, V) uint8 plane
    triples]. Y is (h, w); U/V are (h/dy, w/dx) per the colorspace's
    subsampling. All frames must share one geometry (the format has a
    single stream header)."""
    import numpy as np

    if not frames:
        raise ValueError("y4m needs at least one frame")
    y0 = np.asarray(frames[0][0])
    h, w = y0.shape
    dx, dy = _y4m_subsample(colorspace)
    if w % dx or h % dy:
        raise ValueError(f"{colorspace} needs dims divisible by {dx}x{dy}")
    head = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    ).encode()
    out = bytearray(head)
    for y, u, v in frames:
        y = np.asarray(y, dtype=np.uint8)
        u = np.asarray(u, dtype=np.uint8)
        v = np.asarray(v, dtype=np.uint8)
        if y.shape != (h, w) or u.shape != (h // dy, w // dx) or u.shape != v.shape:
            raise ValueError("frame plane geometry mismatch")
        out += b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
    return bytes(out)


def parse_y4m(payload: bytes):
    """Parse a YUV4MPEG2 stream → (params, [(Y, U, V) uint8 planes]).

    params carries width, height, fps_num, fps_den, interlace,
    colorspace. Tag grammar per the mjpegtools spec: space-separated,
    first letter selects the parameter, unknown X-tags are skipped,
    missing C defaults to C420. Truncated frames and bad magic raise
    ValueError (A12 quarantine stance: loud, caller routes)."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_Y4M_MAGIC + b" ") and payload[:nl] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    fields = payload[:nl].split(b" ")
    if fields[0] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps_num, fps_den = None, None
    interlace = "p"
    ctag = "C420jpeg"
    for tag in fields[1:]:
        if not tag:
            continue
        key, val = chr(tag[0]), tag[1:].decode("ascii", "strict")
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            a, b = val.split(":")
            fps_num, fps_den = int(a), int(b)
        elif key == "I":
            interlace = val
        elif key == "C":
            ctag = "C" + val
        elif key in ("A", "X"):
            pass  # aspect ratio / extensions: carried, not interpreted
        else:
            raise ValueError(f"unknown Y4M tag {key!r}")
    if not w or not h or not fps_num or not fps_den:
        raise ValueError("Y4M header missing W/H/F")
    dx, dy = _y4m_subsample(ctag)
    if w % dx or h % dy:
        raise ValueError(f"{ctag} needs dims divisible by {dx}x{dy}")
    ysz, csz = w * h, (w // dx) * (h // dy)
    fsz = ysz + 2 * csz
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        if pos + fsz > len(payload):
            raise ValueError("truncated Y4M frame")
        buf = np.frombuffer(payload[pos : pos + fsz], dtype=np.uint8)
        frames.append(
            (
                buf[:ysz].reshape(h, w).copy(),
                buf[ysz : ysz + csz].reshape(h // dy, w // dx).copy(),
                buf[ysz + csz :].reshape(h // dy, w // dx).copy(),
            )
        )
        pos += fsz
    return (
        {
            "width": w,
            "height": h,
            "fps_num": fps_num,
            "fps_den": fps_den,
            "interlace": interlace,
            "colorspace": ctag,
        },
        frames,
    )


def yuv_to_rgb_bt601(y, u, v):
    """ITU-R BT.601 limited-range YUV → RGB in the classic integer
    fixed-point form (exact, branch-free, SQL-replayable):

        C = Y-16, D = U-128, E = V-128
        R = clip((298*C         + 409*E + 128) // 256)
        G = clip((298*C - 100*D - 208*E + 128) // 256)
        B = clip((298*C + 516*D         + 128) // 256)

    Chroma planes smaller than Y are upsampled by sample-and-hold
    (nearest), the subsampling inverse. Returns (h, w, 3) uint8."""
    import numpy as np

    y = np.asarray(y, dtype=np.int64)
    u = np.asarray(u, dtype=np.int64)
    v = np.asarray(v, dtype=np.int64)
    h, w = y.shape
    if u.shape != (h, w):
        u = np.repeat(np.repeat(u, h // u.shape[0], axis=0),
                      w // u.shape[1], axis=1)
        v = np.repeat(np.repeat(v, h // v.shape[0], axis=0),
                      w // v.shape[1], axis=1)
    c, d, e = y - 16, u - 128, v - 128
    clip = lambda t: np.clip(t // 256, 0, 255)  # noqa: E731
    r = clip(298 * c + 409 * e + 128)
    g = clip(298 * c - 100 * d - 208 * e + 128)
    b = clip(298 * c + 516 * d + 128)
    return np.stack([r, g, b], axis=2).astype(np.uint8)
