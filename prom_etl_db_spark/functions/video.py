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
