"""Baseline-sequential JPEG codec — pure stdlib + numpy, from ITU-T T.81.

Closes the repo's last lossy-media ``NotImplementedError`` (VERDICT r3
task #3): like the PNG (zlib + filters) and GIF (from-scratch LZW)
codecs beside it, everything here works on raw bytes — no Pillow.

Scope (the formats a training-data thumbnail pipeline actually ships):

- decode: baseline DCT (SOF0) and extended-sequential (SOF1) Huffman
  JPEGs, grayscale or 3-component YCbCr with ANY sampling factors
  (4:4:4, 4:2:2, 4:2:0, ...), restart intervals, multi-table DQT/DHT,
  APPn/COM skip. Huffman tables come from the file's own DHT segments,
  so interop never depends on our Annex-K constants. Progressive
  (SOF2), arithmetic coding and 12-bit precision raise ValueError —
  refusal beats silent garbling (DIVERGENCES.md).
- encode: baseline SOF0, grayscale / 4:4:4 / 4:2:0, standard or flat
  quantization tables, optional restart intervals. The ``flat`` (all
  ones) table plus blockwise-constant input makes decode(encode(px))
  BIT-EXACT — only the DC coefficient is non-zero and 8·(v−128)
  quantizes losslessly — which is what lets the driver gate hash-check
  a lossy codec (`multimodal_jpeg_pixels`).

The DCT is the orthonormal 8×8 basis as a matrix product
(F = M·B·Mᵀ, B = Mᵀ·F·M); float error ~1e-13 is far below the 0.5
rounding margin, so exact-integer coefficient sets round-trip exactly.

Reference parity note: the reference system (samzong/prom-etl-db) has
no media path at all — this is part of the E4 extension surface
(SURVEY.md §2.E).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "encode_jpeg",
    "jpeg_pixels",
    "decode_jpeg",
]

# -- constant tables --------------------------------------------------------


def _zigzag() -> list[tuple[int, int]]:
    """The T.81 Figure 5 zigzag scan, generated (not typed) to rule out
    transcription slips: diagonals of constant x+y, alternating
    direction, (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),..."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        coords = [(y, s - y) for y in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            coords.reverse()
        order.extend(coords)
    return order


_ZIGZAG = _zigzag()
_ZIGZAG_FLAT = np.array([y * 8 + x for (y, x) in _ZIGZAG])
_UNZIGZAG = np.argsort(_ZIGZAG_FLAT)

# Annex K.1/K.2 example quantization tables (row-major).
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3-K.6 example Huffman tables: (BITS[1..16], HUFFVAL). Only
# the ENCODER relies on these being the published values; the decoder
# always rebuilds tables from the file's DHT, so a transcription error
# here could not corrupt interop — it would only change our output's
# (still valid, self-described) code assignment.
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

for _bits, _vals in (_DC_LUM, _DC_CHROMA, _AC_LUM, _AC_CHROMA):
    assert sum(_bits) == len(_vals), "Huffman BITS/HUFFVAL mismatch"

# Orthonormal DCT-II basis: M[u,x] = c(u)/2 * cos((2x+1)uπ/16).
_DCT_M = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 Annex C): symbol ->
    (code, length)."""
    if sum(bits) != len(vals):
        # a lying DHT (counts promise more HUFFVAL bytes than the
        # segment carries) must quarantine as ValueError, not IndexError
        raise ValueError("JPEG DHT truncated: BITS counts exceed HUFFVAL")
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("invalid Huffman BITS (over-full code tree)")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


# -- bit I/O with 0xFF stuffing ---------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # T.81 B.1.1.5 byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (B.2.1)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                # a real marker inside entropy data — the scan is over
                # (or corrupt); rewind so the caller sees the marker
                self.pos -= 1
                raise ValueError("unexpected marker inside entropy data")
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, which: int) -> None:
        """Byte-align, then consume the FFDn restart marker (B.2.3.7)."""
        self.acc, self.n = 0, 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + which
        ):
            raise ValueError("missing/garbled JPEG restart marker")
        self.pos += 2

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: category bits -> signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _category(v: int) -> int:
    return abs(v).bit_length()


# -- encoder ----------------------------------------------------------------


def _marker(tag: int, body: bytes) -> bytes:
    return bytes((0xFF, tag)) + (len(body) + 2).to_bytes(2, "big") + body


def _pad_to_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_block(
    wtr: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    # Baseline range safety (T.81: AC fits 10 bits, DC diff 11): for
    # 8-bit input the orthonormal DCT gives |AC| <= max over the
    # [-128,127] box = 1020 < 1023 (sign-aligned vertex, measured in
    # tests) and |DC| <= 1024 so diffs fit 11 bits — with any qtable
    # >= 1 no quantized symbol can leave the Annex-K code space.
    coef = _DCT_M @ (block - 128.0) @ _DCT_M.T
    q = np.round(coef.reshape(64) / qtab).astype(np.int64)
    zz = q[_ZIGZAG_FLAT]
    # DC
    diff = int(zz[0]) - pred
    cat = _category(diff)
    code, length = dc_codes[cat]
    wtr.write(code, length)
    if cat:
        wtr.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            zc, zl = ac_codes[0xF0]  # ZRL
            wtr.write(zc, zl)
            run -= 16
        cat = _category(v)
        code, length = ac_codes[(run << 4) | cat]
        wtr.write(code, length)
        wtr.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        wtr.write(code, length)
    return int(zz[0])


def encode_jpeg(
    px,
    *,
    color: str = "rgb",
    subsampling: str = "444",
    qtables: str = "standard",
    restart_interval: int = 0,
) -> bytes:
    """A real, valid baseline-sequential JPEG writer.

    ``px``: (h, w) grayscale or (h, w, 3) uint8. ``color='ycbcr'``
    treats the 3 channels as Y/Cb/Cr directly (no color transform) —
    the fixture path, where closed-form component values must survive
    to the bitstream untouched. ``qtables='flat'`` writes all-ones
    quantization (legal JPEG; lossless for blockwise-constant input).
    ``restart_interval`` > 0 emits DRI and RSTn markers every that many
    MCUs (exercises the decoder's restart path)."""
    px = np.asarray(px)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError("JPEG dimensions out of range")
    if qtables == "flat":
        qt_l = qt_c = np.ones(64, dtype=np.int32)
    elif qtables == "standard":
        qt_l, qt_c = _Q_LUM, _Q_CHROMA
    else:
        raise ValueError(f"unknown qtables {qtables!r}")

    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
    else:
        f = px.astype(np.float64)
        if color == "rgb":
            r, g, b = f[..., 0], f[..., 1], f[..., 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
            planes = [np.floor(y + 0.5), np.floor(cb + 0.5), np.floor(cr + 0.5)]
            planes = [np.clip(p, 0, 255) for p in planes]
        elif color == "ycbcr":
            planes = [f[..., 0], f[..., 1], f[..., 2]]
        else:
            raise ValueError(f"unknown color {color!r}")
        if subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            # chroma: pad to even, then 2x2 box mean
            sub = []
            for p in planes[1:]:
                q = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                sub.append(
                    (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2])
                    / 4.0
                )
            planes = [planes[0]] + sub
        else:
            raise ValueError(f"unknown subsampling {subsampling!r}")

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad every plane to its full MCU-grid extent
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        want_h, want_w = mcus_y * 8 * sv, mcus_x * 8 * sh
        ph, pw = p.shape
        padded.append(
            np.pad(p, ((0, want_h - ph), (0, want_w - pw)), mode="edge")
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xDB, bytes([0x00]) + bytes(qt_l[_ZIGZAG_FLAT].tolist()))
    if not gray:
        out += _marker(0xDB, bytes([0x01]) + bytes(qt_c[_ZIGZAG_FLAT].tolist()))
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    for ci in range(ncomp):
        sof += bytes(
            (ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1)
        )
    out += _marker(0xC0, bytes(sof))
    tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if not gray:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, vals) in tables:
        out += _marker(0xC4, bytes([tc_th] + bits + vals))
    if restart_interval:
        out += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes((ci + 1, 0x00 if ci == 0 else 0x11))
    sos += bytes((0, 63, 0))
    out += _marker(0xDA, bytes(sos))

    dc_l, ac_l = _build_codes(*_DC_LUM), _build_codes(*_AC_LUM)
    dc_c, ac_c = _build_codes(*_DC_CHROMA), _build_codes(*_AC_CHROMA)
    comp_tabs = [(qt_l, dc_l, ac_l)] + [(qt_c, dc_c, ac_c)] * (ncomp - 1)
    preds = [0] * ncomp
    wtr = _BitWriter()
    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                qtab, dct, act = comp_tabs[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            wtr, block, qtab, dct, act, preds[ci]
                        )
            mcu_count += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ----------------------------------------------------------------


def jpeg_pixels(payload: bytes):
    """REAL JPEG pixel decode, stdlib + numpy only: marker walk, DQT/DHT
    table collection, interleaved-MCU Huffman decode with restart
    support, dequantize → un-zigzag → IDCT → level shift, chroma
    upsample, YCbCr→RGB (JFIF floats, floor(x+0.5) rounding). Returns a
    top-down (h, w, 3) or (h, w) uint8 array."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None  # (h, w, comps) where comps = [(cid, sh, sv, tq)]
    restart_interval = 0
    i = 2
    scan = None
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = payload[i + 1]
        if m == 0xFF:
            i += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        body = payload[i + 4 : i + 2 + seg_len]
        if seg_len < 2 or len(body) != seg_len - 2:
            raise ValueError("JPEG segment truncated or length field lies")
        if m == 0xDB:  # DQT — possibly several tables in one segment
            k = 0
            while k < len(body):
                pq, tq = body[k] >> 4, body[k] & 0x0F
                k += 1
                if pq == 0:
                    tab = np.frombuffer(body[k : k + 64], dtype=np.uint8)
                    k += 64
                else:
                    tab = np.frombuffer(
                        body[k : k + 128], dtype=">u2"
                    ).astype(np.int64)
                    k += 128
                full = np.zeros(64, dtype=np.int64)
                full[_ZIGZAG_FLAT] = tab.astype(np.int64)
                qtabs[tq] = full
        elif m == 0xC4:  # DHT — possibly several tables
            k = 0
            while k < len(body):
                if k + 17 > len(body):
                    raise ValueError("JPEG DHT segment truncated mid-table")
                tc, th = body[k] >> 4, body[k] & 0x0F
                bits = list(body[k + 1 : k + 17])
                nv = sum(bits)
                vals = list(body[k + 17 : k + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                k += 17 + nv
        elif m in (0xC0, 0xC1):  # baseline / extended sequential Huffman
            if len(body) < 6:
                raise ValueError("JPEG SOF header truncated")
            precision = body[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            nc = body[5]
            # T.81 B.2.2: X must be > 0; Y=0 means "deferred to a DNL
            # marker", which baseline decoders need not support — and a
            # zero dimension would silently yield empty planes and NaN
            # channel means downstream, so refuse both loudly (A12).
            if fh == 0 or fw == 0:
                raise ValueError("JPEG SOF declares a zero dimension")
            if not 1 <= nc <= 4 or len(body) < 6 + 3 * nc:
                raise ValueError("JPEG SOF component list malformed")
            comps = []
            for c in range(nc):
                cid, sampb, tq = body[6 + 3 * c : 9 + 3 * c]
                sh, sv = sampb >> 4, sampb & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(
                        f"JPEG sampling factors {sh}x{sv} out of range 1..4"
                    )
                comps.append((cid, sh, sv, tq))
            frame = (fh, fw, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG coding process (progressive/arithmetic/"
                "lossless) — only baseline/extended-sequential Huffman"
            )
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif m == 0xDA:  # SOS
            if not body or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("JPEG SOS header truncated")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tabs >> 4, tabs & 0x0F))
            scan = (scan_comps, i + 2 + seg_len)
            break  # entropy-coded data follows
        # APPn, COM, others: skip
        i += 2 + seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    scan_comps, data_pos = scan
    if len(scan_comps) != len(comps):
        raise ValueError("JPEG non-interleaved multi-scan not supported")

    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    by_id = {cid: (sh, sv, tq) for cid, sh, sv, tq in comps}
    order = []  # (plane index, sh, sv, qtab, dc table, ac table)
    planes = []
    for idx, (cs, td, ta) in enumerate(scan_comps):
        if cs not in by_id:
            raise ValueError("JPEG scan references unknown component")
        sh, sv, tq = by_id[cs]
        if tq not in qtabs or (0, td) not in huff or (1, ta) not in huff:
            raise ValueError(
                "JPEG scan references a quantization/Huffman table the "
                "stream never defined"
            )
        planes.append(
            np.zeros((mcus_y * 8 * sv, mcus_x * 8 * sh), dtype=np.float64)
        )
        order.append((idx, sh, sv, qtabs[tq], huff[(0, td)], huff[(1, ta)]))

    rdr = _BitReader(payload, data_pos)
    preds = [0] * len(order)
    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rdr.align_and_expect_rst(rst)
                rst = (rst + 1) % 8
                preds = [0] * len(order)
            for idx, sh, sv, qtab, dct, act in order:
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = rdr.decode_symbol(dct)
                        if cat > 11:
                            # T.81 F.1.2.1.2: baseline DC difference
                            # categories are 0..11 — a corrupt DHT can
                            # emit any byte as the symbol
                            raise ValueError(
                                f"JPEG DC category {cat} exceeds baseline 11"
                            )
                        diff = _extend(rdr.receive(cat), cat)
                        preds[idx] += diff
                        zz[0] = preds[idx]
                        k = 1
                        while k < 64:
                            sym = rdr.decode_symbol(act)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            size = sym & 0x0F
                            zz[k] = _extend(rdr.receive(size), size)
                            k += 1
                        # De-zigzag FIRST, then dequantize: zz holds
                        # coefficients in zigzag order while qtab is kept
                        # in natural (raster) order, so each coefficient
                        # must be moved to its natural slot before being
                        # scaled by the quantizer at that slot (T.81
                        # F.2.1.4).  Multiplying in zigzag order is only
                        # equivalent for flat (constant) tables.
                        coef = (zz[_UNZIGZAG] * qtab).reshape(8, 8)
                        block = _DCT_M.T @ coef @ _DCT_M + 128.0
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        planes[idx][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample to full resolution (pixel replication), crop, color-convert
    full = []
    for (idx, sh, sv, _, _, _), p in zip(order, planes):
        up = np.repeat(np.repeat(p, vmax // sv, axis=0), hmax // sh, axis=1)
        full.append(up[:fh, :fw])
    if len(full) == 1:
        gray = np.clip(np.floor(full[0] + 0.5), 0, 255)
        return gray.astype(np.uint8)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> dict:
    """REAL pixel decode of baseline JPEGs (see ``jpeg_pixels``): true
    per-channel means over every reconstructed pixel — the full
    Huffman + dequantize + IDCT + color-convert path, not a header
    peek. Mirrors ``decode_png``'s feature dict."""
    px = jpeg_pixels(payload)
    if px.ndim == 2:
        h, w = px.shape
        m = float(px.astype(np.float64).mean())
        mr = mg = mb = m
    else:
        h, w = px.shape[:2]
        flat = px.reshape(-1, 3).astype(np.float64)
        mr, mg, mb = (
            float(flat[:, 0].mean()),
            float(flat[:, 1].mean()),
            float(flat[:, 2].mean()),
        )
    return {
        "format": "jpeg",
        "width": w,
        "height": h,
        "mean_r": mr,
        "mean_g": mg,
        "mean_b": mb,
    }
