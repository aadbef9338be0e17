"""MPEG-1 audio (ISO/IEC 11172-3) — Layer I decode from raw bytes,
stdlib + numpy only.

Scope, and why (r5 — the VERDICT "decide the MP3 story" task):

* **Layer I is decoded for real at the bitstream level**: frame sync and
  header fields, frame-length arithmetic, optional CRC-16, per-subband
  bit allocation, scalefactor indices, and sample requantization are all
  CLOSED-FORM in the spec (formulas and small enumerable tables), so
  they are implemented here from the published definitions — the same
  from-the-spec discipline as the JPEG codec (`functions/jpeg.py`).
* **The polyphase synthesis window is a pluggable hook**: the final
  subband→PCM filterbank needs Table B.3 — 512 prototype-filter
  coefficients that exist only as printed numbers (the filter was
  produced by numerical optimization; there is no generating formula).
  This offline environment has no copy of the table, and fabricating
  512 nine-digit constants from memory would be silent wrongness. The
  matrixing/FIFO/windowing MACHINERY is implemented per §2.4.3.5 and
  unit-tested; `set_synthesis_window(d)` arms it the moment the 512
  published floats are supplied. Until then `subbands_to_pcm` refuses
  loudly, and every analysis feature works in the subband domain — a
  complete, lossless view of what the bitstream encodes upstream of the
  fixed output filter.
* **Layer II / Layer III (i.e. "MP3") stay environment-stubbed**:
  Layer II needs the B.2a–d allocation-class tables and Layer III the
  Huffman code tables — both numeric-only, same unavailability. The
  refusal in `multimodal.real_decode` names them explicitly.

Reference parity: the reference repo (samzong/prom-etl-db) has no media
path at all — this module belongs to the driver's E4 multimodal
extension surface, mirroring `functions/jpeg.py` (image) and
`functions/video.py` (video).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "MpegHeader",
    "parse_header",
    "decode_mpeg1_layer1",
    "encode_mpeg1_layer1_frame",
    "scalefactor",
    "requantize_layer1",
    "synthesis_matrixing",
    "subbands_to_pcm",
    "set_synthesis_window",
    "crc16_mpeg",
]

# Header tables (11172-3 §2.4.2.3) — small, fully enumerated in the spec.
_BITRATES_KBPS = {
    # layer: index 1..14 (0 = free format, unsupported here; 15 = invalid)
    1: (None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_SAMPLERATES = (44100, 48000, 32000)  # index 3 reserved

_MODE_STEREO, _MODE_JOINT, _MODE_DUAL, _MODE_MONO = 0, 1, 2, 3


class MpegHeader:
    """Parsed 32-bit MPEG-1 audio frame header (§2.4.1.3)."""

    __slots__ = (
        "layer",
        "protection",
        "bitrate_kbps",
        "samplerate",
        "padding",
        "mode",
        "mode_ext",
        "frame_bytes",
        "channels",
        "bound",
    )

    def __init__(self, layer, protection, bitrate_kbps, samplerate, padding,
                 mode, mode_ext):
        self.layer = layer
        self.protection = protection  # True = CRC-16 present after header
        self.bitrate_kbps = bitrate_kbps
        self.samplerate = samplerate
        self.padding = padding
        self.mode = mode
        self.mode_ext = mode_ext
        self.channels = 1 if mode == _MODE_MONO else 2
        # Layer I joint stereo: subbands >= bound share one sample code
        # per group, each channel applying its own scalefactor (§2.4.3.3)
        self.bound = (mode_ext + 1) * 4 if mode == _MODE_JOINT else 32
        if layer == 1:
            # §2.4.3.1: N = 12 * bitrate/samplerate slots of 4 bytes
            self.frame_bytes = (
                12 * bitrate_kbps * 1000 // samplerate + padding
            ) * 4
        else:
            self.frame_bytes = (
                144 * bitrate_kbps * 1000 // samplerate + padding
            )


def parse_header(b: bytes, pos: int = 0) -> MpegHeader:
    """Parse the 4-byte header at ``pos``; raise ValueError on anything
    that is not a supported MPEG-1 frame."""
    if len(b) < pos + 4:
        raise ValueError("MPEG frame header truncated")
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 20) & 0xFFF != 0xFFF:
        raise ValueError("MPEG sync word not found")
    if not (h >> 19) & 1:
        raise ValueError("MPEG-2/2.5 (ID=0) not supported")
    layer_bits = (h >> 17) & 0x3
    if layer_bits == 0:
        raise ValueError("reserved layer code")
    layer = 4 - layer_bits  # '11'->I, '10'->II, '01'->III
    protection = not ((h >> 16) & 1)  # bit 0 = CRC present
    br_idx = (h >> 12) & 0xF
    if br_idx == 0:
        raise ValueError("free-format bitrate not supported")
    if br_idx == 15:
        raise ValueError("invalid bitrate index 15")
    sr_idx = (h >> 10) & 0x3
    if sr_idx == 3:
        raise ValueError("reserved sampling-frequency index")
    padding = (h >> 9) & 1
    mode = (h >> 6) & 0x3
    mode_ext = (h >> 4) & 0x3
    return MpegHeader(
        layer,
        protection,
        _BITRATES_KBPS[layer][br_idx],
        _SAMPLERATES[sr_idx],
        padding,
        mode,
        mode_ext,
    )


def crc16_mpeg(data_bits: list[int]) -> int:
    """CRC-16 with generator x^16 + x^15 + x^2 + 1 (0x8005), initial
    state 0xFFFF, over a bit sequence — §2.4.3.1 'error check'. In
    Layer I the protected bits are the last 16 header bits plus the
    whole bit-allocation block."""
    crc = 0xFFFF
    for bit in data_bits:
        high = (crc >> 15) & 1
        crc = (crc << 1) & 0xFFFF
        if high ^ bit:
            crc ^= 0x8005
    return crc


def scalefactor(idx: int) -> float:
    """Table B.1 scalefactors: sf(idx) = 2 * 2^(-idx/3), idx 0..62
    (geometric, halving every 3 steps: idx 0 -> 2.0, 3 -> 1.0,
    6 -> 0.5). Index 63 is forbidden by the spec."""
    if not 0 <= idx <= 62:
        raise ValueError(f"scalefactor index {idx} out of range 0..62")
    return 2.0 * 2.0 ** (-idx / 3.0)


def requantize_layer1(code: int, nb: int) -> float:
    """Layer I sample requantization (§2.4.3.3, the formula libmad
    quotes verbatim): s'' = (2^nb / (2^nb - 1)) * (s''' + 2^(1-nb))
    with s''' = code * 2^(1-nb) - 1. The quantizer has 2^nb - 1 levels;
    the all-ones code never occurs (it would dequantize past +1), so
    valid codes are 0 .. 2^nb - 2 and s'' is symmetric around 0
    (nb=2: codes {0,1,2} -> {-2/3, 0, +2/3})."""
    lo = 2.0 ** (1 - nb)
    return (1.0 / (1.0 - 2.0 ** (-nb))) * ((code + 1) * lo - 1.0)


class _BitReader:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, bitpos: int = 0):
        self.b = b
        self.pos = bitpos

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.b[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        self.bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

    def tobytes(self, pad_to: int | None = None) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for bit in bits[i : i + 8]:
                v = (v << 1) | bit
            out.append(v)
        if pad_to is not None:
            if len(out) > pad_to:
                raise ValueError(
                    f"frame payload {len(out)} B exceeds frame size {pad_to} B"
                )
            out += b"\x00" * (pad_to - len(out))
        return bytes(out)


def decode_mpeg1_layer1(payload: bytes, *, verify_crc: bool = True):
    """Decode every Layer I frame in ``payload`` to DEQUANTIZED SUBBAND
    samples: a list of dicts, one per frame, each with ``header`` and
    ``subbands`` — float64 array (channels, 32 subbands, 12 samples),
    zeros where the bit allocation is silent — plus the integer side
    info (``allocation``, ``scalefactor_idx``). This is the complete
    spec-defined decode upstream of the synthesis filterbank (see module
    docstring for why PCM is a pluggable final step)."""
    frames = []
    pos = 0
    while pos < len(payload):
        if len(payload) - pos < 4:
            raise ValueError("trailing bytes too short for a frame header")
        hdr = parse_header(payload, pos)
        if hdr.layer != 1:
            raise NotImplementedError(
                "MPEG-1 Layer %d decode needs numeric spec tables "
                "(B.2 allocation classes / Layer III Huffman) not "
                "available in this environment" % hdr.layer
            )
        if pos + hdr.frame_bytes > len(payload):
            raise ValueError("frame truncated: header promises more bytes")
        rdr = _BitReader(payload, pos * 8 + 32)
        if hdr.protection:
            stored_crc = rdr.read(16)
        nch, bound = hdr.channels, min(hdr.bound, 32)
        alloc = np.zeros((nch, 32), dtype=np.int64)
        for sb in range(32):
            for ch in range(nch if sb < bound else 1):
                a = rdr.read(4)
                if a == 15:
                    raise ValueError("forbidden bit-allocation value 15")
                alloc[ch, sb] = a
            if sb >= bound and nch == 2:
                alloc[1, sb] = alloc[0, sb]
        if hdr.protection and verify_crc:
            # §2.4.3.1: CRC covers the last 16 header bits + allocation
            hdr_bits = _BitReader(payload, pos * 8 + 16)
            bits = [hdr_bits.read(1) for _ in range(16)]
            ab = _BitReader(payload, pos * 8 + 48)
            n_alloc_bits = sum(
                4 * (nch if sb < bound else 1) for sb in range(32)
            )
            bits += [ab.read(1) for _ in range(n_alloc_bits)]
            if crc16_mpeg(bits) != stored_crc:
                raise ValueError("Layer I CRC mismatch")
        sf_idx = np.zeros((nch, 32), dtype=np.int64)
        for sb in range(32):
            for ch in range(nch):
                if alloc[ch, sb]:
                    idx = rdr.read(6)
                    if idx == 63:
                        raise ValueError("forbidden scalefactor index 63")
                    sf_idx[ch, sb] = idx
        sub = np.zeros((nch, 32, 12), dtype=np.float64)
        raw_codes = np.zeros((nch, 32, 12), dtype=np.int64)
        for s in range(12):
            for sb in range(32):
                if sb < bound:
                    for ch in range(nch):
                        if alloc[ch, sb]:
                            nb = int(alloc[ch, sb]) + 1
                            code = rdr.read(nb)
                            raw_codes[ch, sb, s] = code
                            sub[ch, sb, s] = scalefactor(
                                int(sf_idx[ch, sb])
                            ) * requantize_layer1(code, nb)
                elif alloc[0, sb]:
                    # joint stereo: one code, per-channel scalefactors
                    nb = int(alloc[0, sb]) + 1
                    code = rdr.read(nb)
                    q = requantize_layer1(code, nb)
                    for ch in range(nch):
                        raw_codes[ch, sb, s] = code
                        sub[ch, sb, s] = scalefactor(int(sf_idx[ch, sb])) * q
        frames.append(
            {
                "header": hdr,
                "allocation": alloc,
                "scalefactor_idx": sf_idx,
                "codes": raw_codes,
                "subbands": sub,
            }
        )
        pos += hdr.frame_bytes
    return frames


def encode_mpeg1_layer1_frame(
    alloc,
    sf_idx,
    codes,
    *,
    bitrate_idx: int = 14,
    samplerate_idx: int = 2,
    mode: int = _MODE_MONO,
    protection: bool = False,
) -> bytes:
    """Assemble one valid mono/stereo Layer I frame from raw field
    values — the deterministic fixture generator (the synth_bmp /
    synth_wav_g711 pattern): callers hand the exact allocation (per
    channel x 32), scalefactor indices, and 12 sample CODES per active
    subband; this writes header, optional CRC, and the §2.4.3.3 field
    order, zero-stuffing up to the spec frame length."""
    alloc = np.asarray(alloc, dtype=np.int64)
    sf_idx = np.asarray(sf_idx, dtype=np.int64)
    if alloc.ndim == 1:
        alloc, sf_idx = alloc[None, :], sf_idx[None, :]
        codes = [codes]
    nch = alloc.shape[0]
    if (mode == _MODE_MONO) != (nch == 1):
        raise ValueError("mode/channel-count mismatch")
    w = _BitWriter()
    w.write(0xFFF, 12)
    w.write(1, 1)  # ID: MPEG-1
    w.write(0b11, 2)  # layer I
    w.write(0 if protection else 1, 1)
    w.write(bitrate_idx, 4)
    w.write(samplerate_idx, 2)
    w.write(0, 1)  # padding
    w.write(0, 1)  # private
    w.write(mode, 2)
    w.write(0, 2)  # mode_ext
    w.write(0, 1)  # copyright
    w.write(1, 1)  # original
    w.write(0, 2)  # emphasis
    header_tail = list(w.bits[16:32])
    alloc_bits = _BitWriter()
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch, sb] == 15:
                raise ValueError("allocation 15 is forbidden")
            alloc_bits.write(int(alloc[ch, sb]), 4)
    if protection:
        w.write(crc16_mpeg(header_tail + alloc_bits.bits), 16)
    w.bits.extend(alloc_bits.bits)
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch, sb]:
                if not 0 <= sf_idx[ch, sb] <= 62:
                    raise ValueError("scalefactor index out of range")
                w.write(int(sf_idx[ch, sb]), 6)
    for s in range(12):
        for sb in range(32):
            for ch in range(nch):
                if alloc[ch, sb]:
                    nb = int(alloc[ch, sb]) + 1
                    c = int(codes[ch][sb][s])
                    if not 0 <= c <= (1 << nb) - 2:
                        raise ValueError(
                            f"code {c} out of range for nb={nb} "
                            "(all-ones is forbidden)"
                        )
                    w.write(c, nb)
    hdr = MpegHeader(
        1, protection, _BITRATES_KBPS[1][bitrate_idx],
        _SAMPLERATES[samplerate_idx], 0, mode, 0,
    )
    return w.tobytes(pad_to=hdr.frame_bytes)


# -- synthesis filterbank machinery (§2.4.3.5) -------------------------------
# The matrixing and FIFO/window structure are formula-defined and
# implemented here; the 512 window coefficients themselves (Table B.3)
# must be supplied — see module docstring.

_SYNTHESIS_WINDOW: np.ndarray | None = None

_MATRIX_N = np.array(
    [
        [math.cos((16 + i) * (2 * k + 1) * math.pi / 64.0) for k in range(32)]
        for i in range(64)
    ]
)


def set_synthesis_window(d) -> None:
    """Arm subband->PCM synthesis with the 512 published Table-B.3
    coefficients. Pass None to disarm."""
    global _SYNTHESIS_WINDOW
    if d is None:
        _SYNTHESIS_WINDOW = None
        return
    d = np.asarray(d, dtype=np.float64)
    if d.shape != (512,):
        raise ValueError("synthesis window must have exactly 512 taps")
    _SYNTHESIS_WINDOW = d


def synthesis_matrixing(s32) -> np.ndarray:
    """One matrixing step: V[i] = sum_k N[i][k] * S[k] with
    N[i][k] = cos((16+i)(2k+1)pi/64), i 0..63 — §2.4.3.5 step 2."""
    s32 = np.asarray(s32, dtype=np.float64)
    if s32.shape != (32,):
        raise ValueError("matrixing takes exactly 32 subband samples")
    return _MATRIX_N @ s32


def subbands_to_pcm(subbands) -> np.ndarray:
    """Full §2.4.3.5 synthesis: per 32-sample slice, matrix to V, shift
    the 1024-sample FIFO, build the U vector, window with D, and sum 16
    taps per output sample. Requires the published window — see
    set_synthesis_window."""
    if _SYNTHESIS_WINDOW is None:
        raise NotImplementedError(
            "subband->PCM synthesis needs the 512 Table-B.3 window "
            "coefficients of ISO/IEC 11172-3 — a purely numeric table "
            "(no generating formula) with no copy in this offline "
            "environment. Call set_synthesis_window(d) with the "
            "published floats to arm this path; all bitstream-level "
            "decode above is complete without it."
        )
    subbands = np.asarray(subbands, dtype=np.float64)
    nsb, nsamp = subbands.shape
    if nsb != 32:
        raise ValueError("expected (32, n) subband array")
    v = np.zeros(1024)
    out = np.empty(32 * nsamp)
    d = _SYNTHESIS_WINDOW
    for t in range(nsamp):
        v[64:] = v[:-64]
        v[:64] = synthesis_matrixing(subbands[:, t])
        u = np.empty(512)
        for i in range(8):
            u[i * 64 : i * 64 + 32] = v[i * 128 : i * 128 + 32]
            u[i * 64 + 32 : i * 64 + 64] = v[i * 128 + 96 : i * 128 + 128]
        w = u * d
        out[t * 32 : (t + 1) * 32] = w.reshape(16, 32).sum(axis=0)
    return out
