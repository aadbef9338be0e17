"""FLAC (Free Lossless Audio Codec) decode from raw bytes, stdlib +
numpy only — r5.

Why FLAC is buildable offline when MP3 is not: every part of the FLAC
format is FORMULA-defined — fixed polynomial predictors (orders 0-4
with small integer coefficients derivable from repeated differencing),
LPC with coefficients READ FROM THE STREAM, Rice/Golomb residual coding
(unary quotient + k-bit remainder, zigzag signed fold), UTF-8-style
coded frame numbers, and CRC-8/CRC-16 with stated polynomials (0x07 /
0x8005). There is no Huffman table, no allocation table, no prototype
filter — nothing that exists only as printed numbers. So this decoder
implements the full static subset from the spec (RFC 9639 / the
xiph.org format document): STREAMINFO parsing, frame sync + header
(block size / sample rate / channel assignment / sample size codes,
CRC-8 verified), subframes CONSTANT / VERBATIM / FIXED(0-4) / LPC,
wasted-bits unpacking, 4- and 5-bit Rice partitions with raw-bitwidth
escapes, stereo decorrelation (left-side / right-side / mid-side), and
the frame-footer CRC-16.

The fixture encoder writes real FIXED-order-2 + Rice frames (and
constant/verbatim frames in tests) so decode(encode(x)) is bit-exact —
losslessness makes the whole entropy path hash-checkable by a
closed-form SQL oracle, the same trick as G.711 and MPEG-1 Layer I.

Reference parity: the reference repo has no media path; this belongs to
the driver's E4 multimodal extension surface beside `jpeg.py` and
`mpeg_audio.py`.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_flac", "encode_flac", "flac_samples"]

_BLOCKSIZE_CODES = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                    **{n: 256 << (n - 8) for n in range(8, 16)}}
_SAMPLERATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                     6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                     11: 96000}
_SAMPLESIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor coefficients (repeated differencing; spec §subframes)
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, bitpos: int = 0):
        self.b = b
        self.pos = bitpos

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            i = self.pos >> 3
            if i >= len(self.b):
                raise ValueError("FLAC bitstream truncated")
            v = (v << 1) | ((self.b[i] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("FLAC unary run absurdly long (corrupt)")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_utf8_number(r: _Bits) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError("FLAC coded number malformed")
    v = first & (0x3F >> n)
    for _ in range(n):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC coded number continuation malformed")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(r: _Bits, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = r.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize >> part_order
        if p == 0:
            n -= order
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = r.read(plen)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return out


def _decode_subframe(r: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits flag: unary k-1 follows
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array(
            [r.read_signed(eff) for _ in range(blocksize)], dtype=np.int64
        )
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = pred + res[i - order]
    elif t >= 32:  # LPC, order (t & 31) + 1
        order = (t & 31) + 1
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC LPC precision code 1111 is invalid")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs))
            out[i] = (acc >> shift) + res[i - order]
    else:
        raise ValueError(f"FLAC reserved subframe type {t}")
    return out << wasted


def decode_flac(payload: bytes):
    """Decode a FLAC stream to (samples, meta): samples is an int64
    array (n, channels), meta carries sample_rate / bps / channels.
    Verifies both frame CRCs; refuses reserved codes loudly (A12)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = int.from_bytes(payload[pos : pos + 4], "big")
        last, btype, blen = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("FLAC metadata block truncated")
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError("FLAC STREAMINFO must be 34 bytes")
            r = _Bits(body)
            r.read(16), r.read(16), r.read(24), r.read(24)
            rate = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            info = (rate, channels, bps, total)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total = info

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        frame_start = pos
        r = _Bits(payload, pos * 8)
        if r.read(14) != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        if r.read(1):
            raise ValueError("FLAC reserved frame-header bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC reserved frame-header bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("FLAC reserved block size code 0")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            pass  # from STREAMINFO
        elif sr_code in _SAMPLERATE_CODES:
            if _SAMPLERATE_CODES[sr_code] != rate:
                raise ValueError("FLAC frame sample rate contradicts STREAMINFO")
        elif sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        else:
            raise ValueError("FLAC invalid sample rate code 15")
        if ss_code == 0:
            fbps = bps
        elif ss_code in _SAMPLESIZE_CODES:
            fbps = _SAMPLESIZE_CODES[ss_code]
        else:
            raise ValueError("FLAC reserved sample size code")
        hdr_end = (r.pos + 7) >> 3
        if _crc8(payload[frame_start:hdr_end]) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("FLAC frame channel count contradicts STREAMINFO")
            subs = [
                _decode_subframe(r, blocksize, fbps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("FLAC stereo decorrelation in non-stereo stream")
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _decode_subframe(r, blocksize, fbps)
                side = _decode_subframe(r, blocksize, fbps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(r, blocksize, fbps + 1)
                right = _decode_subframe(r, blocksize, fbps)
                subs = [right + side, right]
            else:  # mid/side
                mid = _decode_subframe(r, blocksize, fbps)
                side = _decode_subframe(r, blocksize, fbps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"FLAC reserved channel assignment {ch_code}")
        r.align()
        crc_end = r.pos >> 3
        if _crc16(payload[frame_start:crc_end]) != r.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].append(subs[c])
        got += blocksize
        pos = r.pos >> 3
    data = np.stack(
        [np.concatenate(c) if c else np.zeros(0, np.int64) for c in chans],
        axis=-1,
    )
    if total and len(data) > total:
        data = data[:total]
    return data, {"sample_rate": rate, "channels": channels, "bps": bps}


# -- fixture encoder ---------------------------------------------------------


class _BitW:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[int] = []

    def w(self, v: int, n: int) -> None:
        self.bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

    def w_signed(self, v: int, n: int) -> None:
        self.w(v & ((1 << n) - 1), n)

    def align(self) -> None:
        self.bits.extend([0] * (-len(self.bits) % 8))

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def _write_utf8_number(w: _BitW, v: int) -> None:
    if v < 0x80:
        w.w(v, 8)
        return
    tails = []
    while v >= (0x40 >> len(tails)) and len(tails) < 6:
        tails.append(v & 0x3F)
        v >>= 6
    lead = (0xFF << (7 - len(tails))) & 0xFF | v
    w.w(lead, 8)
    for t in reversed(tails):
        w.w(0x80 | t, 8)


def _write_rice(w: _BitW, residuals: list[int], param: int) -> None:
    for v in residuals:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag fold
        q, rem = u >> param, u & ((1 << param) - 1)
        w.bits.extend([0] * q + [1])
        if param:
            w.w(rem, param)


def encode_flac(
    samples,
    *,
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 256,
    order: int = 2,
    rice_param: int | None = None,
) -> bytes:
    """A real, valid mono FLAC stream: STREAMINFO + FIXED-order-`order`
    subframes with single-partition Rice residuals (order 0 = constant
    predictor baseline; the deterministic fixture generator for the
    lossless-roundtrip oracle, the synth_wav_g711 pattern). Block sizes
    use the explicit 16-bit form; the Rice parameter defaults to a
    per-block fit (mean residual magnitude)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim != 1:
        raise ValueError("fixture encoder writes mono only")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if s.min(initial=0) < lo or s.max(initial=0) > hi:
        raise ValueError(f"samples exceed {bps}-bit range")
    out = bytearray(b"fLaC")
    info = _BitW()
    info.w(block_size, 16)
    info.w(block_size, 16)
    info.w(0, 24)
    info.w(0, 24)
    info.w(sample_rate, 20)
    info.w(0, 3)  # channels - 1
    info.w(bps - 1, 5)
    info.w(len(s), 36)
    body = info.tobytes() + b"\x00" * 16  # zero MD5 (unverified field)
    out += (0x80000000 | (0 << 24) | len(body)).to_bytes(4, "big") + body

    coefs = _FIXED_COEFS[order]
    for fi, start in enumerate(range(0, len(s), block_size)):
        blk = s[start : start + block_size]
        n = len(blk)
        w = _BitW()
        w.w(0x3FFE, 14)
        w.w(0, 1)
        w.w(0, 1)  # fixed-blocksize strategy
        w.w(7, 4)  # block size: 16-bit value follows
        w.w(0, 4)  # sample rate: from STREAMINFO
        w.w(0, 4)  # 1 channel, independent
        w.w(4, 3)  # 16-bit samples
        w.w(0, 1)
        _write_utf8_number(w, fi)
        w.w(n - 1, 16)
        w.align()
        hdr = w.tobytes()
        w.w(_crc8(hdr), 8)
        # subframe: FIXED order (fewer samples than order -> verbatim)
        if n <= order:
            w.w(0, 1)
            w.w(1, 6)  # VERBATIM
            w.w(0, 1)
            for v in blk:
                w.w_signed(int(v), bps)
        else:
            w.w(0, 1)
            w.w(8 + order, 6)
            w.w(0, 1)
            for v in blk[:order]:
                w.w_signed(int(v), bps)
            res = []
            for i in range(order, n):
                pred = sum(
                    c * int(blk[i - 1 - j]) for j, c in enumerate(coefs)
                )
                res.append(int(blk[i]) - pred)
            if rice_param is None:
                mean = int(np.mean(np.abs(res))) if res else 0
                param = max(0, min(14, mean.bit_length()))
            else:
                param = rice_param
            w.w(0, 2)  # 4-bit Rice
            w.w(0, 4)  # partition order 0
            w.w(param, 4)
            _write_rice(w, res, param)
        w.align()
        frame = w.tobytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


def flac_samples(payload: bytes) -> np.ndarray:
    """Decoded samples only (n, channels) — the WAV-style entry."""
    return decode_flac(payload)[0]
