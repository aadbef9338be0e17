"""Gorilla time-series compression (Pelkonen et al., VLDB 2015) — the
delta-of-delta + XOR bitstream encoding Prometheus's TSDB descends from.

Reference scope: samzong/prom-etl-db stores raw samples in MySQL and
delegates storage efficiency to Prometheus itself; this implements the
compression layer as a first-class, verifiable operator (SURVEY.md §2
B-extended / storage posture).

Variant, documented precisely because the oracle replays it bit-for-bit:

- Timestamps are SECONDS (floored, rebased to the fixture epoch) — the
  paper's dod buckets assume secondly scrape cadence. Header stores
  t[0] and v[0] raw (64 bits each). For i ≥ 1 the delta-of-delta
  (d[i]−d[i−1], with d[0] ≡ t[1]−t[0] against an implied prior delta
  of 0) is bucketed: ``0`` → 1 bit; [−63,64] → '10'+7; [−255,256] →
  '110'+9; [−2047,2048] → '1110'+12; else '1111'+32 (the paper's 4-bit escape) (|dod| < 2³¹
  asserted).
- Values are integers (floor(v+0.5), the LTTB convention) XORed as
  64-bit words against the previous value: xor==0 → '0'; else if the
  xor fits the CURRENT window (lead ≥ stored lead AND trail ≥ stored
  trail) → '10' + the window's meaningful bits; else → '11' + 5-bit
  lead (capped at 31, Facebook's quirk) + 6-bit length (64 encoded as
  0) + meaningful bits, and the window is reset to (capped lead,
  trail).

The encoder writes a REAL bitstream; the decoder reads it back and the
operator asserts bit-exact roundtrip before emitting anything — a
Gorilla bug can't silently ship wrong stats. Scale posture: one
sequential chain per series inside applyInPandas (parallel across
series, the TSDB cardinality axis; Gorilla itself is per-series
sequential by construction).
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1


class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        if width == 0:
            return
        assert 0 <= value < (1 << width), (value, width)
        self.acc = (self.acc << width) | value
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(out)

    @property
    def bit_length(self) -> int:
        return len(self.buf) * 8 + self.nbits


class _BitR:
    def __init__(self, data: bytes, nbits: int):
        self.data = data
        self.total = nbits
        self.pos = 0

    def read(self, width: int) -> int:
        assert self.pos + width <= self.total, "bitstream underrun"
        v = 0
        for _ in range(width):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            v = (v << 1) | bit
            self.pos += 1
        return v


_DOD_BUCKETS = (
    (-63, 64, "10", 7),
    (-255, 256, "110", 9),
    (-2047, 2048, "1110", 12),
)


def _u(x: int) -> int:
    return x & MASK64


def encode_gorilla(ts: list[int], vs: list[int]) -> tuple[bytes, int, list[int], list[int]]:
    """Encode parallel (seconds, int-value) series. Returns (payload,
    total_bits, per_sample_ts_bits, per_sample_val_bits)."""
    n = len(ts)
    assert n == len(vs) and n >= 1
    w = _BitW()
    ts_bits, val_bits = [], []
    w.write(_u(ts[0]), 64)
    w.write(_u(vs[0]), 64)
    ts_bits.append(64)
    val_bits.append(64)
    prev_delta = 0
    s_lead, s_trail = 99, 99  # sentinel: no window yet
    for i in range(1, n):
        b0 = w.bit_length
        delta = ts[i] - ts[i - 1]
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
        else:
            for lo, hi, prefix, width in _DOD_BUCKETS:
                if lo <= dod <= hi:
                    w.write(int(prefix, 2), len(prefix))
                    w.write(dod - lo, width)
                    break
            else:
                assert -(1 << 31) <= dod < (1 << 31), "dod overflow"
                w.write(0b1111, 4)  # the paper's 4-bit escape class
                w.write(_u(dod) & 0xFFFFFFFF, 32)
        ts_bits.append(w.bit_length - b0)
        b0 = w.bit_length
        x = _u(vs[i]) ^ _u(vs[i - 1])
        if x == 0:
            w.write(0, 1)
        else:
            lz = 64 - x.bit_length()
            tz = ((x & -x).bit_length() - 1) if x else 64
            if lz >= s_lead and tz >= s_trail:
                mlen = 64 - s_lead - s_trail
                w.write(0b10, 2)
                w.write(x >> s_trail, mlen)
            else:
                lead = min(lz, 31)
                mlen = 64 - lead - tz
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(mlen % 64, 6)  # 64 encodes as 0
                w.write(x >> tz, mlen)
                s_lead, s_trail = lead, tz
        val_bits.append(w.bit_length - b0)
    return w.bytes(), w.bit_length, ts_bits, val_bits


def decode_gorilla(payload: bytes, nbits: int, n: int) -> tuple[list[int], list[int]]:
    """Decode ``n`` samples back out of the bitstream."""
    r = _BitR(payload, nbits)

    def _s64(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    ts = [_s64(r.read(64))]
    vs = [_s64(r.read(64))]
    prev_delta = 0
    s_lead, s_trail = 99, 99
    for _ in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            u = r.read(32)
            dod = u - (1 << 32) if u >= (1 << 31) else u
        prev_delta += dod
        ts.append(ts[-1] + prev_delta)
        if r.read(1) == 0:
            vs.append(vs[-1])
            continue
        if r.read(1) == 0:  # window branch
            mlen = 64 - s_lead - s_trail
            x = r.read(mlen) << s_trail
        else:
            s_lead = r.read(5)
            mlen = r.read(6) or 64
            s_trail = 64 - s_lead - mlen
            # a corrupted control word can claim lead+mlen > 64; refuse
            # loudly instead of a negative shift (found by the bit-flip
            # fuzz gate)
            assert s_trail >= 0, "invalid meaningful-bits window"
            x = r.read(mlen) << s_trail
        vs.append(_s64(_u(vs[-1]) ^ x))
    assert r.pos == r.total, "trailing bits"
    return ts, vs


GORILLA_BLOCK = 64


def gorilla_compress_features(
    events,
    series_col: str = "event_type",
    block: int = GORILLA_BLOCK,
):
    """Per (series, 64-sample block): sample count, exact ts/value bit
    costs out of the REAL encoded bitstream, xor-zero run count, and
    min/sum/max of the DECODED values — which equal the originals
    because the roundtrip is asserted bit-exact before anything is
    emitted (the FLAC losslessness-verification pattern). applyInPandas
    per series; parallel across series."""
    from datetime import datetime, timezone

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    # tz-pinned: a naive .timestamp() reads the HOST timezone and would
    # silently shift the rebase on a non-UTC machine (ts is NTZ, so the
    # pandas int64 epoch below is zone-free)
    base_us = int(
        datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000
    )
    schema = StructType(
        [
            StructField("series", StringType(), False),
            StructField("block", IntegerType(), False),
            StructField("n_samples", LongType(), False),
            StructField("ts_bits", LongType(), False),
            StructField("val_bits", LongType(), False),
            StructField("n_xor_zero", LongType(), False),
            StructField("v_sum", LongType(), False),
            StructField("v_min", LongType(), False),
            StructField("v_max", LongType(), False),
        ]
    )

    def one_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        t = (
            (pdf["ts"].astype("datetime64[us]").astype("int64") - base_us)
            // 1_000_000
        ).tolist()
        v = [
            int(x)
            for x in np.floor(pdf["value"].to_numpy(dtype=np.float64) + 0.5)
        ]
        payload, nbits, tsb, vb = encode_gorilla(t, v)
        dts, dvs = decode_gorilla(payload, nbits, len(t))
        assert dts == t and dvs == v, "gorilla roundtrip mismatch"
        s = str(pdf[series_col].iloc[0])
        rows = {}
        for i in range(len(t)):
            b = i // block
            r = rows.setdefault(
                b, [0, 0, 0, 0, 0, None, None]
            )  # n, tsb, vb, nxz, vsum, vmin, vmax
            r[0] += 1
            r[1] += tsb[i]
            r[2] += vb[i]
            if i > 0 and dvs[i] == dvs[i - 1]:
                r[3] += 1
            r[4] += dvs[i]
            r[5] = dvs[i] if r[5] is None else min(r[5], dvs[i])
            r[6] = dvs[i] if r[6] is None else max(r[6], dvs[i])
        return pd.DataFrame(
            {
                "series": s,
                "block": pd.array(sorted(rows), dtype="int32"),
                "n_samples": [rows[b][0] for b in sorted(rows)],
                "ts_bits": [rows[b][1] for b in sorted(rows)],
                "val_bits": [rows[b][2] for b in sorted(rows)],
                "n_xor_zero": [rows[b][3] for b in sorted(rows)],
                "v_sum": [rows[b][4] for b in sorted(rows)],
                "v_min": [rows[b][5] for b in sorted(rows)],
                "v_max": [rows[b][6] for b in sorted(rows)],
            }
        )

    cols = events.select(series_col, "ts", "event_id", "value")
    return cols.groupBy(series_col).applyInPandas(one_series, schema)


def gorilla_cost_step(state, t: int, v: int):
    """One incremental step of the Gorilla COST model — the pure
    transition function the streaming compressor folds over
    checkpointed state. ``state`` is ``(n, last_t, prev_delta, last_v,
    s_lead, s_trail)`` or None for a fresh series. Returns
    ``(state', ts_bits, val_bits, xor_zero)``.

    Per-sample equality with ``encode_gorilla``'s actual bitstream
    accounting is asserted under fuzz in tests — the streaming twin's
    correctness hangs on this function never drifting from the encoder."""
    if state is None or state[0] == 0:
        return (1, t, 0, v, 99, 99), 64, 64, 0
    n, lt, pdelta, lv, s_lead, s_trail = state
    delta = t - lt
    dod = delta - pdelta
    if dod == 0:
        tb = 1
    elif -63 <= dod <= 64:
        tb = 9
    elif -255 <= dod <= 256:
        tb = 12
    elif -2047 <= dod <= 2048:
        tb = 16
    else:
        assert -(1 << 31) <= dod < (1 << 31), "dod overflow"
        tb = 36
    x = _u(v) ^ _u(lv)
    if x == 0:
        vb, xz = 1, 1
    else:
        xz = 0
        lz = 64 - x.bit_length()
        tz = (x & -x).bit_length() - 1
        if lz >= s_lead and tz >= s_trail:
            vb = 2 + (64 - s_lead - s_trail)
        else:
            lead = min(lz, 31)
            vb = 13 + (64 - lead - tz)
            s_lead, s_trail = lead, tz
    return (n + 1, t, delta, v, s_lead, s_trail), tb, vb, xz
