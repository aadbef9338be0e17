"""Netpbm image codecs (PBM/PGM/PPM, plain AND raw variants).

Reference scope: samzong/prom-etl-db has no media surface; §2.E
multimodal extension (round 6). The Netpbm formats (netpbm.sourceforge
.net/doc/: P1/P4 bitmaps, P2/P5 graymaps, P3/P6 pixmaps) are the
simplest real interchange family and the one scientific pipelines still
emit — and their HEADER grammar has genuine traps this codec implements
faithfully from the spec:

- tokens are separated by arbitrary whitespace, and ``#`` comments may
  appear BETWEEN ANY TOKENS of the header (mid-header comments are the
  classic parser killer);
- after the maxval (or height for P1/P4) comes EXACTLY ONE whitespace
  byte, then the raster — a raw raster may legally begin with a byte
  that looks like whitespace, so "skip all whitespace" corrupts data;
- plain variants are ASCII decimal samples, raw are big-endian bytes
  (two bytes per sample when maxval > 255 — P5/P6 16-bit);
- P4 packs 8 pixels per byte, MSB first, rows padded to byte borders;
- samples scale against maxval; values above maxval are refused.

Decode is strict (ValueError with offsets, the codec fuzz convention);
pixel means are exact rationals reported as integer numerators over
the pixel count so the DuckDB oracle compares exact integers.

Spark shape: one mapInPandas per corpus (Arrow-batched, zero shuffle,
embarrassingly parallel per image — the MPEG-row posture in SCALE.md).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _next_token(data: bytes, pos: int) -> tuple[bytes, int]:
    """Next header token: skip whitespace and #-comments (legal between
    any two tokens), then read up to the next whitespace."""
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in b" \t\r\n\x0b\x0c":
            pos += 1
        elif c == 0x23:  # '#': comment to end of line
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    if pos >= n:
        raise ValueError(f"netpbm: header truncated at offset {pos}")
    start = pos
    while pos < n and data[pos] not in b" \t\r\n\x0b\x0c":
        pos += 1
    return data[start:pos], pos


def _int_token(data: bytes, pos: int, what: str) -> tuple[int, int]:
    tok, pos = _next_token(data, pos)
    if not tok.isdigit():
        raise ValueError(f"netpbm: bad {what} token {tok[:12]!r}")
    return int(tok), pos


def decode_netpbm(data: bytes) -> dict:
    """→ {magic, width, height, maxval, channels, sum_r, sum_g, sum_b}
    (sums over ALL pixels per channel; gray/bitmap report the same sum
    on r=g=b). P1/P4 report maxval 1 with 1 = white (PBM's 1 = BLACK is
    inverted to the luminance convention, documented)."""
    if len(data) < 2 or data[0:1] != b"P" or data[1:2] not in b"123456":
        raise ValueError(f"netpbm: bad magic {data[:2]!r}")
    magic = data[:2].decode()
    kind = int(magic[1])
    pos = 2
    width, pos = _int_token(data, pos, "width")
    height, pos = _int_token(data, pos, "height")
    if width <= 0 or height <= 0:
        raise ValueError(f"netpbm: bad dimensions {width}x{height}")
    if kind in (1, 4):
        maxval = 1
    else:
        maxval, pos = _int_token(data, pos, "maxval")
        if not 0 < maxval < 65536:
            raise ValueError(f"netpbm: bad maxval {maxval}")
    channels = 3 if kind in (3, 6) else 1
    n_samples = width * height * channels
    sums = [0, 0, 0]
    if kind in (1, 2, 3):  # plain: ASCII decimal samples to end of data
        if kind == 1:
            # P1 allows unseparated digits ('0110'); read bit characters
            vals = []
            p = pos
            n = len(data)
            while p < n and len(vals) < n_samples:
                c = data[p]
                if c in b"01":
                    vals.append(c - 0x30)
                    p += 1
                elif c in b" \t\r\n\x0b\x0c":
                    p += 1
                elif c == 0x23:
                    while p < n and data[p] not in b"\r\n":
                        p += 1
                else:
                    raise ValueError(f"netpbm: bad P1 byte at {p}")
        else:
            vals = []
            p = pos
            while len(vals) < n_samples:
                tok, p = _int_token(data, p, "sample")
                vals.append(int(tok))
        if len(vals) < n_samples:
            raise ValueError("netpbm: plain raster truncated")
        for i, v in enumerate(vals):
            if v > maxval:
                raise ValueError(f"netpbm: sample {v} > maxval {maxval}")
            if kind == 1:
                v = 1 - v  # PBM: 1 = black; report luminance
            sums[i % channels] += v
    else:  # raw: exactly ONE whitespace byte after the header
        if pos >= len(data) or data[pos] not in b" \t\r\n\x0b\x0c":
            raise ValueError(f"netpbm: missing raster separator at {pos}")
        pos += 1
        if kind == 4:
            row_bytes = (width + 7) // 8
            need = row_bytes * height
            if len(data) - pos < need:
                raise ValueError("netpbm: P4 raster truncated")
            for y in range(height):
                row = data[pos + y * row_bytes : pos + (y + 1) * row_bytes]
                for x in range(width):
                    bit = (row[x >> 3] >> (7 - (x & 7))) & 1
                    sums[0] += 1 - bit  # 1 = black → luminance
        else:
            bps = 2 if maxval > 255 else 1
            need = n_samples * bps
            if len(data) - pos < need:
                raise ValueError("netpbm: raw raster truncated")
            raster = data[pos : pos + need]
            for i in range(n_samples):
                v = (
                    (raster[2 * i] << 8) | raster[2 * i + 1]
                    if bps == 2
                    else raster[i]
                )
                if v > maxval:
                    raise ValueError(f"netpbm: sample {v} > maxval {maxval}")
                sums[i % channels] += v
    if channels == 1:
        sums = [sums[0], sums[0], sums[0]]
    return {
        "magic": magic,
        "width": width,
        "height": height,
        "maxval": maxval,
        "channels": channels,
        "sum_r": sums[0],
        "sum_g": sums[1],
        "sum_b": sums[2],
    }


def synth_netpbm(kind: int, width: int, height: int, maxval: int = 255) -> bytes:
    """Deterministic fixture image: sample value at flat index i is
    (i * 7 + kind) % (maxval + 1) (P1/P4: i % 2). Exercises mid-header
    comments and both raster encodings."""
    header = (
        f"P{kind}\n# synth {kind}\n{width} # w\n{height}\n".encode()
        if kind in (1, 4)
        else f"P{kind}\n# synth {kind}\n{width} # w\n{height}\n{maxval}\n".encode()
    )
    channels = 3 if kind in (3, 6) else 1
    n = width * height * channels
    if kind in (1, 4):
        bits = [i % 2 for i in range(width * height)]
        if kind == 1:
            return header + "\n".join(
                "".join(str(b) for b in bits[y * width : (y + 1) * width])
                for y in range(height)
            ).encode()
        row_bytes = (width + 7) // 8
        out = bytearray(header)
        for y in range(height):
            row = bytearray(row_bytes)
            for x in range(width):
                if bits[y * width + x]:
                    row[x >> 3] |= 0x80 >> (x & 7)
            out += row
        return bytes(out)
    vals = [(i * 7 + kind) % (maxval + 1) for i in range(n)]
    if kind in (2, 3):
        return header + " ".join(map(str, vals)).encode()
    bps = 2 if maxval > 255 else 1
    out = bytearray(header)
    for v in vals:
        out += v.to_bytes(bps, "big")
    return bytes(out)


NETPBM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("magic", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("maxval", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def netpbm_roundtrip_features(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per document: synthesize the Netpbm variant kind = id % 6 + 1
    (16-bit raw for P5/P6 when id % 12 >= 6) from closed forms, decode
    it for real, emit exact integer channel sums — SQL-expressible, so
    the oracle checks the encode→decode roundtrip exactly."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                kind = mid % 6 + 1
                w, h = mid % 7 + 1, mid % 5 + 1
                maxval = 1023 if (kind in (5, 6) and mid % 12 >= 6) else 255
                f = decode_netpbm(synth_netpbm(kind, w, h, maxval))
                rows.append({"media_id": mid, **f})
            yield pd.DataFrame(rows, columns=[f.name for f in NETPBM_SCHEMA.fields])

    return docs.select(id_col).mapInPandas(batches, NETPBM_SCHEMA)
