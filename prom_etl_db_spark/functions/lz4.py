"""LZ4 block format, from the public specification.

Reference scope: §2.E extension (round 6). LZ4 is the other workhorse
block codec of the data-lake stack (Parquet codec, Kafka compression,
Spark shuffle/io codecs); the BLOCK format
(github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md) is implemented
here exactly like remote_write's snappy: a strict DECODER (the
production path) plus a valid greedy ENCODER (fixtures/tests — the
spec admits any sequence mix that reproduces the bytes).

Format recap — a block is a sequence of SEQUENCES:
``token`` (high nibble literal length, low nibble match length − 4,
value 15 extends with 255-bytes), the literals, then a 2-byte
little-endian match offset (1..65535; 0 is invalid) and the match
copy, which may OVERLAP its own output (offset < length = RLE,
copied byte-at-a-time). The LAST sequence carries literals only —
the block ends after them (end-of-block rules: final sequence stops
at the literals). Malformed input refuses loudly with ValueError
(the codec fuzz convention; truncation and bit flips are gated).
"""

from __future__ import annotations


def lz4_block_decompress(data: bytes, *, max_out: int = 1 << 26) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    if n == 0:
        return b""
    while True:
        if pos >= n:
            raise ValueError(f"lz4: missing token at offset {pos}")
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError(f"lz4: literal length truncated at {pos}")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError(f"lz4: literals overrun block at {pos}")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if len(out) > max_out:
            raise ValueError("lz4: output exceeds max_out")
        if pos == n:  # last sequence: literals only, block ends
            return bytes(out)
        if pos + 2 > n:
            raise ValueError(f"lz4: match offset truncated at {pos}")
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"lz4: bad match offset {offset} at {pos}")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise ValueError(f"lz4: match length truncated at {pos}")
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        for _ in range(match_len):  # byte-wise: overlapping copies legal
            out.append(out[-offset])
        if len(out) > max_out:
            raise ValueError("lz4: output exceeds max_out")


def lz4_block_compress(data: bytes) -> bytes:
    """A VALID (not maximal) encoder: greedy 4-byte hash matching with
    2-byte offsets, honoring the spec's end-of-block rules (the final
    sequence is literals-only; matches must not cover the last 5 bytes
    and must start at least 12 bytes before the end — the mflimit
    rules real encoders follow)."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    pos = lit_start = 0

    def emit(lit_from: int, lit_to: int, match_len: int | None, offset: int | None):
        # bytearray mutation only (extend/append): += would rebind and
        # shadow the enclosing name
        lit_len = lit_to - lit_from
        ml = 0 if match_len is None else match_len - 4
        token = (min(lit_len, 15) << 4) | (min(ml, 15) if match_len is not None else 0)
        out.append(token)
        if lit_len >= 15:
            rem = lit_len - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(data[lit_from:lit_to])
        if match_len is not None:
            out.extend(offset.to_bytes(2, "little"))
            if ml >= 15:
                rem = ml - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    while pos + 12 <= n:  # mflimit: no matches near the end
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF:
            ln = 4
            limit = n - 5 - pos  # matches must not cover the last 5 bytes
            while ln < limit and data[cand + ln] == data[pos + ln]:
                ln += 1
            if ln >= 4:
                emit(lit_start, pos, ln, pos - cand)
                pos += ln
                lit_start = pos
                continue
        pos += 1
    emit(lit_start, n, None, None)  # final literals-only sequence
    return bytes(out)


def lz4_roundtrip_features(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per document: UTF-8 bytes → lz4 block compress → DECODE (the
    real path) → assert bit-identity → emit (id, n_bytes, payload_md5).
    The features are decode-derived, so the oracle's closed forms over
    the original text hash-check the whole roundtrip; mapInPandas,
    zero shuffle."""
    import hashlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("payload_md5", T.StringType()),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, txt in zip(pdf[id_col], pdf[text_col]):
                raw = str(txt).encode("utf-8")
                back = lz4_block_decompress(lz4_block_compress(raw))
                if back != raw:  # pragma: no cover - roundtrip invariant
                    raise ValueError(f"lz4: roundtrip mismatch for id {mid}")
                rows.append(
                    {
                        id_col: int(mid),
                        "n_bytes": len(back),
                        "payload_md5": hashlib.md5(back).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return docs.select(id_col, text_col).mapInPandas(walk, schema)
