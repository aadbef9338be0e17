"""Baseline TIFF decoding (TIFF 6.0, uncompressed).

Reference scope: §2.E multimodal extension (round 6). TIFF is the
archival/scientific interchange container (scanners, GIS, ML label
masks); unlike the magic-prefix codecs (PNG/BMP/Netpbm) it is a
DIRECTORY format: a header points at an IFD (image file directory) of
typed tag entries whose values live either inline in the entry's
4-byte value slot or anywhere else in the file by offset — the same
walk-a-typed-catalog shape as the WARC/ISO-28500 work, but binary and
endian-parameterized. Implemented from the public TIFF 6.0
specification (Adobe, 1992), baseline subset:

- both byte orders (``II`` little / ``MM`` big endian, magic 42);
- IFD entry types SHORT/LONG/BYTE/RATIONAL as used by baseline tags;
- value-or-offset rule: values ≤ 4 bytes are INLINE LEFT-JUSTIFIED in
  the entry slot (the classic trap: a single SHORT sits in the first
  two bytes under II but the first two bytes under MM too — the slot
  is a byte array, not an integer);
- strips: StripOffsets/StripByteCounts/RowsPerStrip;
- PhotometricInterpretation 0/1 (grayscale, incl. 0 = WhiteIsZero
  inversion) and 2 (RGB), BitsPerSample 8, Compression 1 (none);
- multi-page files: IFDs chain via the next-IFD offset.

Non-baseline features (LZW/PackBits/JPEG-in-TIFF, tiles, planar
config 2, palettes) refuse loudly — documented subset, ValueError
with tag context (the codec fuzz convention).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _u(data: bytes, pos: int, size: int, big: bool) -> int:
    if pos + size > len(data):
        raise ValueError(f"tiff: read past end at offset {pos}")
    return int.from_bytes(data[pos : pos + size], "big" if big else "little")


def _entry_values(data: bytes, entry_pos: int, big: bool) -> tuple[int, list[int]]:
    """One IFD entry → (tag, values) honoring the value-or-offset rule."""
    tag = _u(data, entry_pos, 2, big)
    typ = _u(data, entry_pos + 2, 2, big)
    count = _u(data, entry_pos + 4, 4, big)
    if typ not in _TYPE_SIZES:
        raise ValueError(f"tiff: tag {tag} has unsupported type {typ}")
    size = _TYPE_SIZES[typ] * count
    if size <= 4:
        base = entry_pos + 8  # inline, left-justified in the slot
    else:
        base = _u(data, entry_pos + 8, 4, big)
    vals = []
    step = _TYPE_SIZES[typ]
    for i in range(count):
        if typ == 5:  # RATIONAL: numerator/denominator pair
            num = _u(data, base + 8 * i, 4, big)
            den = _u(data, base + 8 * i + 4, 4, big)
            vals.append(num if den in (0, 1) else num // den)
        else:
            vals.append(_u(data, base + step * i, step, big))
    return tag, vals


def decode_tiff(data: bytes) -> list[dict]:
    """→ one dict per page: {page, width, height, channels, sum_r/g/b}
    (exact integer channel sums, WhiteIsZero inverted to luminance)."""
    if len(data) < 8:
        raise ValueError("tiff: truncated header")
    order = data[:2]
    if order == b"II":
        big = False
    elif order == b"MM":
        big = True
    else:
        raise ValueError(f"tiff: bad byte order {order!r}")
    if _u(data, 2, 2, big) != 42:
        raise ValueError("tiff: bad magic")
    ifd_off = _u(data, 4, 4, big)
    pages = []
    page = 0
    while ifd_off != 0:
        if page > 64:
            raise ValueError("tiff: IFD chain too long (cycle?)")
        n_entries = _u(data, ifd_off, 2, big)
        tags: dict[int, list[int]] = {}
        for i in range(n_entries):
            tag, vals = _entry_values(data, ifd_off + 2 + 12 * i, big)
            tags[tag] = vals
        ifd_off = _u(data, ifd_off + 2 + 12 * n_entries, 4, big)

        def one(tag: int, default=None) -> int:
            if tag not in tags:
                if default is None:
                    raise ValueError(f"tiff: page {page} missing tag {tag}")
                return default
            return tags[tag][0]

        width = one(256)
        height = one(257)
        compression = one(259, 1)
        if compression != 1:
            raise ValueError(
                f"tiff: page {page} compression {compression} is not baseline-"
                "uncompressed; LZW/PackBits/JPEG are out of the documented subset"
            )
        photometric = one(262)
        if photometric not in (0, 1, 2):
            raise ValueError(f"tiff: page {page} photometric {photometric} unsupported")
        spp = one(277, 1)
        if photometric == 2 and spp != 3:
            raise ValueError(f"tiff: RGB page {page} with {spp} samples/pixel")
        if one(284, 1) != 1:
            raise ValueError(f"tiff: page {page} planar config 2 unsupported")
        bits = tags.get(258, [8])
        if any(b != 8 for b in bits):
            raise ValueError(f"tiff: page {page} BitsPerSample {bits} != 8")
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError(f"tiff: page {page} bad strip tables")
        raster = bytearray()
        for off, cnt in zip(offsets, counts):
            if off + cnt > len(data):
                raise ValueError(f"tiff: page {page} strip overruns file")
            raster += data[off : off + cnt]
        need = width * height * spp
        if len(raster) < need:
            raise ValueError(f"tiff: page {page} raster short ({len(raster)}<{need})")
        sums = [0, 0, 0]
        for i in range(need):
            v = raster[i]
            if photometric == 0:  # WhiteIsZero → invert to luminance
                v = 255 - v
            sums[i % spp] += v
        if spp == 1:
            sums = [sums[0]] * 3
        pages.append(
            {
                "page": page,
                "width": width,
                "height": height,
                "channels": spp,
                "sum_r": sums[0],
                "sum_g": sums[1],
                "sum_b": sums[2],
            }
        )
        page += 1
    if not pages:
        raise ValueError("tiff: no IFDs")
    return pages


def synth_tiff(
    pages: list[tuple[int, int, int]], *, big: bool = False
) -> bytes:
    """Fixture writer: pages = [(width, height, photometric 0/1/2)];
    sample at flat index i of page p is (i * 11 + p) % 256. Emits a
    chained multi-IFD file in either byte order with strip data placed
    AFTER each IFD (offsets exercised) and one two-strip page when the
    height allows."""

    def enc(v: int, size: int) -> bytes:
        return v.to_bytes(size, "big" if big else "little")

    out = bytearray(b"MM" if big else b"II")
    out += enc(42, 2)
    out += enc(8, 4)  # first IFD right after the header
    pos = 8
    for p, (w, h, photo) in enumerate(pages):
        spp = 3 if photo == 2 else 1
        raster = bytes(((i * 11 + p) % 256) for i in range(w * h * spp))
        two_strips = h >= 2
        rows1 = (h + 1) // 2 if two_strips else h
        strip1 = raster[: rows1 * w * spp]
        strip2 = raster[rows1 * w * spp :]
        entries = []  # (tag, type, count, values)
        entries.append((256, 3, 1, [w]))
        entries.append((257, 3, 1, [h]))
        entries.append((258, 3, spp, [8] * spp))
        entries.append((259, 3, 1, [1]))
        entries.append((262, 3, 1, [photo]))
        entries.append((277, 3, 1, [spp]))
        entries.append((278, 3, 1, [rows1]))
        n_strips = 2 if two_strips and strip2 else 1
        entries.append((273, 4, n_strips, [0] * n_strips))  # patched below
        entries.append(
            (279, 4, n_strips, [len(strip1)] + ([len(strip2)] if n_strips == 2 else []))
        )
        entries.sort()
        ifd_pos = pos
        ifd_size = 2 + 12 * len(entries) + 4
        extra_pos = ifd_pos + ifd_size
        extra = bytearray()
        # lay out out-of-line arrays (bits for RGB, strip tables) then strips
        ool: dict[int, int] = {}
        for tag, typ, count, vals in entries:
            size = _TYPE_SIZES[typ] * count
            if size > 4:
                ool[tag] = extra_pos + len(extra)
                for v in vals:
                    extra += enc(v, _TYPE_SIZES[typ])
        strip_offsets = [extra_pos + len(extra)]
        extra += strip1
        if n_strips == 2:
            strip_offsets.append(extra_pos + len(extra))
            extra += strip2
        ifd = bytearray(enc(len(entries), 2))
        for tag, typ, count, vals in entries:
            if tag == 273:
                vals = strip_offsets
                # strip offsets were placed after extra arrays: rewrite
                # the out-of-line copy too if it exists
                if tag in ool:
                    off = ool[tag] - extra_pos
                    b = bytearray(extra)
                    for i, v in enumerate(vals):
                        b[off + 4 * i : off + 4 * (i + 1)] = enc(v, 4)
                    extra = b
            ifd += enc(tag, 2) + enc(typ, 2) + enc(count, 4)
            size = _TYPE_SIZES[typ] * count
            if size <= 4:
                slot = bytearray(4)
                for i, v in enumerate(vals):
                    s = _TYPE_SIZES[typ]
                    slot[i * s : (i + 1) * s] = enc(v, s)
                ifd += slot
            else:
                ifd += enc(ool[tag], 4)
        next_ifd = extra_pos + len(extra) if p + 1 < len(pages) else 0
        ifd += enc(next_ifd, 4)
        out += ifd + extra
        pos = len(out)
    return bytes(out)


TIFF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def tiff_roundtrip_features(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per document a TWO-PAGE TIFF (page 0: photometric by id % 3,
    id-sized dims; page 1: small RGB), byte order big-endian when
    id % 2 — synthesized from closed forms, decoded for real, exact
    integer channel sums per page."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = mid % 6 + 1, mid % 4 + 2
                photo = mid % 3
                blob = synth_tiff(
                    [(w, h, photo), (2, 2, 2)], big=bool(mid % 2)
                )
                for f in decode_tiff(blob):
                    rows.append({"media_id": mid, **f})
            yield pd.DataFrame(rows, columns=[f.name for f in TIFF_SCHEMA.fields])

    return docs.select(id_col).mapInPandas(batches, TIFF_SCHEMA)
