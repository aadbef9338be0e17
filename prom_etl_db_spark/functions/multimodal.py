"""Multimodal column plumbing (SURVEY.md §2.E E4).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition-preserving
``mapInPandas``, Arrow batch shapes, deterministic outputs — is real and
tested; the actual codec step is STUBBED (this container ships no
image/audio libraries): ``decode_image_batch`` computes deterministic fake
features from the raw bytes, and ``real_decode`` raises
``NotImplementedError`` as the clearly-marked integration point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_etl_db_spark.parallel import balance
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "as_media",
    "decode_features",
    "sample_frames",
    "real_decode",
    "image_dimensions",
    "image_header_features",
]

# media table: payload + typed metadata (SURVEY.md §1.2 driver extension)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", IntegerType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("checksum", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), False),
    ]
)


def real_decode(payload: bytes, kind: str):
    """The real codec hook. STUB — image/audio libs are not in this
    container; wire Pillow/torchaudio/pyav here on a real cluster."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; decode_features uses a deterministic fake instead"
    )


def as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Fabricate a media table from the documents fixture: UTF-8 bytes of
    the text play the payload role (deterministic; exercises BinaryType
    end-to-end)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.length(F.encode(F.col("text"), "UTF-8")).cast("int").alias("n_bytes"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """'Decode' each payload into typed features via ``mapInPandas`` —
    Arrow-batched, partition-preserving (no shuffle). The fake decode is
    deterministic: checksum = Σ bytes mod 2^31, width/height derived from
    length, so tests can assert exact values. Swap the body for
    ``real_decode`` on a real cluster."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n = payloads.map(len)
            checksum = payloads.map(lambda b: sum(b) % (2**31))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n.astype("int32"),
                    "checksum": checksum.astype("int64"),
                    "width": (n % 640).astype("int32"),
                    "height": (n % 480).astype("int32"),
                }
            )

    return balance(media, "media_id").mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for 'video' payloads: emit ≤ max_frames fixed-stride
    byte slices per payload (the real frame decoder would slot into the
    same mapInPandas shape). 1→N row fan-out without a shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frame_nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    ids.append(mid)
                    frame_nos.append(i)
                    frames.append(bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame_bytes": frames}
            )

    return balance(media, "media_id").mapInPandas(batches, FRAME_SCHEMA)


def image_dimensions(payload: bytes) -> "tuple[str, int, int] | None":
    """REAL header-level metadata extraction — (format, width, height)
    from raw bytes, no codec library required:

    - PNG:  IHDR chunk carries big-endian u32 width/height at bytes 16/20
    - JPEG: scan to the first SOF marker (0xC0-0xCF minus C4/C8/CC);
      height/width are big-endian u16 after the precision byte
    - GIF:  little-endian u16 pair right after the 6-byte signature

    Returns None for anything else — unknown payloads are data, not
    errors (the A12 stance).
    """
    def _dims(fmt: str, w: int, h: int) -> "tuple[str, int, int] | None":
        # sanity-bound: a header CLAIMING dimensions outside int32 (or
        # zero) is malformed/adversarial — 33 crafted bytes must yield
        # None, not crash the Arrow batch downstream
        if 0 < w < 2**31 and 0 < h < 2**31:
            return (fmt, w, h)
        return None

    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            return _dims(
                "png",
                int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"),
            )
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _dims(
                "gif",
                int.from_bytes(payload[6:8], "little"),
                int.from_bytes(payload[8:10], "little"),
            )
        if payload[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    return None  # marker desync — corrupt stream
                marker = payload[i + 1]
                if marker == 0xFF:
                    i += 1  # ITU T.81 allows 0xFF fill bytes before markers
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    height = int.from_bytes(payload[i + 5 : i + 7], "big")
                    width = int.from_bytes(payload[i + 7 : i + 9], "big")
                    return _dims("jpeg", width, height)
                i += 2 + seg_len
    except (IndexError, ValueError):
        return None
    return None


IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def image_header_features(media: DataFrame) -> DataFrame:
    """Genuine (non-stub) image metadata over the binary column:
    ``image_dimensions`` per payload via partition-preserving
    ``mapInPandas`` — the exact plumbing a full decoder uses, with the
    header parse standing where pixel decode would go. Unknown formats
    yield nulls, never failures."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [image_dimensions(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [m[0] if m else None for m in metas],
                    "width": pd.array(
                        [m[1] if m else None for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m[2] if m else None for m in metas], dtype="Int32"
                    ),
                }
            )

    return balance(media, "media_id").mapInPandas(batches, IMAGE_META_SCHEMA)
