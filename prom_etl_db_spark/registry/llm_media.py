"""SURVEY.md §2.E — multimodal codecs (BMP/PNG/GIF/JPEG/WAV/G.711/
MPEG-1 Layer I/MJPEG-AVI) and embedding-space dedup/clustering.
Contiguous split of the former llm_e.py (round 6, pure mechanics —
registration order unchanged; VERDICT r5 task #6)."""

from __future__ import annotations

from datetime import datetime, timedelta  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from prom_etl_db_spark import store  # noqa: F401
from prom_etl_db_spark.functions import (  # noqa: F401
    clustering,
    decontam,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
from prom_etl_db_spark.operators import analytics, promql  # noqa: F401
from prom_etl_db_spark.registry.core import (  # noqa: F401
    FLAGSHIP_DAY,
    NOW,
    _event_samples,
    _events,
    _t,
    register,
)
from prom_etl_db_spark.timeparse import RelativeTimeParser  # noqa: F401


@register(
    "multimodal_decode",
    oracle="""
SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
       octet_length(encode(text)) % 640 AS width,
       octet_length(encode(text)) % 480 AS height
FROM documents
""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: binary media plumbing — payload → mapInPandas feature extraction
    (deterministic fake decode; codec stubbed, Spark plumbing real)."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.as_media(docs)
    feats = multimodal.decode_features(media)
    return feats.select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


@register(
    "media_frame_counts",
    oracle="""
SELECT doc_id AS media_id,
       least(8, greatest(1, octet_length(encode(text)) // 64)) AS n_frames
FROM documents
""",
)
def media_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: frame sampling fan-out (≤8 fixed-stride slices per payload)."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.as_media(docs, kind="video")
    frames = multimodal.sample_frames(media, every_n_bytes=64, max_frames=8)
    return frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))


@register(
    "multimodal_bmp_pixels",
    oracle="""
SELECT doc_id AS media_id,
       CAST(doc_id % 16 + 1 AS INT) AS width,
       CAST(doc_id % 8 + 1 AS INT) AS height,
       CAST(doc_id % 256 AS DOUBLE) AS mean_r,
       CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
       CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
FROM documents
""",
)
def multimodal_bmp_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL pixel decode): per document, synthesize a valid 24-bit
    BMP from closed-form id functions, then fully decode it — headers,
    padded bottom-up pixel rows, per-channel means over every pixel — in
    mapInPandas. The oracle recomputes the closed forms, so the driver
    hash-checks the encode→decode roundtrip byte-for-byte."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.bmp_roundtrip_features(docs)


@register(
    "multimodal_png_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((doc_id + 3 * x + 5 * y) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((doc_id * 7 + x) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((doc_id * 13 + y) % 256 AS DOUBLE)), 6) AS mean_b
FROM px GROUP BY doc_id
""",
)
def multimodal_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL PNG decode, stdlib only — closes r2's last stub): per
    document, encode a real 8-bit truecolor PNG of a closed-form gradient
    with row filters cycling through all five PNG filter types, then
    fully decode it back (zlib inflate + Sub/Up/Average/Paeth
    reconstruction) in mapInPandas. The oracle recomputes the gradient
    means per pixel, so the driver hash-checks the entire compress→
    inflate→defilter algebra; a single wrong Paeth branch shifts a
    channel mean and breaks the hash."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.png_roundtrip_features(docs)


@register(
    "audio_g711_expansion",
    oracle="""
WITH s AS (
  SELECT d.doc_id, d.doc_id % 64 + 16 AS n, i.range AS i
  FROM documents d CROSS JOIN range(80) i
  WHERE i.range < d.doc_id % 64 + 16
), enc AS (
  SELECT doc_id, n,
         (doc_id + 7 * i) % 256 AS bu,
         (doc_id * 3 + 11 * i) % 256 AS ba
  FROM s
), expanded AS (
  -- the CCITT reference formulas verbatim (G.711):
  -- ulaw: u = ~b & 255; t = (((u&15)<<3)+132) << ((u>>4)&7);
  --       sign bit of u picks 132-t vs t-132
  -- alaw: a = b ^ 85; seg switch on (a>>4)&7; sign bit of a POSITIVE
  SELECT doc_id, n,
    CASE WHEN ((255 - bu) & 128) != 0
         THEN 132 - ((((255 - bu) & 15) * 8 + 132)
                     * (1 << (((255 - bu) >> 4) & 7)))
         ELSE (((255 - bu) & 15) * 8 + 132)
              * (1 << (((255 - bu) >> 4) & 7)) - 132
    END AS vu,
    (CASE WHEN (xor(ba, 85) & 128) != 0 THEN 1 ELSE -1 END) *
    (CASE ((xor(ba, 85) >> 4) & 7)
       WHEN 0 THEN (xor(ba, 85) & 15) * 16 + 8
       WHEN 1 THEN (xor(ba, 85) & 15) * 16 + 264
       ELSE ((xor(ba, 85) & 15) * 16 + 264)
            * (1 << (((xor(ba, 85) >> 4) & 7) - 1))
     END) AS va
  FROM enc
)
SELECT doc_id AS media_id,
       CAST(min(n) AS INT) AS n_samples,
       round(sqrt(avg(CAST(vu AS DOUBLE) * vu)), 4) AS ulaw_rms,
       round(sqrt(avg(CAST(va AS DOUBLE) * va)), 4) AS alaw_rms,
       round(avg(CAST(vu AS DOUBLE)), 4) AS ulaw_mean,
       round(avg(CAST(va AS DOUBLE)), 4) AS alaw_mean
FROM expanded GROUP BY doc_id
""",
)
def audio_g711_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, telephony formats (r4): per document a µ-law AND an
    A-law 8-bit WAV (ITU-T G.711, format codes 7/6) are written from
    closed-form encoded bytes and fully decoded back — RIFF walk,
    format-code dispatch, CCITT table expansion to 16-bit linear. The
    expansion is pure integer bit algebra, so the oracle recomputes it
    in SQL verbatim and the driver hash-checks every table entry the
    fixture touches (all 256 per law across the corpus); known vectors
    (µ-law 0x80 → +32124, A-law 0xAA → +32256) pin the endpoints in
    unit tests."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.g711_expansion_features(docs)


@register(
    "audio_mpeg_decode",
    oracle="""
WITH grid AS (
  SELECT d.doc_id, f.range AS f, sb.range AS sb
  FROM documents d
  CROSS JOIN range(3) f CROSS JOIN range(32) sb
  WHERE f.range < 1 + d.doc_id % 3
), p AS (
  SELECT doc_id, f, sb,
         CASE WHEN (doc_id + f + sb) % 4 = 0 THEN 0
              ELSE 2 + (doc_id + 3*f + sb) % 9 END AS alloc,
         (doc_id*7 + f*11 + sb*5) % 63 AS sfi
  FROM grid
), q AS (
  SELECT doc_id, f, sb, alloc + 1 AS nb, sfi, s.range AS s,
         (doc_id + 7*f + 3*sb + 5*s.range) % ((1 << (alloc + 1)) - 1) AS code
  FROM p CROSS JOIN range(12) s WHERE alloc > 0
), v AS (
  SELECT doc_id, f, sb, nb, sfi, s, code,
         2.0 * pow(2.0, -(sfi/3.0))
         * ((1.0 / (1.0 - pow(2.0, -CAST(nb AS DOUBLE))))
            * ((code + 1) * pow(2.0, CAST(1 - nb AS DOUBLE)) - 1.0)) AS val
  FROM q
)
SELECT doc_id AS media_id, CAST(f AS INT) AS frame,
       CAST(sb AS INT) AS subband, CAST(nb AS INT) AS nb,
       CAST(sfi AS INT) AS sf_idx,
       CAST(sum(code) AS BIGINT) AS code_sum,
       round(min(CASE WHEN s = 0 THEN val END), 6) AS v0,
       round(max(abs(val)), 6) AS speak
FROM v GROUP BY doc_id, f, sb, nb, sfi
""",
)
def audio_mpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, MPEG-1 Layer I (ISO/IEC 11172-3 — r5, the VERDICT 'MP3
    story' decision): per document, REAL Layer I frames (448 kbps,
    32 kHz, mono, CRC-protected) are assembled from closed-form field
    derivations and fully decoded back from raw bytes — 12-bit sync +
    header arithmetic, CRC-16 over header+allocation, the 4-bit
    bit-allocation walk, 6-bit scalefactor indices (Table B.1 is the
    closed form 2*2^(-idx/3)), MSB-first sample codes, and §2.4.3.3
    requantization s'' = (2^nb/(2^nb-1))*((C+1)*2^(1-nb) - 1) — all of
    which is spec FORMULA arithmetic, recomputed verbatim by this SQL
    oracle, so the driver hash-checks the whole bitstream round-trip
    per (frame, active subband): the exact integer code sum plus two
    order-free floats (s=0 value, 12-sample peak — float SUMS are
    deliberately unhashed, see mpeg1_subband_features on why pairwise
    vs sequential summation breaks a .00005 boundary at corpus scale).
    The one non-closed-form step — the 512
    Table-B.3 synthesis-window coefficients, printed numbers with no
    generating formula and no copy offline — is a documented pluggable
    hook (`mpeg_audio.set_synthesis_window`), and Layer II/III stay
    env-stubbed for the same numeric-table reason (DIVERGENCES.md)."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.mpeg1_subband_features(docs)


@register(
    "video_mjpeg_frame_sampling",
    oracle="""
WITH pick AS (
  SELECT d.doc_id, d.doc_id % 5 + 2 AS nf, j.range AS j,
         (j.range * (d.doc_id % 5 + 1)) // 2 AS fi
  FROM documents d CROSS JOIN range(3) j
), comp AS (
  SELECT p.doc_id, p.nf, p.j, p.fi,
         CAST((p.doc_id * 3 + 5 * b.range + 11 * p.fi) % 256 AS DOUBLE) AS y,
         CAST((p.doc_id * 11 + 4 * b.range + 3 * p.fi) % 256 AS DOUBLE) AS cb,
         CAST((p.doc_id * 13 + 2 * b.range + 5 * p.fi) % 256 AS DOUBLE) AS cr
  FROM pick p CROSS JOIN range(2) b
), rgb AS (
  SELECT doc_id, nf, j, fi,
         least(255, greatest(0, floor(
           y + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
         least(255, greatest(0, floor(
           y - CAST(0.344136 AS DOUBLE) * (cb - 128)
             - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
         least(255, greatest(0, floor(
           y + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM comp
)
SELECT doc_id AS media_id,
       CAST(min(nf) AS INT) AS n_frames,
       CAST(j AS INT) AS frame_pos,
       CAST(min(fi) AS INT) AS frame_index,
       round(avg(r), 6) AS mean_r,
       round(avg(g), 6) AS mean_g,
       round(avg(b), 6) AS mean_b
FROM rgb GROUP BY doc_id, j
""",
)
def video_mjpeg_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 video, REAL container + REAL lossy codec (r4): per document an
    MJPEG AVI (RIFF hdrl/movi/idx1, one baseline JPEG per frame) is
    encoded from closed forms, uniformly frame-sampled at 3 positions,
    and each sampled frame fully decoded (RIFF walk → 00dc chunks →
    Huffman/dequant/IDCT/YCbCr). Flat quantization + per-block-constant
    frames keep the lossy decode bit-exact, so one oracle hash-checks
    container parsing, the floor(j·(F−1)/(k−1)) sampling grid, and the
    JPEG pipeline together. The GIF twin (`video_frame_sampling`) covers
    the lossless-codec container; this covers the lossy one."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.video_mjpeg_frame_features(docs)


@register(
    "multimodal_png_palette_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h,
         CASE d.doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 4
                           WHEN 2 THEN 16 ELSE 64 END AS nc
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
), idx AS (
  SELECT doc_id, w, h, (doc_id + 3 * x + 5 * y) % nc AS i FROM px
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((3 * i) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((5 * i) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((7 * i) % 256 AS DOUBLE)), 6) AS mean_b
FROM idx GROUP BY doc_id
""",
)
def multimodal_png_palette_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (indexed-color PNG, r4 — VERDICT task #7): per document a real
    PLTE PNG at bit depth 1/2/4/8 (cycling by id) of a closed-form index
    grid is encoded, then fully decoded back — inflate, defilter,
    MSB-first sub-byte unpack, palette map — in mapInPandas. The oracle
    recomputes the palette-mapped channel means, hash-checking the
    packed-bit algebra at every legal palette depth."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.png_palette_roundtrip_features(docs)


@register(
    "multimodal_png_interlaced_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((doc_id + 3 * x + 5 * y) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((doc_id * 7 + x) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((doc_id * 13 + y) % 256 AS DOUBLE)), 6) AS mean_b
FROM px GROUP BY doc_id
""",
)
def multimodal_png_interlaced_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (Adam7 PNG, r4 — VERDICT task #7): the straight-PNG gradient
    written INTERLACED (seven independently-filtered pass sub-images in
    one deflate stream) and decoded through the pass-scatter path. The
    oracle is the same closed-form means as `multimodal_png_pixels`; a
    wrong pass grid, pass ordering, or per-pass filter reset scrambles
    pixel positions and breaks the hash."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.png_interlaced_roundtrip_features(docs)


@register(
    "multimodal_png16_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 8 + 1 AS w, d.doc_id % 6 + 1 AS h
  FROM documents d CROSS JOIN range(8) x CROSS JOIN range(6) y
  WHERE x.range < d.doc_id % 8 + 1 AND y.range < d.doc_id % 6 + 1
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((doc_id * 257 + 1000 * x + 2000 * y) % 65536
                      AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((doc_id * 4097 + 300 * x) % 65536 AS DOUBLE)), 6)
         AS mean_g,
       round(avg(CAST((doc_id * 9973 + 777 * y) % 65536 AS DOUBLE)), 6)
         AS mean_b
FROM px GROUP BY doc_id
""",
)
def multimodal_png16_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (16-bit PNG, r4 — the decoder's LAST refusal branch closed):
    full-range 16-bit truecolor gradients encoded big-endian with all
    five filter types cycling on the doubled (bpp=6) byte stride, then
    fully decoded back. The oracle recomputes the 16-bit closed forms;
    a byte-order slip or a filter operating on samples instead of bytes
    shifts a channel mean and breaks the hash."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.png16_roundtrip_features(docs)


@register(
    "multimodal_jpeg_pixels",
    oracle="""
WITH blk AS (
  SELECT d.doc_id, bx.range AS bx, by.range AS by,
         d.doc_id % 3 + 1 AS wb, d.doc_id % 2 + 1 AS hb
  FROM documents d CROSS JOIN range(3) bx CROSS JOIN range(2) by
  WHERE bx.range < d.doc_id % 3 + 1 AND by.range < d.doc_id % 2 + 1
), comp AS (
  SELECT doc_id, wb, hb,
         CAST((doc_id * 3 + 5 * bx + 7 * by) % 256 AS DOUBLE) AS y,
         CAST((doc_id * 11 + 4 * bx + 6 * by) % 256 AS DOUBLE) AS cb,
         CAST((doc_id * 13 + 2 * bx + 3 * by) % 256 AS DOUBLE) AS cr
  FROM blk
), rgb AS (
  -- the decoder's JFIF floats with floor(x+0.5) rounding, verbatim
  SELECT doc_id, wb, hb,
         least(255, greatest(0, floor(
           y + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
         least(255, greatest(0, floor(
           y - CAST(0.344136 AS DOUBLE) * (cb - 128)
             - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
         least(255, greatest(0, floor(
           y + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM comp
)
SELECT doc_id AS media_id,
       CAST(min(wb) * 8 AS INT) AS width,
       CAST(min(hb) * 8 AS INT) AS height,
       round(avg(r), 6) AS mean_r,
       round(avg(g), 6) AS mean_g,
       round(avg(b), 6) AS mean_b
FROM rgb GROUP BY doc_id
""",
)
def multimodal_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL baseline-JPEG decode, stdlib+numpy — closes r3's lossy
    stub, VERDICT task #3): per document, encode a valid baseline JPEG
    of closed-form per-block-constant Y/Cb/Cr with flat quantization and
    restart markers every 2 MCUs, then fully decode it back — Huffman
    entropy decode off the file's own DHT, restart resync + DC predictor
    resets, dequantize, un-zigzag, IDCT, YCbCr→RGB — in mapInPandas.
    Blockwise-constant input + all-ones tables make the lossy pipeline
    bit-exact, so the oracle recomputes the expected RGB means in SQL
    and the driver hash-checks the whole entropy-coding algebra. The
    decoder also passes two known-vector tests against hand-assembled
    from-the-spec JPEGs (tests/test_multimodal.py) — a flat-DQT vector
    for the Huffman/bit-order/IDCT path and a zigzag-ramp-DQT vector
    that pins the dequantization ORDER (the r5 fix) — checking interop
    rather than mere self-consistency."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.jpeg_roundtrip_features(docs)


@register(
    "multimodal_gif_pixels",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h,
         (d.doc_id + 3 * x.range + 5 * y.range) % 64 AS idx
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
)
SELECT doc_id AS media_id,
       CAST(min(w) AS INT) AS width,
       CAST(min(h) AS INT) AS height,
       round(avg(CAST((3 * idx) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((5 * idx) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((7 * idx) % 256 AS DOUBLE)), 6) AS mean_b
FROM px GROUP BY doc_id
""",
)
def multimodal_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL GIF decode, stdlib only): per document, encode a valid
    GIF89a of a closed-form 64-color palette image, then fully decode it
    back — sub-block reassembly, variable-width LSB-first LZW (clear/EOI,
    KwK case, giflib width sync), palette mapping — in mapInPandas. The
    oracle recomputes the palette-mapped channel means per pixel, so the
    driver hash-checks the whole compress→decompress roundtrip; the
    decoder also passes a known-vector test against the canonical
    hand-assembled 1×1 GIF, proving interop rather than mere
    self-consistency."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.gif_roundtrip_features(docs)


@register(
    "multimodal_resize_roundtrip",
    oracle="""
WITH hmean AS (
  SELECT h, round(30.0 * avg(CAST(floor(i.range * 8.0 / hs.h) AS DOUBLE)), 6) AS mean_v
  FROM (SELECT range + 1 AS h FROM range(4)) hs
  JOIN range(4) i ON i.range < hs.h
  GROUP BY h
)
SELECT d.doc_id AS media_id, CAST(2 AS INT) AS width,
       CAST(d.doc_id % 4 + 1 AS INT) AS height, hmean.mean_v AS mean_px
FROM documents d JOIN hmean ON hmean.h = d.doc_id % 4 + 1
""",
)
def multimodal_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 transform: encode -> nearest-neighbor resize -> decode over a
    gradient BMP, with the resized mean's closed form recomputed by the
    oracle - the pixel-selection arithmetic is what's being gated."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.bmp_resize_roundtrip_features(docs)


@register(
    "multimodal_wav_samples",
    oracle="""
SELECT doc_id AS media_id,
       CAST(1 AS INT) AS channels,
       CAST(8000 AS INT) AS sample_rate,
       CAST((doc_id % 50 + 1) * 100 AS INT) AS n_samples,
       round(CAST((doc_id % 50 + 1) * 100 AS DOUBLE) / 8000, 6) AS duration_s,
       round(CAST(doc_id % 1000 AS DOUBLE), 6) AS rms
FROM documents
""",
)
def multimodal_wav_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL sample decode): a valid PCM-16 WAV per document
    (alternating ±amplitude → RMS exactly |amplitude|), decoded
    sample-by-sample through the RIFF chunk walk."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.wav_roundtrip_features(docs)


@register(
    "video_frame_sampling",
    oracle="""
WITH f AS (
  SELECT d.doc_id, j.range AS frame_pos,
         d.doc_id % 6 + 2 AS nf,
         d.doc_id % 8 + 2 AS w, d.doc_id % 4 + 2 AS h,
         (j.range * (d.doc_id % 6 + 1)) // 2 AS fi
  FROM documents d CROSS JOIN range(3) j
), px AS (
  SELECT f.doc_id, f.frame_pos, f.nf, f.fi,
         (f.doc_id + 7 * f.fi + 3 * x.range + 5 * y.range) % 64 AS idx
  FROM f CROSS JOIN range(9) x CROSS JOIN range(5) y
  WHERE x.range < f.w AND y.range < f.h
)
SELECT doc_id AS media_id,
       CAST(min(nf) AS INT) AS n_frames,
       CAST(frame_pos AS INT) AS frame_pos,
       CAST(min(fi) AS INT) AS frame_index,
       round(avg(CAST((3 * idx) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((5 * idx) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((7 * idx) % 256 AS DOUBLE)), 6) AS mean_b
FROM px GROUP BY doc_id, frame_pos
""",
)
def video_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 video path (the brief's "frame-sample" op, containerized as
    animated GIF — real multi-frame plumbing, no ffmpeg): per document a
    2-7 frame animation is ENCODED (per-frame LZW + graphic-control
    extensions + NETSCAPE loop block), uniformly sampled at 3 positions
    (frame index floor(j·(F−1)/(k−1)) — endpoints included), and each
    sampled frame fully DECODED to channel means. Both the sampling
    arithmetic and the means are closed forms, so one oracle hash-checks
    frame selection and the multi-frame codec together. mapInPandas,
    bounded per-clip work, zero shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.video_frame_sample_features(docs)


@register(
    "audio_signal_features",
    oracle="""
SELECT doc_id AS media_id,
       CAST(CASE WHEN doc_id % 1000 = 0 THEN 0.0 ELSE 1.0 END AS DOUBLE)
         AS zcr,
       CAST(doc_id % 1000 AS DOUBLE) AS peak_amplitude,
       CAST(CASE WHEN doc_id % 1000 = 0 THEN 0.0 ELSE 4000.0 END AS DOUBLE)
         AS spectral_centroid_hz,
       CAST(0.0 AS DOUBLE) AS spectral_bandwidth_hz
FROM documents
""",
)
def audio_signal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio ANALYSIS (beyond decode): zero-crossing rate, peak, and
    FFT spectral centroid/bandwidth per clip — the per-clip scalars an
    audio curation pipeline filters and stratifies on. The fixture's
    alternating ±amplitude square wave is the pure-Nyquist signal, so a
    genuine numpy-rfft pipeline is gated against CLOSED FORMS: zcr 1,
    every gram of spectral mass at fs/2 = 4000 Hz, bandwidth 0 (silent
    clips: all zeros). Arrow-batched mapInPandas; at 100 TB each clip is
    one bounded rfft in its own batch — embarrassingly parallel, no
    shuffle at all."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.wav_signal_features(docs)


@register(
    "embedding_neardup_pairs",
    oracle="""
WITH scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                   for i in range(1, len(a.embedding)+1)])
         / (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                           for i in range(1, len(a.embedding)+1)]))
            * sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                             for i in range(1, len(b.embedding)+1)]))) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(sim, 6) AS cos_sim FROM scored WHERE sim >= 0.4
""",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (embedding near-dup, exact): all pairs with cosine ≥ 0.4 —
    broadcast small side, JVM-side fold; the correctness baseline for the
    LSH scale path below."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup_pairs(emb, threshold=0.4)


@register("embedding_neardup_lsh")  # approximate (sign-LSH) → rows-only check
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (embedding near-dup, scale path): random-hyperplane LSH banding +
    exact-cosine verify; candidate shuffle carries (id, band, key) only.
    bands/bits AUTO-SIZE from the corpus count (lsh_auto_size): bits grows
    with log2(corpus) so random-pair candidate volume stays near-linear,
    bands then sized for 95% recall at the threshold — at fixture scale
    this resolves to bits=8, bands=118 (p_band = (1-acos(0.4)/pi)^8 ~
    0.025), matching the hand-sized round-1 values; at 100x the corpus it
    grows bits instead of going quadratic. Unit tests cross-validate
    recall against the exact variant."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup_lsh(emb, threshold=0.4)


@register(
    "embedding_signlsh_codes",
    oracle=similarity.signlsh_oracle_sql("embeddings", "vec_id", "embedding"),
)
def embedding_signlsh_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket codes over md5-derived hyperplanes — the
    deterministic verification surface for `embedding_neardup_lsh`'s
    estimator: the DuckDB dual re-derives every plane component from the
    same md5 map and folds the dots in the same element order, so all 16
    sign bits hash-match. One narrow zero-shuffle projection."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.signlsh_codes(emb, "vec_id", "embedding", bits=16, dim=64)


_KMEANS_CTE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
), c0 AS (
  SELECT row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR) || 'kmeans-init'), vec_id
         ) - 1 AS cluster,
         list_transform(vec, x -> round(x, 6)) AS centroid
  FROM v
  ORDER BY md5(CAST(vec_id AS VARCHAR) || 'kmeans-init'), vec_id
  LIMIT 8
), a0 AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c0.cluster,
           row_number() OVER (PARTITION BY v.vec_id
               ORDER BY list_distance(v.vec, c0.centroid), c0.cluster) AS rn
    FROM v CROSS JOIN c0)
  WHERE rn = 1
), c1 AS (
  SELECT cluster, list(m ORDER BY i) AS centroid FROM (
    SELECT a0.cluster, t.i, round(avg(v.vec[t.i]), 6) AS m
    FROM a0 JOIN v USING (vec_id) CROSS JOIN (SELECT range + 1 AS i FROM range(64)) t
    GROUP BY a0.cluster, t.i)
  GROUP BY cluster
), a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c1.cluster,
           row_number() OVER (PARTITION BY v.vec_id
               ORDER BY list_distance(v.vec, c1.centroid), c1.cluster) AS rn
    FROM v CROSS JOIN c1)
  WHERE rn = 1
)
"""


@register(
    "embedding_kmeans_assign",
    oracle=_KMEANS_CTE
    + """
SELECT vec_id, cluster, count(*) OVER (PARTITION BY cluster) AS cluster_size
FROM a1
""",
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E3: distributed Lloyd's k-means over the embedding corpus (k=8,
    2 fixed rounds, hash-seeded init). Driver holds only the k x d centroid
    matrix; assignment is one BLAS matmul per Arrow batch; the update is a
    (cluster, dim) hash agg. Fixed iterations + 6-dp centroid rounding
    make the full iteration SQL-expressible - a hash-match oracle for an
    iterative algorithm."""
    from pyspark.sql.window import Window

    emb = _t(spark, sf_dir, "embeddings")
    out = clustering.kmeans(emb, 8, n_iter=2)
    return out.select(
        "vec_id",
        "cluster",
        F.count(F.lit(1)).over(Window.partitionBy("cluster")).alias("cluster_size"),
    )


@register(
    "semantic_neardup_pairs",
    oracle=_KMEANS_CTE
    + """
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
       round(list_cosine_similarity(av.vec, bv.vec), 6) AS cos_sim
FROM a1 a JOIN a1 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
JOIN v av ON av.vec_id = a.vec_id
JOIN v bv ON bv.vec_id = b.vec_id
WHERE round(list_cosine_similarity(av.vec, bv.vec), 6) >= 0.4
""",
)
def semantic_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (SemDeDup, arXiv:2303.09540): semantic near-dup pairs via
    cluster-then-compare - the equi-join on the k-means cluster bounds
    candidates to sum(|cluster|^2) instead of n^2 (choose k ~ sqrt(n) at
    scale); exact cosine verifies within the bucket. Recall vs the exact
    all-pairs baseline is bounded by clustering quality - pairs split
    across clusters are the SemDeDup trade."""
    emb = _t(spark, sf_dir, "embeddings")
    return clustering.semantic_neardup_pairs(emb, 0.4, k=8, n_iter=2)




@register(
    "image_netpbm_decode",
    oracle="""
WITH d AS (
  SELECT doc_id, (doc_id % 6) + 1 AS kind, (doc_id % 7) + 1 AS w,
         (doc_id % 5) + 1 AS h,
         CASE WHEN ((doc_id % 6) + 1) IN (5, 6) AND doc_id % 12 >= 6
              THEN 1023 ELSE 255 END AS mv,
         CASE WHEN ((doc_id % 6) + 1) IN (3, 6) THEN 3 ELSE 1 END AS ch
  FROM documents
), e AS (
  SELECT d.*, unnest(range(w * h * ch)) AS i FROM d
), v AS (
  SELECT doc_id, kind, w, h, mv, ch, i,
    CASE WHEN kind IN (1, 4) THEN 1 - (i % 2)
         ELSE (i * 7 + kind) % (mv + 1) END AS val
  FROM e
), agg AS (
  SELECT doc_id, kind, w, h, mv, ch,
    sum(CASE WHEN i % ch = 0 THEN val ELSE 0 END) AS s0,
    sum(CASE WHEN i % ch = 1 THEN val ELSE 0 END) AS s1,
    sum(CASE WHEN i % ch = 2 THEN val ELSE 0 END) AS s2
  FROM v GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT doc_id AS media_id, 'P' || kind AS magic,
  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  CAST(CASE WHEN kind IN (1, 4) THEN 1 ELSE mv END AS INT) AS maxval,
  CAST(ch AS INT) AS channels,
  CAST(s0 AS BIGINT) AS sum_r,
  CAST(CASE WHEN ch = 3 THEN s1 ELSE s0 END AS BIGINT) AS sum_g,
  CAST(CASE WHEN ch = 3 THEN s2 ELSE s0 END AS BIGINT) AS sum_b
FROM agg
""",
)
def image_netpbm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL pixel decode, r6): the Netpbm family — all six magics
    (plain/raw bitmap/graymap/pixmap) incl. 16-bit big-endian P5/P6,
    synthesized per doc from closed forms and fully decoded: the
    header grammar's real traps (comments BETWEEN header tokens, the
    exactly-one-whitespace raster separator, P4 MSB-first bit packing
    with row padding, PBM's 1-means-black inversion, maxval bounds)
    are all exercised. Channel sums are exact integers, so the oracle
    replays the sample algebra and hash-checks the encode→decode
    roundtrip bit-for-bit. mapInPandas, zero shuffle (the MPEG-row
    embarrassingly-parallel posture). See functions/netpbm.py +
    corrupt-stream fuzz in tests/test_netpbm.py."""
    from prom_etl_db_spark.functions import netpbm

    docs = _t(spark, sf_dir, "documents")
    return netpbm.netpbm_roundtrip_features(docs)


@register(
    "image_tiff_decode",
    oracle="""
WITH d AS (
  SELECT doc_id, (doc_id % 6) + 1 AS w, (doc_id % 4) + 2 AS h,
         doc_id % 3 AS photo,
         CASE WHEN doc_id % 3 = 2 THEN 3 ELSE 1 END AS spp
  FROM documents
), e AS (
  SELECT d.*, unnest(range(w * h * spp)) AS i FROM d
), v AS (
  SELECT doc_id, w, h, photo, spp, i,
    CASE WHEN photo = 0 THEN 255 - ((i * 11) % 256) ELSE (i * 11) % 256 END AS val
  FROM e
), p0 AS (
  SELECT doc_id, 0 AS page, w, h, spp,
    sum(CASE WHEN i % spp = 0 THEN val ELSE 0 END) AS s0,
    sum(CASE WHEN i % spp = 1 THEN val ELSE 0 END) AS s1,
    sum(CASE WHEN i % spp = 2 THEN val ELSE 0 END) AS s2
  FROM v GROUP BY 1, 2, 3, 4, 5
)
SELECT doc_id AS media_id, CAST(page AS INT) AS page,
  CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(spp AS INT) AS channels,
  CAST(s0 AS BIGINT) AS sum_r,
  CAST(CASE WHEN spp = 3 THEN s1 ELSE s0 END AS BIGINT) AS sum_g,
  CAST(CASE WHEN spp = 3 THEN s2 ELSE s0 END AS BIGINT) AS sum_b
FROM p0
UNION ALL
SELECT doc_id, 1, 2, 2, 3, 202, 246, 290 FROM documents
""",
)
def image_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (REAL pixel decode, r6): baseline TIFF — the archival
    DIRECTORY container (typed IFD catalog, value-or-offset slots,
    chained multi-page IFDs, strip tables), decoded from the TIFF 6.0
    spec in BOTH byte orders (id parity picks II/MM — the
    left-justified inline-value slot is the classic endian trap).
    Each document carries a two-page file: page 0 cycles photometric
    0/1/2 (WhiteIsZero inversion, grayscale, RGB with an out-of-line
    BitsPerSample array and two strips when height allows); page 1 is
    a constant 2×2 RGB whose sums pin the per-page sample phase.
    Non-baseline compression/tiles/planar-2 refuse loudly. Exact
    integer channel sums replay the roundtrip closed-form. See
    functions/tiff.py + fuzz gates in tests/test_tiff.py."""
    from prom_etl_db_spark.functions import tiff

    docs = _t(spark, sf_dir, "documents")
    return tiff.tiff_roundtrip_features(docs)
