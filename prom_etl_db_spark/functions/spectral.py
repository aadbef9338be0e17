"""Fixed-point spectrogram features over real PCM-16 WAV payloads.

The audio analogue of the text quality signals one step deeper than
`multimodal.audio_features`' whole-clip scalars: a framed short-time
DFT — the representation every speech/audio curation pipeline computes
before filtering, VAD, or dedup (reference scope: samzong/prom-etl-db
treats media as opaque payloads; this is the §2.E multimodal extension).

Why FIXED-POINT: the DFT is computed with integer twiddle factors
``round(cos(2πm/N)·2^15)`` — exactly how embedded/DSP FFTs (Q15
arithmetic) work — so every value in the pipeline (samples, window,
real/imag accumulators, bin power) is EXACT int64 arithmetic. That
makes the operator hash-verifiable end-to-end by a DuckDB oracle with
the same twiddle integers inlined as literals: no float summation-order
hazard anywhere (the `.00005 boundary` problem documented on
`multimodal.mpeg1_subband_features` simply cannot occur). Overflow
headroom is proven, not hoped: |x| ≤ 848, so |Σ x·c| ≤ 32·848·2^15 =
8.9e8 and power = re²+im² ≤ 1.6e18 < 2^63.

Scale posture: the per-clip work is embarrassingly parallel
(`mapInPandas` over a `balance`d input — no shuffle beyond the initial
spread); frame-level aggregation downstream is a hash agg keyed on
(media_id, frame), and the dominant-bin window partitions by that same
bounded key (≤ N_BINS rows per partition) — no global sort anywhere.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from prom_etl_db_spark.parallel import balance

N_FFT = 32          # DFT size (samples per frame)
HOP = 16            # 50 % frame overlap
N_BINS = N_FFT // 2 + 1
Q15 = 1 << 15       # twiddle fixed-point scale

# Q15 twiddle tables: round-half-even is irrelevant here (no cos/sin on
# this grid lands near a half-integer at 2^15 scale — pinned by a unit
# test) — what matters is that the ORACLE SQL inlines these exact
# integers, so both sides share one table by construction.
COS_Q15 = tuple(round(math.cos(2 * math.pi * m / N_FFT) * Q15) for m in range(N_FFT))
SIN_Q15 = tuple(round(math.sin(2 * math.pi * m / N_FFT) * Q15) for m in range(N_FFT))

TONE_AMP = 800      # fixture tone amplitude (Q15-scaled via the table)


def twiddle_values_sql() -> str:
    """The twiddle table as a SQL VALUES list ``(m, c, s)`` — inlined
    into oracle strings so DuckDB replays the DFT with byte-identical
    constants."""
    return ", ".join(
        f"({m}, {COS_Q15[m]}, {SIN_Q15[m]})" for m in range(N_FFT)
    )


def synth_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """A real, valid mono PCM-16 WAV carrying exactly ``samples``."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")             # PCM
        + (1).to_bytes(2, "little")             # channels
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")             # block align
        + (16).to_bytes(2, "little")            # bits/sample
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_pcm16(payload: bytes) -> np.ndarray:
    """Raw samples from a PCM-16 WAV: full RIFF chunk walk, LAST data
    chunk wins (the same multi-data-chunk stance as
    `multimodal.audio_features`). Malformed payloads raise ValueError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, data = 12, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if i + 8 + size > len(payload):
            raise ValueError("truncated RIFF chunk")
        if cid == b"data":
            data = payload[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)
    if data is None:
        raise ValueError("no data chunk")
    return np.frombuffer(data, dtype="<i2").astype(np.int64)


def fixture_samples(doc_id: int) -> np.ndarray:
    """Closed-form fixture signal for document ``doc_id``: a strong Q15
    cosine at bin ``k0 = 1 + doc_id % 15`` (so the dominant bin varies
    across the corpus) over small broadband residue, ``16·nf + 16``
    samples for ``nf = 2 + doc_id % 3`` overlapping frames. Pure
    integer closed form — the oracle recomputes it verbatim."""
    nf = 2 + doc_id % 3
    k0 = 1 + doc_id % 15
    n = np.arange(16 * nf + 16, dtype=np.int64)
    base = (doc_id + 5 * n) % 97 - 48
    # Python-// floor semantics == SQL floor(c*amp/32768.0): both floor
    tone = np.asarray(COS_Q15, dtype=np.int64)[(k0 * n) % N_FFT] * TONE_AMP // Q15
    return base + tone


def vad_fixture_samples(doc_id: int) -> np.ndarray:
    """Closed-form fixture for the VAD operator: the same tone/residue
    construction but LONGER (8–12 frames) and with the tone GATED off in
    every third 32-sample block, so clips alternate speech-like and
    silence-like regions and the activity flag genuinely splits. Exact
    integers; the oracle replays the gate verbatim."""
    nf = 8 + doc_id % 5
    k0 = 1 + doc_id % 15
    n = np.arange(16 * nf + 16, dtype=np.int64)
    base = (doc_id + 5 * n) % 97 - 48
    gate = ((doc_id + n // 32) % 3 != 0).astype(np.int64)
    tone = np.asarray(COS_Q15, dtype=np.int64)[(k0 * n) % N_FFT] * TONE_AMP // Q15
    return base + tone * gate


POWER_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame", IntegerType(), False),
        StructField("bin", IntegerType(), False),
        StructField("power_fp", LongType(), False),
    ]
)


def spectrogram_power(
    docs: DataFrame, id_col: str = "doc_id", synth=fixture_samples
) -> DataFrame:
    """Long-format fixed-point power spectrogram per document: encode
    the closed-form fixture into a REAL WAV, decode it back (RIFF walk),
    frame with 50 % overlap, and run the Q15 integer DFT — one row per
    (clip, frame, bin) with exact int64 power. The encode→decode→frame→
    DFT chain is what the hash verifies; the WAV roundtrip means a
    header-arithmetic or byte-order bug breaks every downstream value."""
    wc = np.asarray(COS_Q15, dtype=np.int64)
    ws = np.asarray(SIN_Q15, dtype=np.int64)
    k = np.arange(N_BINS, dtype=np.int64)[:, None]
    n = np.arange(N_FFT, dtype=np.int64)[None, :]
    w_re = wc[(k * n) % N_FFT]          # (N_BINS, N_FFT) int64
    w_im = -ws[(k * n) % N_FFT]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {c: [] for c in ("media_id", "frame", "bin", "power_fp")}
            for mid in pdf[id_col]:
                mid = int(mid)
                x = decode_pcm16(synth_wav_pcm16(synth(mid)))
                nf = (len(x) - N_FFT) // HOP + 1
                for f in range(nf):
                    win = x[f * HOP : f * HOP + N_FFT]
                    re = w_re @ win
                    im = w_im @ win
                    p = re * re + im * im
                    out["media_id"] += [mid] * N_BINS
                    out["frame"] += [f] * N_BINS
                    out["bin"] += list(range(N_BINS))
                    out["power_fp"] += [int(v) for v in p]
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="int64"),
                    "frame": pd.array(out["frame"], dtype="int32"),
                    "bin": pd.array(out["bin"], dtype="int32"),
                    "power_fp": pd.array(out["power_fp"], dtype="int64"),
                }
            )

    return balance(docs.select(id_col), id_col).mapInPandas(batches, POWER_SCHEMA)


def spectrogram_frame_features(
    docs: DataFrame, id_col: str = "doc_id", synth=fixture_samples
) -> DataFrame:
    """Frame-level descriptors on top of the power spectrogram, ONE
    JVM-side hash agg keyed on (media_id, frame): dominant non-DC bin
    via lexicographic struct-max (max power, then min bin — the
    deterministic tiebreak, with no window and no second DFT pass) and
    three octave-ish band energies + total as exact int64 conditional
    sums. This is the feature row a VAD / audio-quality filter
    consumes; the single-agg shape means the map-side partial combine
    collapses each clip's 17·nf rows before any shuffle."""
    p = spectrogram_power(docs, id_col, synth=synth)
    return p.groupBy("media_id", "frame").agg(
        (
            -F.max(
                F.when(
                    F.col("bin") >= 1,
                    F.struct(
                        F.col("power_fp").alias("p"),
                        (-F.col("bin")).alias("nb"),
                    ),
                )
            ).getField("nb")
        ).alias("dominant_bin"),
        F.sum(F.when(F.col("bin") <= 1, F.col("power_fp")).otherwise(F.lit(0))).alias("e_low"),
        F.sum(
            F.when((F.col("bin") >= 2) & (F.col("bin") <= 7), F.col("power_fp")).otherwise(F.lit(0))
        ).alias("e_mid"),
        F.sum(F.when(F.col("bin") >= 8, F.col("power_fp")).otherwise(F.lit(0))).alias("e_high"),
        F.sum("power_fp").alias("e_total"),
    )


VAD_THRESHOLD = 10**16  # between noise-frame (~4e14) and tone-frame
                        # (~1.8e17) total power — 17× margin both ways,
                        # and the comparison is exact-int so there is no
                        # boundary hazard even for half-tone edge frames


def vad_segments(
    docs: DataFrame, id_col: str = "doc_id", threshold: int = VAD_THRESHOLD
) -> DataFrame:
    """Energy-threshold voice-activity segmentation — the step a speech
    curation pipeline runs to cut clips into utterances before ASR or
    dedup: frames whose total fixed-point spectral power clears the
    threshold are merged into maximal runs of consecutive frames
    (gaps-and-islands over the frame index). All windows partition by
    media_id (≤ 12 frames per clip by construction — never a global
    sort); the segment rollup is one hash agg."""
    from pyspark.sql import Window

    f = spectrogram_frame_features(docs, id_col, synth=vad_fixture_samples)
    active = f.where(F.col("e_total") >= F.lit(threshold))
    w = Window.partitionBy("media_id").orderBy("frame")
    brk = F.when(
        F.col("frame") != F.lag("frame").over(w) + F.lit(1), F.lit(1)
    ).otherwise(F.lit(0))
    seg = active.withColumn(
        "segment",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return seg.groupBy("media_id", "segment").agg(
        F.min("frame").alias("start_frame"),
        F.max("frame").alias("end_frame"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("e_total").alias("seg_energy"),
    )


def fingerprint_neardup_pairs(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Spectral-fingerprint audio dedup (the chromaprint/echoprint
    family's core move): a clip's fingerprint is its per-frame
    dominant-bin SEQUENCE — robust to amplitude scaling and broadband
    noise because only the argmax bin per frame survives — and clips
    with identical fingerprints pair up through an equi-join on the
    fingerprint string (ids+fingerprints only in the shuffle, output
    bounded by true duplicate volume; the exact-dedup posture, never
    all-pairs). Frame order is pinned with sort_array over (frame, bin)
    structs — no window, no collect_list ordering assumption."""
    f = spectrogram_frame_features(docs, id_col)
    fp = f.groupBy("media_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("frame"), F.col("dominant_bin")))
                ),
                lambda s: s.getField("dominant_bin").cast("string"),
            ),
            ",",
        ).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_frames"),
    )
    a = fp.select(
        F.col("media_id").alias("id_a"),
        "fingerprint",
        F.col("n_frames").alias("nf_a"),
    )
    b = fp.select(
        F.col("media_id").alias("id_b"),
        "fingerprint",
        F.col("n_frames").alias("nf_b"),
    )
    return (
        a.join(b, "fingerprint")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fingerprint", F.col("nf_a").alias("n_frames"))
    )


def resample_q15(x: np.ndarray, fs_in: int, fs_out: int) -> np.ndarray:
    """Sample-rate conversion by Q15 fixed-point LINEAR interpolation —
    the arithmetic an embedded resampler uses, chosen here (over
    windowed-sinc) because every step is exact integer math the oracle
    can replay: for output index j, the source position is the exact
    rational j·fs_in/fs_out, split into k = floor and a Q15 fraction;
    out[j] = x[k] + floor((x[k+1]−x[k])·frac / 2^15). Output length
    floor(n·fs_out/fs_in); positions at/after the last sample clamp."""
    n = len(x)
    n_out = n * fs_out // fs_in
    j = np.arange(n_out, dtype=np.int64)
    num = j * fs_in
    k = num // fs_out
    frac = (num % fs_out) * Q15 // fs_out
    k1 = np.minimum(k + 1, n - 1)
    xk = x[np.minimum(k, n - 1)]
    return xk + (x[k1] - xk) * frac // Q15


RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_in", IntegerType(), False),
        StructField("n_out", IntegerType(), False),
        StructField("out_sum", LongType(), False),
        StructField("out_min", LongType(), False),
        StructField("out_max", LongType(), False),
        StructField("out_wsum", LongType(), False),
    ]
)


def resample_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    fs_in: int = 8000,
    fs_out: int = 11025,
) -> DataFrame:
    """Per clip: encode the closed-form signal into a REAL WAV, decode,
    resample fs_in→fs_out in Q15, and emit exact-int stats including a
    position-weighted sum (pins output ORDER, not just its multiset)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {c: [] for c in (
                "media_id", "n_in", "n_out", "out_sum",
                "out_min", "out_max", "out_wsum")}
            for mid in pdf[id_col]:
                mid = int(mid)
                n_in = 40 + mid % 50
                n = np.arange(n_in, dtype=np.int64)
                sig = (mid * 3 + 11 * n) % 512 - 256
                x = decode_pcm16(synth_wav_pcm16(sig, sample_rate=fs_in))
                y = resample_q15(x, fs_in, fs_out)
                out["media_id"].append(mid)
                out["n_in"].append(n_in)
                out["n_out"].append(len(y))
                out["out_sum"].append(int(y.sum()))
                out["out_min"].append(int(y.min()))
                out["out_max"].append(int(y.max()))
                out["out_wsum"].append(
                    int((y * np.arange(1, len(y) + 1, dtype=np.int64)).sum())
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="int64"),
                    "n_in": pd.array(out["n_in"], dtype="int32"),
                    "n_out": pd.array(out["n_out"], dtype="int32"),
                    "out_sum": pd.array(out["out_sum"], dtype="int64"),
                    "out_min": pd.array(out["out_min"], dtype="int64"),
                    "out_max": pd.array(out["out_max"], dtype="int64"),
                    "out_wsum": pd.array(out["out_wsum"], dtype="int64"),
                }
            )

    return balance(docs.select(id_col), id_col).mapInPandas(
        batches, RESAMPLE_SCHEMA
    )


def speech_segments_with_descriptors(
    docs: DataFrame, id_col: str = "doc_id", threshold: int = VAD_THRESHOLD
) -> DataFrame:
    """The composed speech front-end: VAD islands + per-segment spectral
    descriptors in ONE pass over the frame features (the segment rollup
    and the peak-frame dominant bin share a single hash agg via
    lexicographic struct-max — no join back, no second DFT). Output per
    (clip, segment): frame span, length, total energy, and the dominant
    bin of the segment's PEAK frame — the (when, what pitch) row an ASR
    router consumes."""
    from pyspark.sql import Window

    f = spectrogram_frame_features(docs, id_col, synth=vad_fixture_samples)
    active = f.where(F.col("e_total") >= F.lit(threshold))
    w = Window.partitionBy("media_id").orderBy("frame")
    brk = F.when(
        F.col("frame") != F.lag("frame").over(w) + F.lit(1), F.lit(1)
    ).otherwise(F.lit(0))
    seg = active.withColumn(
        "segment",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return seg.groupBy("media_id", "segment").agg(
        F.min("frame").alias("start_frame"),
        F.max("frame").alias("end_frame"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("e_total").alias("seg_energy"),
        (
            -F.max(
                F.struct(
                    F.col("e_total").alias("e"),
                    (-F.col("dominant_bin")).alias("nb"),
                )
            ).getField("nb")
        ).alias("peak_dominant_bin"),
    )
