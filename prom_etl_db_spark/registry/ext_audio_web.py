"""SURVEY.md §2.E — Q15 spectrogram/VAD/resample + speech flagship,
LTTB, HTML extraction, Gorilla compression, PromQL calendar family,
RRF hybrid retrieval, URL canonicalization, mojibake/accents/entropy,
Jaro-Winkler linkage, image rotate/flip.
Contiguous split of the former extensions.py (round 6, pure mechanics
— registration order unchanged)."""

from __future__ import annotations

from datetime import datetime, timedelta  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from prom_etl_db_spark import store  # noqa: F401
from prom_etl_db_spark.functions import (  # noqa: F401
    clustering,
    decontam,
    dedup,
    multimodal,
    sampling,
    similarity,
    spectral,
    text,
)
from prom_etl_db_spark.functions import gorilla, linkage, urlnorm  # noqa: F401
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


# =========================================================================
# Round-5 continuation: fixed-point spectrogram (Q15 integer DFT).
# =========================================================================

# Shared oracle CTE builder for the spectrogram family: twiddle
# integers are INLINED from the same Python table the Spark side uses
# (one table by construction), so the whole pipeline — closed-form
# signal, framing, Q15 DFT, bin power — is exact int64 arithmetic on
# both sides. ``nf_sql``/``gate_sql``/``max_n``/``max_f`` parameterize
# the fixture shape (the VAD query uses a longer, tone-gated signal).


def _spectro_ctes(nf_sql: str, gate_sql: str, max_n: int, max_f: int) -> str:
    return f"""
WITH tw(m, c, s) AS (VALUES {spectral.twiddle_values_sql()}),
d AS (
  SELECT doc_id, {nf_sql} AS nf, 1 + doc_id % 15 AS k0
  FROM documents
),
samp AS (
  SELECT d.doc_id, i.range AS n,
         ((d.doc_id + 5 * i.range) % 97) - 48
           + CAST(floor(tw.c * {spectral.TONE_AMP} / 32768.0) AS BIGINT)
             * ({gate_sql}) AS x
  FROM d CROSS JOIN range({max_n}) i
  JOIN tw ON tw.m = (d.k0 * i.range) % 32
  WHERE i.range < 16 * d.nf + 16
),
fr AS (
  SELECT doc_id, f.range AS f FROM d CROSS JOIN range({max_f}) f
  WHERE f.range < d.nf
),
dft AS (
  SELECT fr.doc_id, fr.f, k.range AS k,
         sum(sa.x * t.c) AS xre, sum(sa.x * t.s) AS xim
  FROM fr
  JOIN samp sa ON sa.doc_id = fr.doc_id
   AND sa.n >= fr.f * 16 AND sa.n < fr.f * 16 + 32
  CROSS JOIN range(17) k
  JOIN tw t ON t.m = (k.range * (sa.n - fr.f * 16)) % 32
  GROUP BY fr.doc_id, fr.f, k.range
),
dftp AS (
  SELECT doc_id, f, k, xre * xre + xim * xim AS pw FROM dft
)
"""


_SPECTRO_CTES = _spectro_ctes("2 + doc_id % 3", "1", 80, 4)


@register(
    "audio_spectrogram_power",
    oracle=_SPECTRO_CTES
    + """
SELECT doc_id AS media_id, CAST(f AS INT) AS frame, CAST(k AS INT) AS bin,
       CAST(pw AS BIGINT) AS power_fp
FROM dftp
""",
)
def audio_spectrogram_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, short-time spectrogram (r5): per document a REAL
    PCM-16 WAV of a closed-form signal (strong cosine at bin
    1 + doc_id%15 over broadband residue) is written, decoded back
    (full RIFF walk), framed at 50 % overlap, and pushed through a
    Q15 FIXED-POINT 32-point DFT — integer twiddles round(cos·2^15),
    exactly the arithmetic embedded DSP FFTs use — yielding one exact
    int64 power per (clip, frame, bin). The oracle replays the whole
    chain with the SAME twiddle integers inlined as SQL literals, so
    the driver hash is bit-exact with zero float-summation hazard (the
    documented `.00005` boundary problem of float-sum oracles cannot
    occur). Reference scope: §2.E multimodal extension (the reference
    treats media as opaque payloads)."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.spectrogram_power(docs)


@register(
    "audio_spectrogram_frames",
    oracle=_SPECTRO_CTES
    + """
SELECT doc_id AS media_id, CAST(f AS INT) AS frame,
       CAST(31 - (max(CASE WHEN k >= 1 THEN pw * 32 + (31 - k) END) % 32)
            AS INT) AS dominant_bin,
       CAST(sum(CASE WHEN k <= 1 THEN pw ELSE 0 END) AS BIGINT) AS e_low,
       CAST(sum(CASE WHEN k >= 2 AND k <= 7 THEN pw ELSE 0 END)
            AS BIGINT) AS e_mid,
       CAST(sum(CASE WHEN k >= 8 THEN pw ELSE 0 END) AS BIGINT) AS e_high,
       CAST(sum(pw) AS BIGINT) AS e_total
FROM dftp GROUP BY doc_id, f
""",
)
def audio_spectrogram_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, frame-level spectral descriptors (r5): dominant
    non-DC bin + three band energies + total per (clip, frame), the
    row a VAD / audio-quality filter consumes. Spark computes it as
    ONE hash agg over the spectrogram (struct-max for the
    deterministic max-power-then-lowest-bin tiebreak — no window, no
    second DFT pass); the oracle encodes the same tiebreak as a
    lexicographic pack (pw·32 + (31−k), hugeint-safe in DuckDB). All
    values exact int64 — the dominant bin over the fixture recovers
    each clip's planted tone, so the hash also pins the DFT's
    frequency axis, not just its algebra."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.spectrogram_frame_features(docs)


@register(
    "audio_vad_segments",
    oracle=_spectro_ctes(
        "8 + doc_id % 5",
        "CASE WHEN (d.doc_id + i.range // 32) % 3 = 0 THEN 0 ELSE 1 END",
        208,
        12,
    )
    + f"""
, ftot AS (
  SELECT doc_id, f, sum(pw) AS e_total FROM dftp GROUP BY doc_id, f
), act AS (
  SELECT doc_id, f,
         CASE WHEN f != lag(f) OVER w + 1 THEN 1 ELSE 0 END AS brk,
         e_total
  FROM ftot WHERE e_total >= {spectral.VAD_THRESHOLD}
  WINDOW w AS (PARTITION BY doc_id ORDER BY f)
), seg AS (
  SELECT doc_id, f, e_total,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY f
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segment
  FROM act
)
SELECT doc_id AS media_id, CAST(segment AS BIGINT) AS segment,
       CAST(min(f) AS INT) AS start_frame,
       CAST(max(f) AS INT) AS end_frame,
       count(*) AS n_frames,
       CAST(sum(e_total) AS BIGINT) AS seg_energy
FROM seg GROUP BY doc_id, segment
""",
)
def audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, voice-activity segmentation (r5): the utterance-cutting
    step of a speech curation pipeline, composed ON TOP of the Q15
    spectrogram — per clip (a longer fixture whose planted tone is
    GATED off in every third 32-sample block, so activity genuinely
    alternates), frames clearing a total-power threshold are merged
    into maximal consecutive runs (gaps-and-islands, windows
    partitioned by the bounded media_id key). Because frame power is
    exact int64, the threshold comparison has NO float boundary — the
    oracle replays fixture, DFT, threshold, and island-merge verbatim
    and the hash pins segment boundaries, lengths, and energies."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.vad_segments(docs)


@register(
    "metrics_lttb_downsample",
    oracle="""
WITH RECURSIVE pts AS (
  SELECT event_type AS s,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 1000 AS DOUBLE) AS x,
         floor(value + 0.5) AS v
  FROM events
), ib AS (
  SELECT s, i, x, v, (i - 2) * 18 // (n - 2) AS b FROM pts
  WHERE i >= 2 AND i <= n - 1
), cand AS (
  SELECT s, b, list(struct_pack(x := x, v := v) ORDER BY i) AS cpts
  FROM ib GROUP BY s, b
), avgs AS (
  SELECT s, b, avg(x) AS cx, avg(v) AS cy FROM ib GROUP BY s, b
), lastp AS (
  SELECT s, x, v FROM pts WHERE i = n
), firstp AS (
  SELECT s, x, v FROM pts WHERE i = 1
), nxt AS (
  SELECT c.s, c.b, c.cpts,
         coalesce(a.cx, l.x) AS cx, coalesce(a.cy, l.v) AS cy
  FROM cand c
  LEFT JOIN avgs a ON a.s = c.s AND a.b = c.b + 1
  JOIN lastp l ON l.s = c.s
), rec AS (
  SELECT s, CAST(-1 AS BIGINT) AS b, x AS ax, v AS ay FROM firstp
  UNION ALL
  SELECT n.s, n.b,
    list_max([{'a': abs((r.ax - n.cx) * (p.v - r.ay) - (r.ax - p.x) * (n.cy - r.ay)),
               'nx': -p.x, 'x': p.x, 'v': p.v} for p in n.cpts]).x AS ax,
    list_max([{'a': abs((r.ax - n.cx) * (p.v - r.ay) - (r.ax - p.x) * (n.cy - r.ay)),
               'nx': -p.x, 'x': p.x, 'v': p.v} for p in n.cpts]).v AS ay
  FROM rec r JOIN nxt n ON n.s = r.s AND n.b = r.b + 1
)
SELECT s AS series, CAST(b + 1 AS INT) AS pos,
       CAST(ax AS BIGINT) AS x_ms, CAST(ay AS BIGINT) AS v
FROM rec
UNION ALL
SELECT s AS series, 19 AS pos, CAST(x AS BIGINT) AS x_ms, CAST(v AS BIGINT) AS v
FROM lastp
""",
)
def metrics_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-ext, LTTB downsampling (Steinarsson 2013 — r5): the
    dashboard-rendering downsampler (Grafana's default for big series)
    over the events fixture, 20 points per event_type series. The
    sequential select-chain (bucket i's pick anchors bucket i+1's
    triangle) runs per-series in applyInPandas — parallel across
    series, the real cardinality axis; the oracle replays the chain
    with a recursive CTE whose per-step argmax is a list-comprehension
    lexicographic max (area, then earliest x). Determinism is BY
    CONSTRUCTION: integer-ms x rebased to 2024-01-01 and floor(v+0.5)
    integer values make every centroid sum exact in float64 and every
    triangle area a fixed expression tree over bit-identical operands
    — so Spark and DuckDB provably make the same choices (verified
    0 mismatches), with no float-boundary hazard in the hash. Note on
    ORACLE cost (not operator cost): DuckDB recursion re-scans per
    step, so the replay is O(chain²) and is practical at the gate's
    sf0.01 (~2k steps/series) but slow at sf0.1 — the OPERATOR itself
    is linear (scale-probed 0.18 of linear at 10×)."""
    ev = _t(spark, sf_dir, "events")
    return analytics.lttb_downsample(ev)


# HTML-extraction fixture: ONE template, injected into both the Spark
# builder and the oracle SQL (escaped), so the page both engines clean
# is byte-identical. Strata exercise every pass: script with internal
# '<' and quotes, style with braces, comment hiding tags, block tags,
# attribute-heavy inline tags, self-closing br, the whole entity set,
# and double-encoding (&amp;lt; must yield literal '&lt;').
_HTML_PREFIX = (
    '<html><head><title>T</title><style>p { color: red; }</style>'
    '<script type="text/javascript">if (a<b) { alert("x&y"); }</script>'
    "</head><body><!-- hidden <b>comment</b> -->"
    "<h1>Title &amp; More</h1><p class=\"lead\">"
)
_HTML_SUFFIX = (
    "</p><div>Tom &amp; Jerry &lt;3 &quot;quoted&quot; &#39;s&nbsp;here"
    " and &amp;lt;kept&amp;gt;</div><ul><li>one</li>"
    '<li>two <a href="http://e.com?a=1&amp;b=2">link text</a></li></ul>'
    "<br/>tail words</body></html>"
)


def _sqlq(s: str) -> str:
    return s.replace("'", "''")


@register(
    "doc_html_extract",
    oracle=f"""
WITH page AS (
  SELECT doc_id,
         '{_sqlq(_HTML_PREFIX)}' || text || '{_sqlq(_HTML_SUFFIX)}' AS html
  FROM documents
), cleaned AS (
  SELECT doc_id, {text.html_extract_oracle_exprs()} AS clean_text
  FROM page
)
SELECT doc_id, clean_text,
       CAST(length(clean_text) AS INT) AS n_chars,
       CAST(length(clean_text)
            - length(replace(clean_text, chr(10), '')) + 1 AS INT) AS n_lines
FROM cleaned
""",
)
def doc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 text, HTML → text extraction (r5): the page-cleaning step C4/
    CCNet run on every crawled document before quality scoring — drop
    script/style/comment subtrees, block tags → line breaks, strip
    remaining tags, decode entities (&amp; last, so double-encoded
    text stays encoded), normalize whitespace. The ENTIRE pass is a
    chain of built-in regexp_replace/replace Columns (whole-stage
    codegen, zero Python, narrow no-shuffle plan); patterns are written
    in the RE2-compatible subset and the oracle replays them in DuckDB,
    so the driver hash over the full cleaned text cross-checks two
    independent regex engines (java.util.regex vs RE2) on the same
    stratified page."""
    docs = _t(spark, sf_dir, "documents")
    page = docs.select(
        "doc_id",
        F.concat(
            F.lit(_HTML_PREFIX), F.col("text"), F.lit(_HTML_SUFFIX)
        ).alias("html"),
    )
    return text.html_extract_text(page)


@register(
    "tsdb_gorilla_compress",
    oracle="""
WITH RECURSIVE pts AS (
  SELECT event_type AS s,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS i,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 1000000 AS t,
         CAST(floor(value + 0.5) AS BIGINT) AS v
  FROM events
), d AS (
  SELECT s, i, t, v,
         t - lag(t) OVER w AS delta,
         lag(v) OVER w AS pv
  FROM pts WINDOW w AS (PARTITION BY s ORDER BY i)
), dd AS (
  SELECT s, i, v, pv,
         delta - coalesce(lag(delta) OVER (PARTITION BY s ORDER BY i), 0) AS dod,
         CASE WHEN i = 0 THEN NULL ELSE xor(v, pv) END AS x
  FROM d
), tsb AS (
  SELECT s, i, v,
         CASE WHEN i = 0 THEN 64
              WHEN dod = 0 THEN 1
              WHEN dod BETWEEN -63 AND 64 THEN 9
              WHEN dod BETWEEN -255 AND 256 THEN 12
              WHEN dod BETWEEN -2047 AND 2048 THEN 16
              ELSE 36 END AS ts_bits,
         x,
         CASE WHEN x IS NULL OR x = 0 THEN NULL
              WHEN x > 0 THEN 64 - length(bin(x)) ELSE 0 END AS lz,
         CASE WHEN x IS NULL OR x = 0 THEN NULL
              ELSE length(bin(x)) - length(rtrim(bin(x), '0')) END AS tz
  FROM dd
), rec AS (
  SELECT s, CAST(0 AS BIGINT) AS i, 99 AS s_lead, 99 AS s_trail,
         CAST(64 AS BIGINT) AS vbits
  FROM tsb WHERE i = 0
  UNION ALL
  SELECT st.s, st.i,
    CASE WHEN st.x = 0 OR (st.lz >= r.s_lead AND st.tz >= r.s_trail)
         THEN r.s_lead ELSE least(st.lz, 31) END,
    CASE WHEN st.x = 0 OR (st.lz >= r.s_lead AND st.tz >= r.s_trail)
         THEN r.s_trail ELSE st.tz END,
    CAST(CASE WHEN st.x = 0 THEN 1
         WHEN st.lz >= r.s_lead AND st.tz >= r.s_trail
         THEN 2 + (64 - r.s_lead - r.s_trail)
         ELSE 13 + (64 - least(st.lz, 31) - st.tz) END AS BIGINT)
  FROM rec r JOIN tsb st ON st.s = r.s AND st.i = r.i + 1
)
SELECT t.s AS series, CAST(t.i // 64 AS INT) AS block,
       count(*) AS n_samples,
       CAST(sum(t.ts_bits) AS BIGINT) AS ts_bits,
       CAST(sum(r.vbits) AS BIGINT) AS val_bits,
       CAST(count(*) FILTER (t.x = 0) AS BIGINT) AS n_xor_zero,
       CAST(sum(t.v) AS BIGINT) AS v_sum,
       CAST(min(t.v) AS BIGINT) AS v_min,
       CAST(max(t.v) AS BIGINT) AS v_max
FROM tsb t JOIN rec r ON r.s = t.s AND r.i = t.i
GROUP BY t.s, t.i // 64
""",
)
def tsdb_gorilla_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-extended storage posture, Gorilla TSDB compression (Pelkonen
    et al., VLDB 2015 — r5): the delta-of-delta + XOR bitstream
    encoding Prometheus's TSDB descends from (the reference delegates
    storage efficiency to Prometheus; here it is a first-class
    verifiable operator). Spark encodes each event_type series into a
    REAL bitstream, decodes it back, asserts bit-exact roundtrip, and
    emits per-64-sample-block stats: exact ts/value bit costs,
    xor-zero runs, and decoded-value sum/min/max (== originals by the
    asserted losslessness, the FLAC pattern). The oracle replays the
    dod bucket table with two window lags and the XOR control-window
    chain with a recursive CTE (leading/trailing zeros via exact
    bin()-string arithmetic — no float log2), so the driver hash pins
    every branch of the encoder's cost model plus the decode path."""
    ev = _t(spark, sf_dir, "events")
    return gorilla.gorilla_compress_features(ev)


@register(
    "promql_time_components",
    oracle="""
WITH s AS (
  SELECT event_id,
         epoch_us(ts) // 1000000 AS v,
         make_timestamp((epoch_us(ts) // 1000000) * 1000000) AS t,
         value, event_type
  FROM events
)
SELECT event_id,
       CAST(CASE event_id % 3 WHEN 0 THEN sign(-value)
            WHEN 1 THEN 0.0 ELSE sign(value) END AS DOUBLE) + 0.0 AS sgn,
       CAST(year(t) AS INT) AS year,
       CAST(month(t) AS INT) AS month,
       CAST(day(t) AS INT) AS day_of_month,
       CAST(dayofweek(t) % 7 AS INT) AS day_of_week,
       CAST(dayofyear(t) AS INT) AS day_of_year,
       CAST(day(last_day(t)) AS INT) AS days_in_month,
       CAST(hour(t) AS INT) AS hour,
       CAST(minute(t) AS INT) AS minute
FROM s
""",
)
def promql_time_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-extended, PromQL calendar + sign family (r5): `year month
    day_of_month day_of_week day_of_year days_in_month hour minute`
    (Prometheus functions.md) computed TIMEZONE-FREE via Hinnant's
    civil-from-days integer algorithm in pure Columns — session-TZ
    `F.year()` would silently shift under the vanilla driver session —
    plus `sgn` over a three-way stratum so all of {-1, 0, 1} appear.
    The oracle extracts components with DuckDB's own calendar library:
    two independent proleptic-Gregorian implementations, one hash
    (validated on 3005 random epochs through year ~2096 under a
    hostile session timezone)."""
    ev = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ: unix_micros() rejects it and a cast through
    # TIMESTAMP would read the session zone. date + h/m/s extraction is
    # TZ-free on NTZ, so the epoch reconstruction is deterministic.
    t = F.col("ts")
    v = (
        F.datediff(t.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + F.hour(t).cast("long") * 3600
        + F.minute(t).cast("long") * 60
        + F.second(t).cast("long")
    )
    comps = promql.time_component_columns(v)
    # + 0.0 flushes IEEE -0.0 (signum(-0.0) = -0.0; sf0.1 has a literal
    # zero value) to +0.0 — the README canon-safety rule
    sgn = (
        F.when(F.col("event_id") % 3 == 0, F.signum(-F.col("value")))
        .when(F.col("event_id") % 3 == 1, F.lit(0.0))
        .otherwise(F.signum(F.col("value")))
        .cast("double")
        + F.lit(0.0)
    )
    return ev.select(
        "event_id",
        sgn.alias("sgn"),
        *[c.alias(k) for k, c in comps.items()],
    )


@register(
    "hybrid_rrf_search",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS dl,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM tok WHERE term IN ('spark', 'query', 'stream') GROUP BY 1, 2, 3
), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT count(*) AS n,
         avg(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\s+')) END) AS avgdl
  FROM documents
), bm25 AS (
  SELECT tf.doc_id,
         round(sum(
           ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl))
         ), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats GROUP BY tf.doc_id
), lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rank
  FROM bm25 ORDER BY score DESC, doc_id ASC LIMIT 50
), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT c.vec_id AS doc_id,
         list_sum([qv[i]::DOUBLE * c.embedding[i]::DOUBLE
                   for i in range(1, len(qv)+1)])
           / (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
                             for i in range(1, len(qv)+1)]))
              * sqrt(list_sum([c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE
                               for i in range(1, len(c.embedding)+1)])))
           AS sim
  FROM embeddings c, q WHERE c.vec_id != 0
), dense AS (
  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS dense_rank
  FROM scored ORDER BY sim DESC, doc_id ASC LIMIT 50
), fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         CAST(l.lex_rank AS BIGINT) AS lex_rank,
         CAST(d.dense_rank AS BIGINT) AS dense_rank,
         coalesce(1.0 / (60 + l.lex_rank), 0.0)
           + coalesce(1.0 / (60 + d.dense_rank), 0.0) AS raw
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rank, dense_rank, round(raw, 6) AS rrf_score,
       CAST(row_number() OVER (ORDER BY raw DESC, doc_id ASC) AS BIGINT)
         AS fused_rank
FROM fused ORDER BY raw DESC, doc_id ASC LIMIT 20
""",
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/E5 hybrid retrieval, Reciprocal-Rank Fusion (Cormack et al.
    SIGIR 2009 — r5): the standard lexical+dense combiner every hybrid
    search stack ships — BM25 over documents (query terms 'spark query
    stream', depth 50) fused with exact cosine ANN over embeddings
    (query = vector 0, depth 50) by Σ 1/(60+rank), top-20. Ranks are
    INTEGERS, so the fusion arithmetic is float-hazard-free; the
    lexical ranking orders by the ROUNDED BM25 score (the hash-stable
    quantity bm25_query_scores already pins) with id tiebreaks. Both
    retriever depths are orderBy().limit() partial top-ks feeding
    bounded ≤50-row windows — never a global single-partition sort."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex_scores = text.bm25_scores(docs, ["spark", "query", "stream"])
    lex_top = lex_scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(50)
    wl = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = lex_top.withColumn("lex_rank", F.row_number().over(wl)).select(
        "doc_id", "lex_rank"
    )
    dense = (
        similarity.cosine_topk_bruteforce(
            emb, emb.where(F.col("vec_id") == 0), k=50
        )
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("dense_rank"))
    )
    return similarity.rrf_fuse(
        [lex, dense], rank_cols=["lex_rank", "dense_rank"]
    )


@register(
    "url_canonicalize",
    oracle="""
SELECT doc_id,
  CASE doc_id % 7
    WHEN 0 THEN 'http://example.com/a/s' || doc_id || '?a=1&b=2'
    WHEN 1 THEN 'https://www.test.org/d' || doc_id
    WHEN 2 THEN 'http://host' || doc_id || '.example/?x=' || doc_id
    WHEN 3 THEN 'http://h/p%2FqA/' || doc_id
    WHEN 4 THEN 'http://h' || doc_id || ':8080/k?x=' || doc_id || '&y=2&z=1'
    WHEN 5 THEN 'http://u@h' || doc_id || '.com/x' || doc_id
    ELSE 'http://ok.example/p' || doc_id || '?a=1'
  END AS canonical_url,
  CASE doc_id % 7
    WHEN 0 THEN 'example.com'
    WHEN 1 THEN 'www.test.org'
    WHEN 2 THEN 'host' || doc_id || '.example'
    WHEN 3 THEN 'h'
    WHEN 4 THEN 'h' || doc_id
    WHEN 5 THEN 'h' || doc_id || '.com'
    ELSE 'ok.example'
  END AS host,
  doc_id % 7 != 6 AS changed
FROM documents
""",
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 web curation, RFC 3986 URL canonicalization (r5): the
    normalization URL-level dedup runs before any content hashing —
    case folding, unreserved percent-decoding (+ hex uppercasing of
    preserved triplets), §5.2.4 dot-segment removal AFTER percent
    normalization (so %2E%2E is a real '..'), default-port and
    fragment dropping, stable query-param sort (documented non-RFC
    extra). Seven in-query strata exercise each rule — including an
    already-canonical stratum so `changed` splits both ways — and the
    oracle states each stratum's canonical form as a closed form of
    doc_id (the multimodal expected-value pattern; DuckDB has no URL
    library to serve as a second implementation). The Spark side is
    the GENERAL normalizer (functions/urlnorm.py), not stratum-driven
    — unit tests pin it on RFC examples the fixture never touches."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    variants = F.array(
        F.concat(F.lit("HTTP://Example.COM:80/a/./b/../s"), d, F.lit("?b=2&a=1#frag")),
        F.concat(F.lit("https://WWW.Test.ORG:443/%7Euser/%2e%2e/d"), d),
        F.concat(F.lit("http://Host"), d, F.lit(".example?x="), d),
        F.concat(F.lit("http://h/p%2fq%41/"), d),
        F.concat(F.lit("http://h"), d, F.lit(":8080/k?z=1&y=2&x="), d),
        F.concat(F.lit("http://u@H"), d, F.lit(".com:80/../x"), d),
        F.concat(F.lit("http://ok.example/p"), d, F.lit("?a=1")),
    )
    built = docs.select(
        "doc_id",
        F.element_at(variants, (F.col("doc_id") % 7 + 1).cast("int")).alias("url"),
    )
    return urlnorm.canonical_urls(built)


@register(
    "audio_fingerprint_neardup",
    oracle=_SPECTRO_CTES
    + """
, ftot AS (
  SELECT doc_id, f,
         31 - (max(CASE WHEN k >= 1 THEN pw * 32 + (31 - k) END) % 32) AS dom
  FROM dftp GROUP BY doc_id, f
), fp AS (
  SELECT doc_id,
         string_agg(CAST(dom AS VARCHAR), ',' ORDER BY f) AS fingerprint,
         count(*) AS n_frames
  FROM ftot GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fingerprint,
       a.n_frames
FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
""",
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/E2 audio dedup, spectral fingerprinting (r5): the
    chromaprint-family move — per-frame dominant-bin sequences as clip
    fingerprints, identical fingerprints equi-joined into dup pairs
    (amplitude- and noise-robust where byte hashing is not: every
    fixture clip has UNIQUE broadband residue, yet clips sharing the
    planted tone bin and frame count still pair — the join finds
    acoustic, not byte, duplicates). Composes the Q15 spectrogram, so
    the exact-int argmax chain keeps the oracle float-hazard-free;
    ids+fingerprints only in the shuffle, output bounded by true dup
    volume (the E1 exact-dedup posture)."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.fingerprint_neardup_pairs(docs)


# Mojibake fixture constants: REAL double-encodings produced by the
# encoding algebra itself (utf-8 bytes re-read as cp1252), not typed-in
# approximations — the oracle embeds the same literals, so both engines
# see byte-identical inputs and expected outputs.
_MOJI_CLEAN1 = "café é"
_MOJI1 = _MOJI_CLEAN1.encode("utf-8").decode("cp1252")
_MOJI_CLEAN2 = "déjà vu"
_MOJI2 = _MOJI_CLEAN2.encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")
_MOJI_BAIT = "x Ã x"  # marker present but NOT valid double-encoding


@register(
    "doc_mojibake_repair",
    oracle=f"""
SELECT doc_id,
  CASE doc_id % 4
    WHEN 0 THEN text || ' {_MOJI_CLEAN1}'
    WHEN 1 THEN text || ' {_MOJI_CLEAN2}'
    WHEN 2 THEN text || ' {_MOJI_BAIT}'
    ELSE text END AS text_fixed,
  doc_id % 4 IN (0, 1, 2) AS suspected,
  doc_id % 4 IN (0, 1) AS repaired,
  CAST(length(CASE doc_id % 4
    WHEN 0 THEN text || ' {_MOJI_CLEAN1}'
    WHEN 1 THEN text || ' {_MOJI_CLEAN2}'
    WHEN 2 THEN text || ' {_MOJI_BAIT}'
    ELSE text END) AS INT) AS n_chars_fixed
FROM documents
""",
)
def doc_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 web curation, mojibake repair (r5): the ftfy core move
    reimplemented from the encoding algebra — text whose cp1252
    re-encoding decodes as valid UTF-8 was double-encoded; repair and
    repeat (real crawls contain triple-encoded text). Four strata:
    single mojibake (cafÃ© class), DOUBLE mojibake (repaired in two
    passes), a marker-bait stratum ('Ã' present but NOT a valid double
    encoding — the repair must refuse), and untouched ASCII — so
    suspected and repaired each split both ways. Fixture mojibake is
    produced by the encoding functions themselves at import, never
    typed in; the oracle states the expected clean text as literals and
    the driver hash covers the FULL repaired text."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id") % 4
    built = docs.select(
        "doc_id",
        F.when(d == 0, F.concat(F.col("text"), F.lit(" " + _MOJI1)))
        .when(d == 1, F.concat(F.col("text"), F.lit(" " + _MOJI2)))
        .when(d == 2, F.concat(F.col("text"), F.lit(" " + _MOJI_BAIT)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return text.mojibake_features(built)


@register(
    "linkage_jaro_winkler_blocks",
    oracle="""
WITH names AS (
  SELECT doc_id,
         CASE doc_id % 10
           WHEN 0 THEN 'anderson' WHEN 1 THEN 'brooks'
           WHEN 2 THEN 'carter'   WHEN 3 THEN 'dawson'
           WHEN 4 THEN 'edwards'  WHEN 5 THEN 'foster'
           WHEN 6 THEN 'graham'   WHEN 7 THEN 'hughes'
           WHEN 8 THEN 'ingram'   ELSE 'jackson' END AS base,
         doc_id % 3 AS v
  FROM documents
), built AS (
  SELECT doc_id,
         CASE v
           WHEN 0 THEN base[1] || base[3] || base[2] || base[4:]
           WHEN 1 THEN base || 'son'
           ELSE base END AS name,
         base[1] AS block
  FROM names
), pairs AS (
  SELECT a.block, a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(round(jaro_winkler_similarity(a.name, b.name) * 1000000)
              AS BIGINT) AS jw_q6
  FROM built a JOIN built b ON a.block = b.block AND a.doc_id < b.doc_id
)
SELECT block, count(*) AS n_pairs,
       CAST(sum(CASE WHEN jw_q6 >= 900000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matches,
       CAST(sum(jw_q6) AS BIGINT) AS jw_mass_q6,
       CAST(max(jw_q6) AS BIGINT) AS jw_max_q6
FROM pairs GROUP BY block
""",
)
def linkage_jaro_winkler_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-ext record linkage (r5): blocking + Jaro-Winkler (Winkler
    1990, the census fuzzy-match) — ten surname classes with planted
    transposition and suffix typos, blocked by initial so the all-pairs
    explosion is contained to co-located blocks; per-pair scoring is an
    Arrow-batched pandas UDF of the FROM-SPEC implementation, and the
    oracle scores the same pairs with DuckDB's independent native
    jaro_winkler_similarity — two implementations, one hash (bit-equal
    on fuzz; the one convention divergence, both-empty = 0.0, is
    documented in functions/linkage.py). Float content reaches the
    hash only as the quantized-integer mass sum(round(jw*1e6)) — the
    repo's order-free term-quantization pattern."""
    docs = _t(spark, sf_dir, "documents")
    surnames = ["anderson", "brooks", "carter", "dawson", "edwards",
                "foster", "graham", "hughes", "ingram", "jackson"]
    base = F.element_at(
        F.array(*[F.lit(s) for s in surnames]),
        (F.col("doc_id") % 10 + 1).cast("int"),
    )
    v = F.col("doc_id") % 3
    # transposition typo: swap 2nd and 3rd characters
    swapped = F.concat(
        F.substring(base, 1, 1),
        F.substring(base, 3, 1),
        F.substring(base, 2, 1),
        F.substring(base, 4, 64),
    )
    name = (
        F.when(v == 0, swapped)
        .when(v == 1, F.concat(base, F.lit("son")))
        .otherwise(base)
    )
    built = docs.select(
        "doc_id",
        name.alias("name"),
        F.substring(base, 1, 1).alias("block"),
    )
    return linkage.blocked_jw_stats(built)


@register(
    "image_rotate_flip",
    oracle="""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y,
         d.doc_id % 16 + 1 AS w, d.doc_id % 8 + 1 AS h
  FROM documents d CROSS JOIN range(16) x CROSS JOIN range(8) y
  WHERE x.range < d.doc_id % 16 + 1 AND y.range < d.doc_id % 8 + 1
)
SELECT doc_id AS media_id,
  CAST(min(h) AS INT) AS rot_w, CAST(min(w) AS INT) AS rot_h,
  CAST(sum((x+1) * (h-y) * ((doc_id + 3*x + 5*y) % 256)) AS BIGINT)
    AS wsum_rot_r,
  CAST(sum((w-x) * (y+1) * ((doc_id*7 + x) % 256)) AS BIGINT)
    AS wsum_fliph_g,
  CAST(sum((x+1) * (h-y) * ((doc_id*13 + y) % 256)) AS BIGINT)
    AS wsum_flipv_b
FROM px GROUP BY doc_id
""",
)
def image_rotate_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 geometric augmentation (r5): rotate-90°-clockwise and both
    flips on REAL decoded BMP pixel arrays (np.rot90/np.flip — the
    augmentation primitives), verified through POSITION-WEIGHTED sums
    Σ(x'+1)(y'+1)·channel: the oracle substitutes each transform's
    coordinate algebra into the closed-form gradient (rot90cw weight =
    (x+1)(h−y) on the source grid, fliph = (w−x)(y+1), flipv =
    (x+1)(h−y) on B), so any off-by-one, wrong axis, or
    transpose-without-reverse breaks the hash where a channel MEAN
    would hide every one of them. Exact int64 throughout."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.image_transform_features(docs)


@register(
    "audio_resample_q15",
    oracle="""
WITH d AS (
  SELECT doc_id, 40 + doc_id % 50 AS n_in,
         (40 + doc_id % 50) * 11025 // 8000 AS n_out
  FROM documents
), o AS (
  SELECT d.doc_id, d.n_in, d.n_out, j.range AS j,
         (j.range * 8000) // 11025 AS k,
         ((j.range * 8000) % 11025) * 32768 // 11025 AS frac
  FROM d CROSS JOIN range(124) j
  WHERE j.range < d.n_out
), s AS (
  SELECT doc_id, n_in, n_out, j,
         (doc_id * 3 + 11 * least(k, n_in - 1)) % 512 - 256 AS xk,
         (doc_id * 3 + 11 * least(k + 1, n_in - 1)) % 512 - 256 AS xk1,
         frac
  FROM o
), y AS (
  SELECT doc_id, n_in, n_out, j,
         xk + CAST(floor((xk1 - xk) * frac / 32768.0) AS BIGINT) AS v
  FROM s
)
SELECT doc_id AS media_id,
       CAST(min(n_in) AS INT) AS n_in,
       CAST(min(n_out) AS INT) AS n_out,
       CAST(sum(v) AS BIGINT) AS out_sum,
       CAST(min(v) AS BIGINT) AS out_min,
       CAST(max(v) AS BIGINT) AS out_max,
       CAST(sum((j + 1) * v) AS BIGINT) AS out_wsum
FROM y GROUP BY doc_id
""",
)
def audio_resample_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 audio, sample-rate conversion (r5): the 8000→11025 Hz
    resample an ASR-prep pipeline runs, as Q15 fixed-point linear
    interpolation over a real WAV roundtrip — source position j·fs_in/
    fs_out split into exact floor + Q15 fraction, so every output
    sample is integer arithmetic the oracle replays verbatim
    (non-terminating rational ratio 320/441 exercises every fraction
    phase). The position-weighted sum pins output ORDER; min/max/sum
    pin the values. Exact int64 end-to-end."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.resample_features(docs)


@register(
    "doc_fold_accents",
    oracle="""
WITH built AS (
  SELECT doc_id,
         text || ' ' || CASE doc_id % 5
           WHEN 0 THEN 'Café Déjà Vu'
           WHEN 1 THEN 'NAÏVE Über Å'
           WHEN 2 THEN 'Kraków Gdańsk Łódź'
           WHEN 3 THEN 'Ωμέγα Σίγμα'
           ELSE 'plain ascii' END AS t
  FROM documents
)
SELECT doc_id,
       lower(strip_accents(t)) AS text_folded,
       lower(strip_accents(t)) != t AS changed,
       CAST(length(t) - length(lower(strip_accents(t))) AS INT) AS cp_delta
FROM built
""",
)
def doc_fold_accents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 search normalization, accent folding (r5): NFD-decompose,
    drop combining marks, lowercase — the index normalization that
    collides 'Café' with 'cafe' while PRESERVING non-accent letters
    (ł stays: stripping it is lossy transliteration, a different op).
    Five strata (French/German/Polish/Greek/ascii — the Polish one
    proves ł survives while ó folds, the Greek one that tonos strips
    under a non-Latin script; ascii keeps `changed` split). Spark runs
    stdlib unicodedata; DuckDB runs utf8proc strip_accents — two
    independent UCD implementations, one hash over the FULL folded
    text (the NFC-normalization pattern, verified on 11 candidate
    strata before fixture selection)."""
    docs = _t(spark, sf_dir, "documents")
    marker = F.element_at(
        F.array(
            F.lit("Café Déjà Vu"),
            F.lit("NAÏVE Über Å"),
            F.lit("Kraków Gdańsk Łódź"),
            F.lit("Ωμέγα Σίγμα"),
            F.lit("plain ascii"),
        ),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    built = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" "), marker).alias("text")
    )
    return text.accent_fold_features(built)


@register(
    "doc_char_entropy",
    oracle="""
WITH ch AS (
  SELECT doc_id, length(text) AS n, unnest(string_split(text, '')) AS c
  FROM documents WHERE trim(text) != ''
), runs AS (
  SELECT doc_id, n, c, count(*) AS cnt FROM ch GROUP BY doc_id, n, c
), agg AS (
  SELECT doc_id, CAST(min(n) AS INT) AS n_chars,
         CAST(count(*) AS INT) AS n_distinct,
         CAST(max(cnt) AS INT) AS max_run,
         CAST(sum(CAST(round(1000000 * (cnt / CAST(n AS DOUBLE))
                             * log2(n / CAST(cnt AS DOUBLE)), 0)
                  AS BIGINT)) AS BIGINT) AS entropy_q6
  FROM runs GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_chars, 0) AS n_chars,
       coalesce(a.n_distinct, 0) AS n_distinct,
       coalesce(a.max_run, 0) AS max_run,
       CAST(coalesce(a.entropy_q6, 0) AS BIGINT) AS entropy_q6
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
""",
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 quality, order-0 character entropy (r5): the classic text-vs-
    noise signal (boilerplate ≈ low bits/char, random bytes ≈ high,
    prose ≈ 4). Spark computes it ENTIRELY IN-ROW — sort the char
    array once and fold runs, banking a quantized term
    round(1e6·(c/n)·log2(n/c)) as each run closes — zero shuffle, the
    signal rides the scan at any corpus size; the oracle takes the
    orthodox explode+groupBy road. Quantized-term integer sums are
    order-free exact, so the only cross-engine float surface is a
    1-ulp log2 landing within 5e-7 of a rounding boundary (~1e-10 per
    term). Blank docs emit zeros on both sides."""
    docs = _t(spark, sf_dir, "documents")
    return text.char_entropy_features(docs)


@register(
    "speech_pipeline_v1",
    oracle=_spectro_ctes(
        "8 + doc_id % 5",
        "CASE WHEN (d.doc_id + i.range // 32) % 3 = 0 THEN 0 ELSE 1 END",
        208,
        12,
    )
    + f"""
, fr2 AS (
  SELECT doc_id, f, sum(pw) AS e_total,
         31 - (max(CASE WHEN k >= 1 THEN pw * 32 + (31 - k) END) % 32) AS dom
  FROM dftp GROUP BY doc_id, f
), act AS (
  SELECT doc_id, f, e_total, dom,
         CASE WHEN f != lag(f) OVER w + 1 THEN 1 ELSE 0 END AS brk
  FROM fr2 WHERE e_total >= {spectral.VAD_THRESHOLD}
  WINDOW w AS (PARTITION BY doc_id ORDER BY f)
), seg AS (
  SELECT doc_id, f, e_total, dom,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY f
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segment
  FROM act
)
SELECT doc_id AS media_id, CAST(segment AS BIGINT) AS segment,
       CAST(min(f) AS INT) AS start_frame,
       CAST(max(f) AS INT) AS end_frame,
       count(*) AS n_frames,
       CAST(sum(e_total) AS BIGINT) AS seg_energy,
       CAST(31 - (max(e_total * 32 + (31 - dom)) % 32) AS INT)
         AS peak_dominant_bin
FROM seg GROUP BY doc_id, segment
""",
)
def speech_pipeline_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 composed speech front-end (r5 flagship for the audio family,
    the curation_pipeline_v2 pattern): Q15 spectrogram → energy VAD
    islands → per-segment descriptors, with the segment rollup and the
    peak-frame dominant bin sharing ONE hash agg (lexicographic
    struct-max on (e_total, −bin) — no join-back, no second DFT pass).
    The oracle chains the whole pipeline: DFT CTEs, per-frame argmax,
    threshold, island merge, and the peak-frame pack (e_total·32 +
    (31−dom), hugeint-safe) — every stage exact int64, zero float
    hazard. Each emitted segment's peak bin recovers the clip's
    planted tone (unit-asserted), so the hash pins the composition's
    semantics, not just its algebra."""
    docs = _t(spark, sf_dir, "documents")
    return spectral.speech_segments_with_descriptors(docs)
