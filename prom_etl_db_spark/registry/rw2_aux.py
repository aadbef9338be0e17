"""Registry section: remote-write 2.0 AUXILIARY data — exemplars and
created timestamps (later r8). These were the last two skipped fields
on the v2 wire; both are data-bearing:

- exemplars are the metric→trace links (trace_id/span_id labels) an
  observability pipeline joins against its trace store;
- created_timestamp is the series' birth time — Prometheus's
  CT-per-series feature, which makes increase() exact for counters
  born inside the query window (a synthetic zero at CT).

Reference tie-in: the reference's executor persists whatever its
Prometheus backend returns (internal/executor/executor.go:122-162) and
never sees the push wire; this engine ingests the wire directly, so
the auxiliary fields land as first-class columns."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from prom_etl_db_spark.registry.core import _events_wide, register

_T0 = 1706572800000  # fixture epoch (ms)


@register(
    "remote_write_v2_exemplars_decode",
    oracle="""
SELECT event_id AS push_id, event_type AS metric_name,
  't' || CAST((user_id * 31) % 997 AS VARCHAR) AS trace_id,
  round(user_id * 0.25e0 + 0.5e0, 4) AS value,
  CAST(1706572800000 + user_id % 7 AS BIGINT) AS timestamp_ms
FROM events
UNION ALL
SELECT event_id AS push_id, event_type AS metric_name,
  's' || CAST((user_id * 17) % 997 AS VARCHAR) AS trace_id,
  round(user_id * 0.125e0, 4) AS value,
  CAST(1706572800000 + user_id % 7 + 1 AS BIGINT) AS timestamp_ms
FROM events
""",
)
def remote_write_v2_exemplars_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exemplars off the v2 wire (TimeSeries field 4): per push, one
    series with two exemplars whose labels carry the trace_id the
    fixture derives in closed form — the decode surfaces them as rows
    with the exemplar's own label map next to the series identity.
    Plan: one mapInPandas decode, zero shuffle."""
    from prom_etl_db_spark.functions import remote_write as RW

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(name: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, u in zip(name, user):
            u = int(u)
            out.append(RW.snappy_compress(RW.encode_write_request_v2(
                [{"labels": {"__name__": n, "user": str(u)},
                  "samples": [(float(u), _T0)],
                  "exemplars": [
                      {"labels": {"trace_id": f"t{(u * 31) % 997}"},
                       "value": u * 0.25 + 0.5,
                       "timestamp": _T0 + u % 7},
                      {"labels": {"trace_id": f"s{(u * 17) % 997}",
                                  "span_id": f"sp{u % 13}"},
                       "value": u * 0.125,
                       "timestamp": _T0 + u % 7 + 1},
                  ]}])))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "user_id").alias("body"),
    )
    out = RW.remote_write_v2_exemplars(payloads)
    return out.select(
        "push_id",
        "metric_name",
        F.col("exemplar_labels")["trace_id"].alias("trace_id"),
        F.round("value", 4).alias("value"),
        "timestamp_ms",
    )


@register(
    "remote_write_v1_exemplars_decode",
    oracle="""
SELECT event_id AS push_id, event_type AS metric_name,
  'v' || CAST((user_id * 13) % 997 AS VARCHAR) AS trace_id,
  'sp' || CAST(user_id % 13 AS VARCHAR) AS span_id,
  round(user_id * 0.5e0 + 0.25e0, 4) AS value,
  CAST(1706572800000 + user_id % 5 AS BIGINT) AS timestamp_ms
FROM events
""",
)
def remote_write_v1_exemplars_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exemplars off the remote-write 1.0 wire (r9 —
    prompb.TimeSeries.exemplars = 3, previously the only push-format
    wire field the engine silently skipped; reference tie-in:
    /root/reference/internal/prometheus/client.go pulls from the
    client_golang ecosystem whose exemplar support predates v2). v1
    exemplar labels are FULL strings — no symbol table — and land in
    the same trace-link shape as the v2/OTLP surfaces. Plan: one
    mapInPandas decode, zero shuffle."""
    from prom_etl_db_spark.functions import remote_write as RW

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(name: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, u in zip(name, user):
            u = int(u)
            out.append(RW.snappy_compress(RW.encode_write_request(
                [{"labels": {"__name__": n, "user": str(u)},
                  "samples": [(float(u), _T0)],
                  "exemplars": [
                      {"labels": {"trace_id": f"v{(u * 13) % 997}",
                                  "span_id": f"sp{u % 13}"},
                       "value": u * 0.5 + 0.25,
                       "timestamp": _T0 + u % 5},
                  ]}])))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "user_id").alias("body"),
    )
    out = RW.remote_write_v1_exemplars(payloads)
    return out.select(
        "push_id",
        "metric_name",
        F.col("exemplar_labels")["trace_id"].alias("trace_id"),
        F.col("exemplar_labels")["span_id"].alias("span_id"),
        F.round("value", 4).alias("value"),
        "timestamp_ms",
    )


@register(
    "remote_write_v1_metadata",
    oracle="""
SELECT event_id AS push_id, event_type AS metric_family_name,
  CASE user_id % 4 WHEN 0 THEN 'counter' WHEN 1 THEN 'gauge'
       WHEN 2 THEN 'histogram' ELSE 'summary' END AS metric_type,
  'Tracks ' || event_type AS help,
  CASE WHEN user_id % 2 = 0 THEN 'seconds' ELSE NULL END AS unit
FROM events
""",
)
def remote_write_v1_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 REQUEST-level metadata (r9 — WriteRequest.metadata = 3,
    prompb.MetricMetadata; the last v1 field that was skipped): one
    typed row per metric family, landing in the SAME
    (family, type, help, unit) shape the v2 interned-ref metadata
    resolves into — both wire generations feed one metadata table.
    The u-odd slice omits ``unit`` to pin the proto3
    optional-absent → NULL convention. Plan: one mapInPandas decode,
    zero shuffle."""
    from prom_etl_db_spark.functions import remote_write as RW

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")
    types = {0: 1, 1: 2, 2: 3, 3: 5}  # counter/gauge/histogram/summary

    def build(name: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, u in zip(name, user):
            u = int(u)
            md = {"type": types[u % 4], "family": n,
                  "help": f"Tracks {n}"}
            if u % 2 == 0:
                md["unit"] = "seconds"
            out.append(RW.snappy_compress(RW.encode_write_request(
                [{"labels": {"__name__": n}, "samples": [(float(u), _T0)]}],
                metadata=[md])))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "user_id").alias("body"),
    )
    return RW.remote_write_v1_metadata(payloads).select(
        "push_id", "metric_family_name", "metric_type", "help", "unit"
    )


@register(
    "ct_aware_increase",
    oracle="""
WITH s AS (
  SELECT event_id, event_type, user_id,
    CAST(user_id % 7 + 1 AS DOUBLE) AS v0,
    CAST(user_id % 5 AS DOUBLE) AS a,
    CAST(user_id % 3 AS DOUBLE) AS b,
    user_id % 11 = 0 AS resets,
    user_id % 2 = 0 AS born_in_window
  FROM events
), v AS (
  SELECT event_id, event_type,
    -- sample deltas, reset-aware: a reset (drop to 0.5 < v0 + a)
    -- contributes the post-reset value; the first sample contributes
    -- its full value only when the series was born inside the window
    -- (CT rule: synthetic zero at created_timestamp)
    CASE WHEN born_in_window THEN v0 ELSE 0.0 END
    + a
    + CASE WHEN resets THEN 0.5 ELSE b END AS inc
  FROM s
)
SELECT event_id AS push_id, event_type AS metric_name,
  round(inc, 4) AS increase
FROM v
""",
)
def ct_aware_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CT-aware increase(): Prometheus's created-timestamp feature —
    a counter born INSIDE the query window gets a synthetic zero at
    CT, so its first sample counts as growth (without CT, increase()
    silently loses everything before the first in-window sample).
    Per push: 3 counter samples; the u%11 slice RESETS at the third
    sample (drops to 0.5 < v0 + a, since v0 ≥ 1 — a guaranteed drop),
    exercising the reset rule (a drop contributes the post-reset
    value); the u%2 slice is born inside the window (ct = t0 > window
    start), the rest before it. Plan: decode (mapInPandas) → one
    window (lag per series) + one hash agg on the same key — a single
    shuffle."""
    from prom_etl_db_spark.functions import remote_write as RW

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")
    wstart = _T0 - 15000

    def build(name: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, u in zip(name, user):
            u = int(u)
            v0 = float(u % 7 + 1)
            a = float(u % 5)
            b = float(u % 3)
            if u % 11 == 0:
                samples = [(v0, _T0), (v0 + a, _T0 + 60000),
                           (0.5, _T0 + 120000)]  # reset to 0.5 < v0
            else:
                samples = [(v0, _T0), (v0 + a, _T0 + 60000),
                           (v0 + a + b, _T0 + 120000)]
            ct = _T0 - 1000 if u % 2 == 0 else _T0 - 30000
            out.append(RW.snappy_compress(RW.encode_write_request_v2(
                [{"labels": {"__name__": n, "user": str(u)},
                  "samples": samples,
                  "created_timestamp": ct}])))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "user_id").alias("body"),
    )
    pts = RW.remote_write_v2_samples(payloads, with_created=True)
    return ct_increase(pts, wstart).select(
        "push_id", "metric_name",
        F.round("increase", 4).alias("increase"))


def ct_increase(
    pts: DataFrame,
    window_start_ms: int,
    *,
    series_cols: tuple[str, ...] = ("push_id", "metric_name"),
) -> DataFrame:
    """CT-aware increase over a decoded samples frame (factored out in
    r9 so the clock-skew seam is testable on arbitrary fixtures):
    reset-corrected lag deltas per series; the FIRST in-window sample
    counts fully iff created_timestamp lands inside the window AND
    STRICTLY before the sample itself (r9 review fix: Prometheus's
    CT-zero ingestion rejects ct >= t — equality included) — a CT newer than the sample it describes
    is clock skew / a lying producer (Prometheus's CT-zero ingestion
    only injects the zero when ct < sample ts), so it is ignored
    rather than trusted. One window + one hash agg on the same key —
    a single shuffle."""
    w = Window.partitionBy(*series_cols).orderBy("timestamp_ms")
    deltas = pts.withColumn("prev", F.lag("value").over(w)).withColumn(
        "contrib",
        F.when(
            F.col("prev").isNull(),
            F.when(
                (F.col("created_timestamp_ms") >= F.lit(window_start_ms))
                & (F.col("created_timestamp_ms") < F.col("timestamp_ms")),
                F.col("value"),
            ).otherwise(F.lit(0.0)),
        )
        .when(F.col("value") < F.col("prev"), F.col("value"))  # reset
        .otherwise(F.col("value") - F.col("prev")),
    )
    return deltas.groupBy(*series_cols).agg(
        F.sum("contrib").alias("increase")
    )


@register(
    "otlp_exemplars_decode",
    oracle="""
SELECT event_id AS push_id, event_type AS metric_name,
  lpad(lower(hex((event_id * 2654435761) % 4294967296)), 32, '0')
    AS trace_id,
  lpad(lower(hex((event_id * 40503) % 65536)), 16, '0') AS span_id,
  round(user_id * 0.25e0 + 1.0e0, 4) AS value,
  CAST(1706572800000000000 + user_id AS BIGINT) AS ts_nano
FROM events
""",
)
def otlp_exemplars_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exemplars off the OTLP wire (Exemplar message on
    NumberDataPoint field 5): trace_id/span_id ride as RAW BYTES
    (16/8) and surface as lowercase hex — the fixture derives them
    from event_id via a Knuth multiplicative hash both engines can
    replay (odd multiplier mod 2^32 is a bijection, so trace ids stay
    unique per push). Plan: one mapInPandas decode, zero shuffle."""
    from prom_etl_db_spark.functions import otlp as O

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(name: pd.Series, eid: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, e, u in zip(name, eid, user):
            e, u = int(e), int(u)
            k = (e * 2654435761) % (1 << 32)
            m = (e * 40503) % (1 << 16)
            out.append(O.encode_export_metrics([{
                "resource": {"service.name": "svc"},
                "scopes": [{"name": "app", "version": "1", "metrics": [{
                    "name": n, "unit": "1", "type": "gauge",
                    "points": [{
                        "attrs": {"user": str(u)},
                        "time_unix_nano": 1706572800_000_000_000 + u,
                        "value": float(u),
                        "exemplars": [{
                            "time_unix_nano": 1706572800_000_000_000 + u,
                            "value": u * 0.25 + 1.0,
                            "trace_id": f"{k:032x}",
                            "span_id": f"{m:016x}",
                        }],
                    }],
                }]}],
            }]))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "event_id", "user_id").alias("body"),
    )
    out = O.otlp_exemplars(payloads)
    return out.select(
        "push_id",
        "metric_name",
        "trace_id",
        "span_id",
        F.round("value_double", 4).alias("value"),
        F.col("time_unix_nano").alias("ts_nano"),
    )


@register(
    "exemplars_cross_protocol",
    oracle="""
SELECT
  lpad(lower(hex((event_id * 2654435761) % 4294967296)), 32, '0')
    AS trace_id,
  CAST(4 AS BIGINT) AS n_sources,
  round(user_id * 0.25e0 + 1.0e0, 4) AS value
FROM events
""",
)
def exemplars_cross_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential gate over ALL FOUR exemplar surfaces (r9: the v1
    and OpenMetrics legs join): the same logical exemplar (trace_id +
    value) pushed over remote-write 1.0 (trace_id as a FULL-string
    exemplar label), remote-write 2.0 (trace_id as a label resolved
    through the interned symbols table), OTLP (trace_id as 16 RAW
    BYTES), and the OpenMetrics TEXT exposition (trace_id in the
    `# {...}` exemplar tail, value as formatted decimal text). The
    union must yield exactly four sources per trace with zero value
    spread — a disagreement in any decoder (label walk, symbol
    resolution, byte-to-hex, fixed64 value, text round-trip) breaks
    the n_sources=4 or the shared rounded value. Plan: three
    mapInPandas decodes + one pure-Column text parse → union → one
    hash agg keyed on trace_id; the max-min guard is computed, not
    assumed."""
    from prom_etl_db_spark.functions import otlp as O
    from prom_etl_db_spark.functions import remote_write as RW

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build_rw(name: pd.Series, eid: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, e, u in zip(name, eid, user):
            e, u = int(e), int(u)
            k = (e * 2654435761) % (1 << 32)
            out.append(RW.snappy_compress(RW.encode_write_request_v2(
                [{"labels": {"__name__": n, "user": str(u)},
                  "samples": [(float(u), _T0)],
                  "exemplars": [{"labels": {"trace_id": f"{k:032x}"},
                                 "value": u * 0.25 + 1.0,
                                 "timestamp": _T0 + 1}]}])))
        return pd.Series(out)

    def build_ot(name: pd.Series, eid: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, e, u in zip(name, eid, user):
            e, u = int(e), int(u)
            k = (e * 2654435761) % (1 << 32)
            out.append(O.encode_export_metrics([{
                "resource": {},
                "scopes": [{"name": "app", "version": "1", "metrics": [{
                    "name": n, "unit": "1", "type": "gauge",
                    "points": [{
                        "attrs": {}, "time_unix_nano": _T0 * 1_000_000,
                        "value": float(u),
                        "exemplars": [{
                            "time_unix_nano": _T0 * 1_000_000,
                            "value": u * 0.25 + 1.0,
                            "trace_id": f"{k:032x}",
                        }],
                    }],
                }]}],
            }]))
        return pd.Series(out)

    def build_v1(name: pd.Series, eid: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, e, u in zip(name, eid, user):
            e, u = int(e), int(u)
            k = (e * 2654435761) % (1 << 32)
            out.append(RW.snappy_compress(RW.encode_write_request(
                [{"labels": {"__name__": n, "user": str(u)},
                  "samples": [(float(u), _T0)],
                  "exemplars": [{"labels": {"trace_id": f"{k:032x}"},
                                 "value": u * 0.25 + 1.0,
                                 "timestamp": _T0 + 1}]}])))
        return pd.Series(out)

    _rwudf = F.pandas_udf(build_rw, returnType=BinaryType())
    _otudf = F.pandas_udf(build_ot, returnType=BinaryType())
    _v1udf = F.pandas_udf(build_v1, returnType=BinaryType())
    rw_side = RW.remote_write_v2_exemplars(ev.select(
        F.col("event_id").alias("push_id"),
        _rwudf("event_type", "event_id", "user_id").alias("body"),
    )).select(
        F.col("exemplar_labels")["trace_id"].alias("trace_id"),
        F.col("value"),
    )
    ot_side = O.otlp_exemplars(ev.select(
        F.col("event_id").alias("push_id"),
        _otudf("event_type", "event_id", "user_id").alias("body"),
    )).select(
        F.col("trace_id"),
        F.col("value_double").alias("value"),
    )
    v1_side = RW.remote_write_v1_exemplars(ev.select(
        F.col("event_id").alias("push_id"),
        _v1udf("event_type", "event_id", "user_id").alias("body"),
    )).select(
        F.col("exemplar_labels")["trace_id"].alias("trace_id"),
        F.col("value"),
    )
    # the text-exposition leg: one line per event with the SAME
    # trace/value in the OpenMetrics exemplar tail, parsed pure-Column
    from prom_etl_db_spark.sources.openmetrics import (
        parse_exposition_exemplars,
    )

    hex_trace = F.lpad(
        F.lower(F.hex((F.col("event_id") * F.lit(2654435761))
                      % F.lit(4294967296))),
        32, "0")
    # r10 ADVICE fix: a bare double→string cast renders >=1e7 in
    # scientific notation (2.500175E7), so at larger fixtures the text
    # leg's rendered value diverges from the three wire legs and the
    # n_sources=4 / zero-spread gate breaks. Fixed-decimal formatting
    # on BOTH the sample and exemplar values keeps the text leg
    # byte-stable at any fixture scale (the fixture's values are exact
    # quarter steps, so 4 decimals lose nothing).
    om_lines = ev.select(
        F.concat(
            F.col("event_type"),
            F.lit('{user="'), F.col("user_id").cast("string"),
            F.lit('"} '),
            F.format_string("%.4f", F.col("user_id").cast("double")),
            F.lit(' # {trace_id="'), hex_trace, F.lit('"} '),
            F.format_string(
                "%.4f",
                F.col("user_id").cast("double") * 0.25 + 1.0),
        ).alias("value"),
    )
    om_side = parse_exposition_exemplars(om_lines).select(
        F.col("exemplar_labels")["trace_id"].alias("trace_id"),
        F.col("value"),
    )
    both = (rw_side.unionByName(ot_side).unionByName(v1_side)
            .unionByName(om_side))
    agg = both.groupBy("trace_id").agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.min("value").alias("_vmin"),
        F.max("value").alias("_vmax"),
    )
    # the zero-spread guard FILTERS (not asserts): a decoder
    # disagreement drops the trace from the output and the row-count
    # gate catches it
    return agg.where(F.round(F.col("_vmax") - F.col("_vmin"), 9) == 0).select(
        "trace_id",
        "n_sources",
        F.round("_vmin", 4).alias("value"),
    )


@register(
    "exemplar_rate_report",
    oracle="""
WITH h AS (
  SELECT event_id, event_type, user_id,
    CAST(user_id % 9 + 3 AS DOUBLE) AS c1,
    CAST(user_id % 4 + 1 AS DOUBLE) AS g,
    CAST(user_id % 3 + 1 AS DOUBLE) AS cr,
    user_id % 7 * 0.5e0 + 1.0e0 AS v1,
    user_id % 5 * 0.25e0 + 2.0e0 AS v2,
    user_id % 5 = 0 AS reset_slice
  FROM events
), r AS (
  SELECT *,
    -- detection is honest: the reset slice reads as a reset only when
    -- the last value actually DROPS (cr < c1; equality is invisible
    -- to counter algebra)
    reset_slice AND cr < c1 AS detected,
    CASE WHEN reset_slice THEN
      CASE WHEN cr < c1 THEN cr ELSE cr - c1 END
    ELSE g END AS inc
  FROM h
)
SELECT event_id AS push_id, event_type AS metric_name,
  detected AS reset,
  round(inc, 4) AS increase,
  round(inc / 300.0e0, 6) AS rate_per_sec,
  CAST(2 AS BIGINT) AS n_exemplars,
  round(least(v1, v2), 4) AS exemplar_min,
  round(greatest(v1, v2), 4) AS exemplar_max,
  round((v1 + v2) / 2.0e0, 6) AS exemplar_mean,
  CASE WHEN inc > 0 THEN round(2.0e0 / inc, 6) END AS sampling_ratio
FROM r
""",
)
def exemplar_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exemplar-CONSUMING surface (r10 — VERDICT r9 stretch #8):
    every ingestion format lands exemplars in one trace-link table;
    this is the query an observability team runs on it — each series'
    rate window joined with the exemplars inside it, plus the
    trace-sampling-bias numbers (``operators/exemplars.py``).

    Wire fixture: one v2 payload per event carrying TWO counter
    samples 300 s apart and THREE exemplars — two inside the window
    (closed-form values in user_id) and one 60 s BEFORE it (a stale
    trace link that must be excluded by the range condition; its
    survival would skew every stat). The u%5 slice resets mid-window;
    the oracle replays the detection rule (a drop — an at-or-above
    restart is invisible, the counter-algebra blind spot kept
    honestly). Undetected resets can land increase = 0, pinning the
    sampling_ratio NULL convention (no events → no ratio).

    Plan: decode ×2 (samples + exemplars, both mapInPandas zero
    shuffle) → one series-keyed endpoint agg, one series-keyed
    equi-join + stats agg — two shuffles, the operator's contract."""
    from prom_etl_db_spark.functions import remote_write as RW
    from prom_etl_db_spark.operators.exemplars import exemplar_rate_report

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(name: pd.Series, eid: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for n, e, u in zip(name, eid, user):
            u = int(u)
            c1 = float(u % 9 + 3)
            c2 = float(u % 3 + 1) if u % 5 == 0 else c1 + (u % 4 + 1)
            v1 = u % 7 * 0.5 + 1.0
            v2 = u % 5 * 0.25 + 2.0
            out.append(RW.snappy_compress(RW.encode_write_request_v2(
                [{"labels": {"__name__": n, "eid": str(int(e))},
                  "samples": [(c1, _T0), (c2, _T0 + 300000)],
                  "exemplars": [
                      {"labels": {"trace_id": "in1"}, "value": v1,
                       "timestamp": _T0 + 100000},
                      {"labels": {"trace_id": "in2"}, "value": v2,
                       "timestamp": _T0 + 200000},
                      {"labels": {"trace_id": "stale"}, "value": 99.0,
                       "timestamp": _T0 - 60000},
                  ]}])))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "event_id", "user_id").alias("body"),
    ).cache()
    samples = RW.remote_write_v2_samples(payloads).select(
        "push_id", "metric_name", "timestamp_ms", "value")
    exemplars = RW.remote_write_v2_exemplars(payloads).select(
        "push_id", "metric_name", "value", "timestamp_ms")
    rep = exemplar_rate_report(
        samples, exemplars, series_cols=("push_id", "metric_name"))
    return rep.select(
        "push_id", "metric_name", "reset",
        F.round("increase", 4).alias("increase"),
        F.round("rate_per_sec", 6).alias("rate_per_sec"),
        "n_exemplars",
        F.round("exemplar_min", 4).alias("exemplar_min"),
        F.round("exemplar_max", 4).alias("exemplar_max"),
        F.round("exemplar_mean", 6).alias("exemplar_mean"),
        F.round("sampling_ratio", 6).alias("sampling_ratio"),
    )
