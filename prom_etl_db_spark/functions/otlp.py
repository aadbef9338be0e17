"""OTLP metrics ingestion: the OpenTelemetry push protocol's
``ExportMetricsServiceRequest``, decoded by the same from-scratch
proto3 wire walk as remote-write.

Reference scope: samzong/prom-etl-db PULLS from the Prometheus HTTP
query API (internal/prometheus/client.go); OTLP is the OTHER push
protocol of that ecosystem (Prometheus itself accepts OTLP ingestion
on ``/api/v1/otlp/v1/metrics``), so an engine claiming the
reference's ingestion surface must accept both pushes. The message
schema implemented is the public opentelemetry-proto (metrics.proto /
common.proto / resource.proto, Apache-2.0 spec repo):

- ExportMetricsServiceRequest.resource_metrics = 1
- ResourceMetrics.resource = 1, .scope_metrics = 2
- Resource.attributes = 1 (repeated KeyValue)
- KeyValue.key = 1, .value = 2 (AnyValue); AnyValue.string_value = 1,
  .bool_value = 2 (varint), .int_value = 3 (varint), .double_value = 4
  (fixed64)
- ScopeMetrics.scope = 1 (InstrumentationScope.name = 1,
  .version = 2), .metrics = 2
- Metric.name = 1, .description = 2, .unit = 3; data oneof:
  gauge = 5, sum = 7, histogram = 9, exponential_histogram = 10,
  summary = 11
- Gauge.data_points = 1; Sum.data_points = 1,
  .aggregation_temporality = 2 (enum varint), .is_monotonic = 3
- NumberDataPoint.start_time_unix_nano = 2 (fixed64),
  .time_unix_nano = 3 (fixed64), .as_double = 4 (fixed64 double),
  .exemplars = 5, .as_int = 6 (sfixed64), .attributes = 7, .flags = 8

Documented subset (DIVERGENCES.md): gauge and sum with
NumberDataPoint (the two shapes Prometheus remote-write also carries),
explicit-bounds Histogram (HistogramDataPoint: fixed64 count,
optional sum/min/max doubles, fixed64 bucket_counts and double
explicit_bounds accepted packed AND unpacked — the classic-histogram
shape that maps onto Prometheus le-buckets), and (r8)
ExponentialHistogram — the wire twin of Prometheus NATIVE histograms:
sint32 ZIGZAG scale, fixed64 zero_count, positive/negative Buckets
(sint32 zigzag offset + packed-varint uint64 counts), with the
formula-defined boundary algebra base = 2^(2^-scale), bucket i =
(base^i, base^(i+1)] (scale clamped to the spec's [-10, 20]); and
(r9) Summary — SummaryDataPoint's φ-quantile (quantile, value) PAIRS
decode as typed data rows (they are the sender's sketch output and
cannot be re-aggregated — quantiles of quantiles are not quantiles;
the operator layer documents that only count/sum ride counter
algebra). A φ outside [0, 1] refuses. Attribute values
decode string/bool/int/double; nested array/kvlist values refuse.
Unknown FIELDS skip per proto3 forward-compat rules (that is what the
spec requires of any reader); unknown DATA SHAPES refuse (that is a
semantic boundary, not a wire one). OTLP/HTTP bodies are commonly
gzip-compressed — ``otlp_samples`` accepts plain or gzip payloads
(stdlib gzip; magic-sniffed per payload).

Doubles ride fixed64 and ints ride sfixed64/varint, so decoded values
are BIT-exact against the fixture encoder — the remote-write oracle
discipline. Malformed input refuses loudly with ValueError (every
nested length bounds-checked; the corrupt-stream fuzz convention).

Spark shape: one ``mapInPandas`` over the payload column — stateless,
Arrow-batched, zero shuffle; parallelism is per payload blob, exactly
how OTLP exporters batch (one request per export interval per agent).
"""

from __future__ import annotations

import gzip
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from prom_etl_db_spark.functions.remote_write import (
    _enc_field,
    _enc_len,
    _enc_uvarint,
    _skip,
    _uvarint,
)

# Every shape in _DATA_FIELDS decodes as of r9 (Summary was the last
# holdout — its φ-quantile values are DATA, not rate-able series,
# documented at the operator layer; count/sum ride increase algebra).
_DATA_FIELDS = {5: "gauge", 7: "sum", 9: "histogram",
                10: "exponential_histogram", 11: "summary"}


def _zigzag_enc(n: int) -> int:
    """sint32/sint64 zigzag: 0,-1,1,-2,... → 0,1,2,3,..."""
    return (n << 1) ^ (n >> 63)


def _zigzag_dec(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# --- fixture/test encoder -----------------------------------------------------


def _enc_anyvalue(v) -> bytes:
    if isinstance(v, bool):
        return _enc_field(2, 0) + _enc_uvarint(int(v))
    if isinstance(v, int):
        return _enc_field(3, 0) + _enc_uvarint(v)
    if isinstance(v, float):
        return _enc_field(4, 1) + struct.pack("<d", v)
    return _enc_len(1, str(v).encode())


def _enc_attrs(attrs: dict, field_num: int) -> bytes:
    out = bytearray()
    for k, v in attrs.items():
        kv = _enc_len(1, k.encode()) + _enc_len(2, _enc_anyvalue(v))
        out += _enc_len(field_num, kv)
    return bytes(out)


def _enc_exemplar(ex: dict) -> bytes:
    """Exemplar (metrics.proto): time_unix_nano=2 fixed64, as_double=3
    fixed64 double / as_int=6 sfixed64, span_id=4 (8 bytes),
    trace_id=5 (16 bytes), filtered_attributes=7 (repeated KeyValue)."""
    out = bytearray()
    out += _enc_field(2, 1) + struct.pack("<Q", int(ex.get("time_unix_nano", 0)))
    v = ex["value"]
    if isinstance(v, float):
        out += _enc_field(3, 1) + struct.pack("<d", v)
    else:
        out += _enc_field(6, 1) + struct.pack("<q", v)
    if ex.get("span_id") is not None:
        out += _enc_len(4, bytes.fromhex(ex["span_id"]))
    if ex.get("trace_id") is not None:
        out += _enc_len(5, bytes.fromhex(ex["trace_id"]))
    out += _enc_attrs(ex.get("attrs", {}), 7)
    return bytes(out)


def _enc_point(p: dict) -> bytes:
    out = bytearray()
    if p.get("start_time_unix_nano"):
        out += _enc_field(2, 1) + struct.pack("<Q", p["start_time_unix_nano"])
    out += _enc_field(3, 1) + struct.pack("<Q", p["time_unix_nano"])
    v = p["value"]
    if isinstance(v, float):
        out += _enc_field(4, 1) + struct.pack("<d", v)
    else:
        out += _enc_field(6, 1) + struct.pack("<q", v)
    for ex in p.get("exemplars", []):
        out += _enc_len(5, _enc_exemplar(ex))
    out += _enc_attrs(p.get("attrs", {}), 7)
    return bytes(out)


def _enc_hist_point(p: dict) -> bytes:
    """HistogramDataPoint: count=4 fixed64, sum=5 double,
    bucket_counts=6 PACKED fixed64, explicit_bounds=7 PACKED double,
    attributes=9, min=11, max=12."""
    out = bytearray()
    if p.get("start_time_unix_nano"):
        out += _enc_field(2, 1) + struct.pack("<Q", p["start_time_unix_nano"])
    out += _enc_field(3, 1) + struct.pack("<Q", p["time_unix_nano"])
    out += _enc_field(4, 1) + struct.pack("<Q", p["count"])
    if p.get("sum") is not None:
        out += _enc_field(5, 1) + struct.pack("<d", float(p["sum"]))
    bc = p.get("bucket_counts", [])
    out += _enc_len(6, b"".join(struct.pack("<Q", c) for c in bc))
    eb = p.get("explicit_bounds", [])
    out += _enc_len(7, b"".join(struct.pack("<d", b) for b in eb))
    for ex in p.get("exemplars", []):
        out += _enc_len(8, _enc_exemplar(ex))
    out += _enc_attrs(p.get("attrs", {}), 9)
    if p.get("min") is not None:
        out += _enc_field(11, 1) + struct.pack("<d", float(p["min"]))
    if p.get("max") is not None:
        out += _enc_field(12, 1) + struct.pack("<d", float(p["max"]))
    return bytes(out)


def _enc_summary_point(p: dict) -> bytes:
    """SummaryDataPoint (metrics.proto): start_time=2/time=3 fixed64,
    count=4 fixed64, sum=5 double, quantile_values=6 (repeated
    ValueAtQuantile: quantile=1 double, value=2 double),
    attributes=7."""
    out = bytearray()
    if p.get("start_time_unix_nano"):
        out += _enc_field(2, 1) + struct.pack("<Q", p["start_time_unix_nano"])
    out += _enc_field(3, 1) + struct.pack("<Q", p["time_unix_nano"])
    out += _enc_field(4, 1) + struct.pack("<Q", int(p.get("count", 0)))
    if p.get("sum") is not None:
        out += _enc_field(5, 1) + struct.pack("<d", float(p["sum"]))
    for q, v in p.get("quantiles", []):
        vq = (_enc_field(1, 1) + struct.pack("<d", float(q))
              + _enc_field(2, 1) + struct.pack("<d", float(v)))
        out += _enc_len(6, vq)
    out += _enc_attrs(p.get("attrs", {}), 7)
    return bytes(out)


def _enc_exp_buckets(offset: int, counts: list[int]) -> bytes:
    """ExponentialHistogramDataPoint.Buckets: offset = 1 (sint32,
    zigzag varint), bucket_counts = 2 (repeated uint64, PACKED varint)."""
    out = _enc_field(1, 0) + _enc_uvarint(_zigzag_enc(offset))
    if counts:
        out += _enc_len(2, b"".join(_enc_uvarint(c) for c in counts))
    return out


def _enc_exp_hist_point(p: dict) -> bytes:
    """ExponentialHistogramDataPoint: attributes=1, start=2/time=3
    fixed64, count=4 fixed64, sum=5 double, scale=6 sint32 (ZIGZAG),
    zero_count=7 fixed64, positive=8 / negative=9 Buckets, min=12,
    max=13 doubles, zero_threshold=14 double."""
    out = bytearray()
    out += _enc_attrs(p.get("attrs", {}), 1)
    if p.get("start_time_unix_nano"):
        out += _enc_field(2, 1) + struct.pack("<Q", p["start_time_unix_nano"])
    out += _enc_field(3, 1) + struct.pack("<Q", p["time_unix_nano"])
    out += _enc_field(4, 1) + struct.pack("<Q", p["count"])
    if p.get("sum") is not None:
        out += _enc_field(5, 1) + struct.pack("<d", float(p["sum"]))
    out += _enc_field(6, 0) + _enc_uvarint(_zigzag_enc(int(p.get("scale", 0))))
    out += _enc_field(7, 1) + struct.pack("<Q", int(p.get("zero_count", 0)))
    if p.get("pos_counts"):
        out += _enc_len(8, _enc_exp_buckets(
            int(p.get("pos_offset", 0)), p["pos_counts"]))
    if p.get("neg_counts"):
        out += _enc_len(9, _enc_exp_buckets(
            int(p.get("neg_offset", 0)), p["neg_counts"]))
    for ex in p.get("exemplars", []):
        out += _enc_len(11, _enc_exemplar(ex))
    if p.get("min") is not None:
        out += _enc_field(12, 1) + struct.pack("<d", float(p["min"]))
    if p.get("max") is not None:
        out += _enc_field(13, 1) + struct.pack("<d", float(p["max"]))
    if p.get("zero_threshold") is not None:
        out += _enc_field(14, 1) + struct.pack("<d", float(p["zero_threshold"]))
    return bytes(out)


def encode_export_metrics(resource_metrics: list[dict]) -> bytes:
    """Fixture/test encoder. Shape::

        [{"resource": {k: v}, "scopes": [{"name": ..., "version": ...,
          "metrics": [{"name": ..., "unit": ..., "type": "gauge"|"sum",
            "temporality": int, "is_monotonic": bool,
            "points": [{"attrs": {k: v}, "time_unix_nano": int,
                        "start_time_unix_nano": int, "value": float|int}]
          }]}]}]

    A float point value encodes as_double (fixed64); an int encodes
    as_int (sfixed64) — mirroring the decoder's bit-exact paths.
    """
    req = bytearray()
    for rm in resource_metrics:
        rm_msg = bytearray()
        rm_msg += _enc_len(1, _enc_attrs(rm.get("resource", {}), 1))
        for sc in rm.get("scopes", []):
            scope = _enc_len(1, sc.get("name", "").encode())
            if sc.get("version"):
                scope += _enc_len(2, sc["version"].encode())
            sm_msg = bytearray(_enc_len(1, scope))
            for m in sc.get("metrics", []):
                m_msg = bytearray(_enc_len(1, m["name"].encode()))
                if m.get("unit"):
                    m_msg += _enc_len(3, m["unit"].encode())
                mtype = m.get("type", "gauge")
                if mtype == "histogram":
                    pts = b"".join(
                        _enc_len(1, _enc_hist_point(p)) for p in m["points"]
                    )
                    h_msg = bytearray(pts)
                    h_msg += _enc_field(2, 0) + _enc_uvarint(
                        m.get("temporality", 2)
                    )
                    m_msg += _enc_len(9, bytes(h_msg))
                elif mtype == "exponential_histogram":
                    pts = b"".join(
                        _enc_len(1, _enc_exp_hist_point(p)) for p in m["points"]
                    )
                    h_msg = bytearray(pts)
                    h_msg += _enc_field(2, 0) + _enc_uvarint(
                        m.get("temporality", 2)
                    )
                    m_msg += _enc_len(10, bytes(h_msg))
                elif mtype == "summary":
                    pts = b"".join(
                        _enc_len(1, _enc_summary_point(p)) for p in m["points"]
                    )
                    m_msg += _enc_len(11, pts)
                elif mtype == "gauge":
                    pts = b"".join(_enc_len(1, _enc_point(p)) for p in m["points"])
                    m_msg += _enc_len(5, pts)
                else:
                    pts = b"".join(_enc_len(1, _enc_point(p)) for p in m["points"])
                    sum_msg = bytearray(pts)
                    sum_msg += _enc_field(2, 0) + _enc_uvarint(
                        m.get("temporality", 2)
                    )
                    sum_msg += _enc_field(3, 0) + _enc_uvarint(
                        int(m.get("is_monotonic", False))
                    )
                    m_msg += _enc_len(7, bytes(sum_msg))
                sm_msg += _enc_len(2, bytes(m_msg))
            rm_msg += _enc_len(2, bytes(sm_msg))
        req += _enc_len(1, bytes(rm_msg))
    return bytes(req)


# --- decoder ------------------------------------------------------------------


# The decode loops below inline the single-byte varint case
# (``if pos < len(buf) and (x := buf[pos]) < 0x80``) before falling back
# to _uvarint, which owns every error path — the r13 port of the
# remote_write decoder fast path (profiled: 300k _uvarint calls per 5k
# export payloads; interleaved A/B decode 0.81x, differential fuzz
# old-vs-new clean incl. error messages). Timestamps (uint64 ns) are
# always multi-byte and take the fallback.


def _check(pos: int, ln: int, n: int, what: str) -> None:
    if pos + ln > n:
        raise ValueError(f"otlp: {what} overruns buffer at {pos}")


def _parse_anyvalue(data: bytes):
    pos, n = 0, len(data)
    val = None
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num == 1 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "string value")
            val = data[pos : pos + ln].decode("utf-8")
            pos += ln
        elif num == 2 and wire == 0:
            if pos < len(data) and (raw := data[pos]) < 0x80:
                pos += 1
            else:
                raw, pos = _uvarint(data, pos)
            val = bool(raw)
        elif num == 3 and wire == 0:
            if pos < len(data) and (raw := data[pos]) < 0x80:
                pos += 1
            else:
                raw, pos = _uvarint(data, pos)
            val = raw - (1 << 64) if raw >= 1 << 63 else raw
        elif num == 4 and wire == 1:
            _check(pos, 8, n, "double value")
            val = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif num in (5, 6):
            raise ValueError(f"otlp: array/kvlist attribute values not implemented")
        else:
            pos = _skip(data, pos, wire)
    return val


def _parse_attrs(data: bytes) -> tuple[str, object]:
    pos, n = 0, len(data)
    key, val = "", None
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num == 1 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "attr key")
            key = data[pos : pos + ln].decode("utf-8")
            pos += ln
        elif num == 2 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "attr value")
            val = _parse_anyvalue(data[pos : pos + ln])
            pos += ln
        else:
            pos = _skip(data, pos, wire)
    return key, val


def _parse_exemplar(data: bytes) -> dict:
    """Exemplar → dict. trace_id/span_id surface as lowercase hex
    (their wire form is raw bytes, 16/8); a wrong-length id refuses —
    a truncated trace id joins against NOTHING in a trace store, the
    silent-wrongness failure class."""
    pos, n = 0, len(data)
    ex: dict = {"attrs": {}, "time_unix_nano": 0, "value_double": None,
                "value_int": None, "span_id": None, "trace_id": None}
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num == 2 and wire == 1:
            _check(pos, 8, n, "exemplar time")
            ex["time_unix_nano"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 3 and wire == 1:
            _check(pos, 8, n, "exemplar as_double")
            ex["value_double"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif num == 6 and wire == 1:
            _check(pos, 8, n, "exemplar as_int")
            ex["value_int"] = struct.unpack("<q", data[pos : pos + 8])[0]
            pos += 8
        elif num in (4, 5) and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "exemplar id")
            want = 8 if num == 4 else 16
            if ln != want:
                raise ValueError(
                    f"otlp: exemplar {'span' if num == 4 else 'trace'}_id "
                    f"is {ln} bytes, expected {want}")
            key = "span_id" if num == 4 else "trace_id"
            ex[key] = data[pos : pos + ln].hex()
            pos += ln
        elif num == 7 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "exemplar attribute")
            k, v = _parse_attrs(data[pos : pos + ln])
            ex["attrs"][k] = v
            pos += ln
        else:
            pos = _skip(data, pos, wire)
    return ex


def _parse_point(data: bytes) -> dict:
    pos, n = 0, len(data)
    p: dict = {"attrs": {}, "time_unix_nano": 0, "start_time_unix_nano": 0,
               "value_double": None, "value_int": None, "exemplars": []}
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num == 2 and wire == 1:
            _check(pos, 8, n, "start_time")
            p["start_time_unix_nano"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 3 and wire == 1:
            _check(pos, 8, n, "time")
            p["time_unix_nano"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 4 and wire == 1:
            _check(pos, 8, n, "as_double")
            p["value_double"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif num == 5 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "exemplar")
            p["exemplars"].append(_parse_exemplar(data[pos : pos + ln]))
            pos += ln
        elif num == 6 and wire == 1:
            _check(pos, 8, n, "as_int")
            p["value_int"] = struct.unpack("<q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 7 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "point attribute")
            k, v = _parse_attrs(data[pos : pos + ln])
            p["attrs"][k] = v
            pos += ln
        else:
            pos = _skip(data, pos, wire)
    return p


def _parse_hist_point(data: bytes) -> dict:
    pos, n = 0, len(data)
    p: dict = {"attrs": {}, "time_unix_nano": 0, "start_time_unix_nano": 0,
               "count": 0, "sum": None, "bucket_counts": [],
               "explicit_bounds": [], "min": None, "max": None,
               "exemplars": []}
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num == 2 and wire == 1:
            _check(pos, 8, n, "hist start_time")
            p["start_time_unix_nano"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 3 and wire == 1:
            _check(pos, 8, n, "hist time")
            p["time_unix_nano"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 4 and wire == 1:
            _check(pos, 8, n, "hist count")
            p["count"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 5 and wire == 1:
            _check(pos, 8, n, "hist sum")
            p["sum"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif num == 6 and wire == 2:  # packed fixed64 bucket counts
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "bucket_counts")
            if ln % 8:
                raise ValueError("otlp: packed fixed64 length not multiple of 8")
            p["bucket_counts"].extend(
                struct.unpack_from("<Q", data, pos + i)[0] for i in range(0, ln, 8)
            )
            pos += ln
        elif num == 7 and wire == 2:  # packed double bounds
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "explicit_bounds")
            if ln % 8:
                raise ValueError("otlp: packed double length not multiple of 8")
            p["explicit_bounds"].extend(
                struct.unpack_from("<d", data, pos + i)[0] for i in range(0, ln, 8)
            )
            pos += ln
        elif num == 6 and wire == 1:  # unpacked fixed64 bucket count entry
            # proto3 requires parsers to accept repeated scalars in BOTH
            # packed and unpacked form (r8 ADVICE fix — _skip silently
            # dropped these before, yielding wrong counts).
            _check(pos, 8, n, "bucket_counts entry")
            p["bucket_counts"].append(struct.unpack_from("<Q", data, pos)[0])
            pos += 8
        elif num == 7 and wire == 1:  # unpacked double bound entry
            _check(pos, 8, n, "explicit_bounds entry")
            p["explicit_bounds"].append(struct.unpack_from("<d", data, pos)[0])
            pos += 8
        elif num == 8 and wire == 2:  # exemplars (later r8)
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "hist exemplar")
            p["exemplars"].append(_parse_exemplar(data[pos : pos + ln]))
            pos += ln
        elif num == 9 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "hist attribute")
            k, v = _parse_attrs(data[pos : pos + ln])
            p["attrs"][k] = v
            pos += ln
        elif num == 11 and wire == 1:
            _check(pos, 8, n, "hist min")
            p["min"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif num == 12 and wire == 1:
            _check(pos, 8, n, "hist max")
            p["max"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        else:
            pos = _skip(data, pos, wire)
    # Arity holds whenever ANY buckets are present — including the
    # empty-bounds case (a lone +Inf bucket is exactly one count; r8
    # seam pass: multi-count/zero-bound payloads used to slip through
    # and downstream le-zipping would silently mis-pair them).
    if len(p["bucket_counts"]) and \
            len(p["bucket_counts"]) != len(p["explicit_bounds"]) + 1:
        raise ValueError(
            "otlp: bucket_counts must have exactly one more entry than "
            f"explicit_bounds ({len(p['bucket_counts'])} vs "
            f"{len(p['explicit_bounds'])})"
        )
    return p


def _parse_exp_buckets(data: bytes) -> tuple[int, list[int]]:
    """Buckets: offset = 1 (sint32 zigzag), bucket_counts = 2
    (repeated uint64 — accepted PACKED and unpacked per proto3)."""
    pos, n = 0, len(data)
    offset, counts = 0, []
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num == 1 and wire == 0:
            if pos < len(data) and (raw := data[pos]) < 0x80:
                pos += 1
            else:
                raw, pos = _uvarint(data, pos)
            offset = _zigzag_dec(raw)
        elif num == 2 and wire == 2:  # packed varints
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "exp bucket_counts")
            end = pos + ln
            while pos < end:
                if pos < len(data) and (c := data[pos]) < 0x80:
                    pos += 1
                else:
                    c, pos = _uvarint(data, pos)
                counts.append(c)
            if pos != end:
                raise ValueError("otlp: packed varint run overruns its length")
        elif num == 2 and wire == 0:  # unpacked entry
            if pos < len(data) and (c := data[pos]) < 0x80:
                pos += 1
            else:
                c, pos = _uvarint(data, pos)
            counts.append(c)
        else:
            pos = _skip(data, pos, wire)
    return offset, counts


def _parse_exp_hist_point(data: bytes) -> dict:
    """ExponentialHistogramDataPoint (opentelemetry-proto metrics.proto):
    the FORMULA-defined native-histogram shape — base = 2^(2^-scale),
    bucket i covers (base^i, base^(i+1)]. Scale rides a ZIGZAG varint
    (negative scales are legal: base 4, 16, ... for wide-range data)."""
    pos, n = 0, len(data)
    p: dict = {"attrs": {}, "time_unix_nano": 0, "start_time_unix_nano": 0,
               "count": 0, "sum": None, "scale": 0, "zero_count": 0,
               "zero_threshold": 0.0, "pos_offset": 0, "pos_counts": [],
               "neg_offset": 0, "neg_counts": [], "min": None, "max": None,
               "exemplars": []}
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num == 1 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "exp hist attribute")
            k, v = _parse_attrs(data[pos : pos + ln])
            p["attrs"][k] = v
            pos += ln
        elif num == 2 and wire == 1:
            _check(pos, 8, n, "exp hist start_time")
            p["start_time_unix_nano"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 3 and wire == 1:
            _check(pos, 8, n, "exp hist time")
            p["time_unix_nano"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 4 and wire == 1:
            _check(pos, 8, n, "exp hist count")
            p["count"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 5 and wire == 1:
            _check(pos, 8, n, "exp hist sum")
            p["sum"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif num == 6 and wire == 0:
            if pos < len(data) and (raw := data[pos]) < 0x80:
                pos += 1
            else:
                raw, pos = _uvarint(data, pos)
            p["scale"] = _zigzag_dec(raw)
        elif num == 7 and wire == 1:
            _check(pos, 8, n, "exp hist zero_count")
            p["zero_count"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 8 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "exp hist positive buckets")
            p["pos_offset"], p["pos_counts"] = _parse_exp_buckets(
                data[pos : pos + ln])
            pos += ln
        elif num == 9 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "exp hist negative buckets")
            p["neg_offset"], p["neg_counts"] = _parse_exp_buckets(
                data[pos : pos + ln])
            pos += ln
        elif num == 11 and wire == 2:  # exemplars (later r8)
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "exp hist exemplar")
            p["exemplars"].append(_parse_exemplar(data[pos : pos + ln]))
            pos += ln
        elif num == 12 and wire == 1:
            _check(pos, 8, n, "exp hist min")
            p["min"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif num == 13 and wire == 1:
            _check(pos, 8, n, "exp hist max")
            p["max"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif num == 14 and wire == 1:
            _check(pos, 8, n, "exp hist zero_threshold")
            p["zero_threshold"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        else:
            pos = _skip(data, pos, wire)
    # OpenTelemetry spec: scale is bounded to [-10, 20] (base must stay
    # representable); out-of-range scales are sender bugs — refuse.
    if not -10 <= p["scale"] <= 20:
        raise ValueError(f"otlp: exp histogram scale {p['scale']} outside [-10, 20]")
    if p["count"] < p["zero_count"] + sum(p["pos_counts"]) + sum(p["neg_counts"]):
        raise ValueError(
            "otlp: exp histogram count below the sum of its buckets "
            f"({p['count']} < {p['zero_count']} + buckets)"
        )
    return p


def _parse_summary_point(data: bytes) -> dict:
    """SummaryDataPoint → dict (r9). The φ-quantile entries decode as
    (quantile, value) PAIRS — data the sender's sketch computed, not
    something this engine can re-aggregate (quantiles of quantiles are
    not quantiles); count/sum are cumulative counters. A quantile
    outside [0, 1] refuses — it cannot be a φ and poisons any reader
    keyed on φ."""
    pos, n = 0, len(data)
    p: dict = {"attrs": {}, "time_unix_nano": 0, "start_time_unix_nano": 0,
               "count": 0, "sum": None, "quantile_values": []}
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num == 2 and wire == 1:
            _check(pos, 8, n, "summary start_time")
            p["start_time_unix_nano"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 3 and wire == 1:
            _check(pos, 8, n, "summary time")
            p["time_unix_nano"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 4 and wire == 1:
            _check(pos, 8, n, "summary count")
            p["count"] = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        elif num == 5 and wire == 1:
            _check(pos, 8, n, "summary sum")
            p["sum"] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif num == 6 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "summary quantile")
            vq, vp = data[pos : pos + ln], 0
            pos += ln
            q, v = 0.0, 0.0  # proto3 defaults
            while vp < len(vq):
                vh, vp = _uvarint(vq, vp)
                vnum, vwire = vh >> 3, vh & 7
                if vnum == 1 and vwire == 1:
                    _check(vp, 8, len(vq), "quantile phi")
                    q = struct.unpack("<d", vq[vp : vp + 8])[0]
                    vp += 8
                elif vnum == 2 and vwire == 1:
                    _check(vp, 8, len(vq), "quantile value")
                    v = struct.unpack("<d", vq[vp : vp + 8])[0]
                    vp += 8
                else:
                    vp = _skip(vq, vp, vwire)
            if not 0.0 <= q <= 1.0:
                raise ValueError(
                    f"otlp: summary quantile {q} outside [0, 1]")
            p["quantile_values"].append({"quantile": q, "value": v})
        elif num == 7 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "summary attribute")
            k, v = _parse_attrs(data[pos : pos + ln])
            p["attrs"][k] = v
            pos += ln
        else:
            pos = _skip(data, pos, wire)
    return p


def _parse_metric(data: bytes) -> dict:
    pos, n = 0, len(data)
    m: dict = {"name": "", "unit": "", "data_type": None, "temporality": None,
               "is_monotonic": None, "points": []}
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num == 1 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "metric name")
            m["name"] = data[pos : pos + ln].decode("utf-8")
            pos += ln
        elif num == 3 and wire == 2:
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, "metric unit")
            m["unit"] = data[pos : pos + ln].decode("utf-8")
            pos += ln
        elif num in _DATA_FIELDS and wire == 2:
            kind = _DATA_FIELDS[num]
            m["data_type"] = kind
            if pos < len(data) and (ln := data[pos]) < 0x80:
                pos += 1
            else:
                ln, pos = _uvarint(data, pos)
            _check(pos, ln, n, f"{kind} data")
            body, bp = data[pos : pos + ln], 0
            pos += ln
            point_parser = {
                "histogram": _parse_hist_point,
                "exponential_histogram": _parse_exp_hist_point,
                "summary": _parse_summary_point,
            }.get(kind, _parse_point)
            while bp < len(body):
                bh, bp = _uvarint(body, bp)
                bnum, bwire = bh >> 3, bh & 7
                if bnum == 1 and bwire == 2:
                    l2, bp = _uvarint(body, bp)
                    _check(bp, l2, len(body), "data point")
                    m["points"].append(point_parser(body[bp : bp + l2]))
                    bp += l2
                elif kind in ("sum", "histogram", "exponential_histogram") \
                        and bnum == 2 and bwire == 0:
                    raw, bp = _uvarint(body, bp)
                    m["temporality"] = raw
                elif kind == "sum" and bnum == 3 and bwire == 0:
                    raw, bp = _uvarint(body, bp)
                    m["is_monotonic"] = bool(raw)
                else:
                    bp = _skip(body, bp, bwire)
        else:
            pos = _skip(data, pos, wire)
    return m


def decode_export_metrics(data: bytes) -> list[dict]:
    """ExportMetricsServiceRequest bytes → one dict per DATA POINT:
    (resource attrs, scope name/version, metric name/unit/data_type,
    sum temporality/is_monotonic, point attrs/times/value_double/
    value_int). Unknown fields skip per proto3; histogram-family data
    and framing violations raise ValueError."""
    out: list[dict] = []
    pos, n = 0, len(data)
    while pos < n:
        if pos < len(data) and (hdr := data[pos]) < 0x80:
            pos += 1
        else:
            hdr, pos = _uvarint(data, pos)
        num, wire = hdr >> 3, hdr & 7
        if num != 1 or wire != 2:
            pos = _skip(data, pos, wire)
            continue
        if pos < len(data) and (ln := data[pos]) < 0x80:
            pos += 1
        else:
            ln, pos = _uvarint(data, pos)
        _check(pos, ln, n, "resource_metrics")
        rm, rp = data[pos : pos + ln], 0
        pos += ln
        resource: dict = {}
        scopes: list[tuple[str, str, list[dict]]] = []
        while rp < len(rm):
            rh, rp = _uvarint(rm, rp)
            rnum, rwire = rh >> 3, rh & 7
            if rnum == 1 and rwire == 2:
                l2, rp = _uvarint(rm, rp)
                _check(rp, l2, len(rm), "resource")
                res, sp = rm[rp : rp + l2], 0
                rp += l2
                while sp < len(res):
                    sh, sp = _uvarint(res, sp)
                    snum, swire = sh >> 3, sh & 7
                    if snum == 1 and swire == 2:
                        l3, sp = _uvarint(res, sp)
                        _check(sp, l3, len(res), "resource attribute")
                        k, v = _parse_attrs(res[sp : sp + l3])
                        resource[k] = v
                        sp += l3
                    else:
                        sp = _skip(res, sp, swire)
            elif rnum == 2 and rwire == 2:
                l2, rp = _uvarint(rm, rp)
                _check(rp, l2, len(rm), "scope_metrics")
                sm, sp = rm[rp : rp + l2], 0
                rp += l2
                sc_name, sc_ver = "", ""
                metrics: list[dict] = []
                while sp < len(sm):
                    sh, sp = _uvarint(sm, sp)
                    snum, swire = sh >> 3, sh & 7
                    if snum == 1 and swire == 2:
                        l3, sp = _uvarint(sm, sp)
                        _check(sp, l3, len(sm), "scope")
                        sc, cp = sm[sp : sp + l3], 0
                        sp += l3
                        while cp < len(sc):
                            ch, cp = _uvarint(sc, cp)
                            cnum, cwire = ch >> 3, ch & 7
                            if cnum == 1 and cwire == 2:
                                l4, cp = _uvarint(sc, cp)
                                _check(cp, l4, len(sc), "scope name")
                                sc_name = sc[cp : cp + l4].decode("utf-8")
                                cp += l4
                            elif cnum == 2 and cwire == 2:
                                l4, cp = _uvarint(sc, cp)
                                _check(cp, l4, len(sc), "scope version")
                                sc_ver = sc[cp : cp + l4].decode("utf-8")
                                cp += l4
                            else:
                                cp = _skip(sc, cp, cwire)
                    elif snum == 2 and swire == 2:
                        l3, sp = _uvarint(sm, sp)
                        _check(sp, l3, len(sm), "metric")
                        metrics.append(_parse_metric(sm[sp : sp + l3]))
                        sp += l3
                    else:
                        sp = _skip(sm, sp, swire)
                scopes.append((sc_name, sc_ver, metrics))
            else:
                rp = _skip(rm, rp, rwire)
        for sc_name, sc_ver, metrics in scopes:
            for m in metrics:
                for p in m["points"]:
                    out.append(
                        {
                            "resource": dict(resource),
                            "scope_name": sc_name,
                            "scope_version": sc_ver,
                            "metric_name": m["name"],
                            "unit": m["unit"],
                            "data_type": m["data_type"],
                            "temporality": m["temporality"],
                            "is_monotonic": m["is_monotonic"],
                            "attrs": p["attrs"],
                            "start_time_unix_nano": p["start_time_unix_nano"],
                            "time_unix_nano": p["time_unix_nano"],
                            "value_double": p.get("value_double"),
                            "value_int": p.get("value_int"),
                            "count": p.get("count"),
                            "sum": p.get("sum"),
                            "bucket_counts": p.get("bucket_counts"),
                            "explicit_bounds": p.get("explicit_bounds"),
                            "hist_min": p.get("min"),
                            "hist_max": p.get("max"),
                            "scale": p.get("scale"),
                            "zero_count": p.get("zero_count"),
                            "zero_threshold": p.get("zero_threshold"),
                            "pos_offset": p.get("pos_offset"),
                            "pos_counts": p.get("pos_counts"),
                            "neg_offset": p.get("neg_offset"),
                            "neg_counts": p.get("neg_counts"),
                            "quantile_values": p.get("quantile_values"),
                            "exemplars": p.get("exemplars") or [],
                        }
                    )
    return out


OTLP_SCHEMA = T.StructType(
    [
        T.StructField("resource", T.MapType(T.StringType(), T.StringType())),
        T.StructField("scope_name", T.StringType()),
        T.StructField("metric_name", T.StringType()),
        T.StructField("unit", T.StringType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("temporality", T.IntegerType()),
        T.StructField("is_monotonic", T.BooleanType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("start_time_unix_nano", T.LongType()),
        T.StructField("time_unix_nano", T.LongType()),
        T.StructField("value_double", T.DoubleType()),
        T.StructField("value_int", T.LongType()),
        T.StructField("count", T.LongType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("bucket_counts", T.ArrayType(T.LongType())),
        T.StructField("explicit_bounds", T.ArrayType(T.DoubleType())),
        T.StructField("hist_min", T.DoubleType()),
        T.StructField("hist_max", T.DoubleType()),
        T.StructField("scale", T.IntegerType()),
        T.StructField("zero_count", T.LongType()),
        T.StructField("zero_threshold", T.DoubleType()),
        T.StructField("pos_offset", T.IntegerType()),
        T.StructField("pos_counts", T.ArrayType(T.LongType())),
        T.StructField("neg_offset", T.IntegerType()),
        T.StructField("neg_counts", T.ArrayType(T.LongType())),
        T.StructField(
            "quantile_values",
            T.ArrayType(
                T.StructType([
                    T.StructField("quantile", T.DoubleType()),
                    T.StructField("value", T.DoubleType()),
                ])
            ),
        ),
    ]
)


#: decompression-bomb ceiling for gzip payloads (a 1 KiB gzip member
#: can expand ~1000x; OTLP export batches are MBs, never GBs).
_MAX_GUNZIP = 1 << 26


def _gunzip_bounded(raw: bytes, *, max_out: int = _MAX_GUNZIP) -> bytes:
    """gzip.decompress with a hard output ceiling — stdlib gzip has no
    limit, so a tiny hostile payload could allocate unbounded memory
    inside an executor (r7 adversarial pass)."""
    import zlib

    out = bytearray()
    # gzip allows CONCATENATED members — decode every member rather than
    # silently dropping trailing ones (r8 ADVICE fix); non-gzip trailing
    # garbage refuses loudly.
    while raw:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(raw, max_out - len(out) + 1)
        if len(out) > max_out or d.unconsumed_tail or (
            not d.eof and d.decompress(b"", 1)
        ):
            raise ValueError(
                f"otlp: gzip payload expands beyond {max_out} bytes"
            )
        if not d.eof:
            raise ValueError("otlp: truncated gzip member")
        raw = d.unused_data
        if raw and raw[:2] != b"\x1f\x8b":
            raise ValueError("otlp: trailing garbage after gzip member")
    return bytes(out)


def otlp_samples(
    payloads: DataFrame, *, payload_col: str = "body", id_col: str = "push_id"
) -> DataFrame:
    """(id, ExportMetricsServiceRequest bytes — plain or gzip, sniffed
    per payload by the 1f8b magic) → one row per data point. Attribute
    maps are stringified (the sample-record label convention the
    remote-write path also lands in); numeric values keep their typed
    columns (value_double / value_int) so bit-exactness survives."""
    schema = T.StructType([payloads.schema[id_col]] + list(OTLP_SCHEMA.fields))

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(blob)
                if raw[:2] == b"\x1f\x8b":
                    raw = _gunzip_bounded(raw)
                for r in decode_export_metrics(raw):
                    rows.append(
                        {
                            id_col: pid,
                            "resource": {
                                k: str(v) for k, v in r["resource"].items()
                            },
                            "scope_name": r["scope_name"],
                            "metric_name": r["metric_name"],
                            "unit": r["unit"],
                            "data_type": r["data_type"],
                            "temporality": r["temporality"],
                            "is_monotonic": r["is_monotonic"],
                            "attrs": {k: str(v) for k, v in r["attrs"].items()},
                            "start_time_unix_nano": r["start_time_unix_nano"],
                            "time_unix_nano": r["time_unix_nano"],
                            "value_double": r["value_double"],
                            "value_int": r["value_int"],
                            "count": r["count"],
                            "sum": r["sum"],
                            "bucket_counts": r["bucket_counts"],
                            "explicit_bounds": r["explicit_bounds"],
                            "hist_min": r["hist_min"],
                            "hist_max": r["hist_max"],
                            "scale": r["scale"],
                            "zero_count": r["zero_count"],
                            "zero_threshold": r["zero_threshold"],
                            "pos_offset": r["pos_offset"],
                            "pos_counts": r["pos_counts"],
                            "neg_offset": r["neg_offset"],
                            "neg_counts": r["neg_counts"],
                            "quantile_values": r["quantile_values"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            ) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in schema.fields}
            )

    return payloads.select(id_col, payload_col).mapInPandas(walk, schema=schema)


OTLP_EXEMPLAR_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("exemplar_attrs",
                      T.MapType(T.StringType(), T.StringType())),
        T.StructField("trace_id", T.StringType()),
        T.StructField("span_id", T.StringType()),
        T.StructField("value_double", T.DoubleType()),
        T.StructField("value_int", T.LongType()),
        T.StructField("time_unix_nano", T.LongType()),
    ]
)


def otlp_exemplars(
    payloads: DataFrame, *, payload_col: str = "body", id_col: str = "push_id"
) -> DataFrame:
    """(id, ExportMetricsServiceRequest bytes — plain or gzip) → one
    row per EXEMPLAR across all three point shapes (number, classic
    histogram, exponential histogram): the point's identity (metric
    name + attrs) next to the exemplar's trace_id/span_id (lowercase
    hex of the 16/8 raw wire bytes — wrong lengths refuse at parse),
    filtered attributes, typed value, and timestamp. This is the SAME
    metric→trace link table `remote_write_v2_exemplars` produces from
    the prompb wire, so one downstream trace-join serves both push
    protocols. mapInPandas, zero shuffle."""
    schema = T.StructType(
        [payloads.schema[id_col]] + list(OTLP_EXEMPLAR_SCHEMA.fields))

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(blob)
                if raw[:2] == b"\x1f\x8b":
                    raw = _gunzip_bounded(raw)
                for r in decode_export_metrics(raw):
                    for ex in r["exemplars"]:
                        rows.append(
                            {
                                id_col: pid,
                                "metric_name": r["metric_name"],
                                "attrs": {k: str(v)
                                          for k, v in r["attrs"].items()},
                                "exemplar_attrs": {
                                    k: str(v)
                                    for k, v in ex["attrs"].items()},
                                "trace_id": ex["trace_id"],
                                "span_id": ex["span_id"],
                                "value_double": ex["value_double"],
                                "value_int": ex["value_int"],
                                "time_unix_nano": ex["time_unix_nano"],
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            ) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in schema.fields}
            )

    return payloads.select(id_col, payload_col).mapInPandas(walk, schema=schema)
