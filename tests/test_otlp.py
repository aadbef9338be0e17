"""OTLP metrics decode (functions/otlp.py — round 7): roundtrip
bit-exactness, proto3 unknown-field skipping, the histogram-family
loud refusal, corrupt-stream fuzz, and the gzip payload sniff."""

from __future__ import annotations

import gzip
import struct

import pytest

from prom_etl_db_spark.functions import otlp as O


def _req(points, mtype="gauge", **metric_kw):
    return [
        {
            "resource": {"service.name": "svc-1", "host": "h1"},
            "scopes": [
                {
                    "name": "app",
                    "version": "1.2",
                    "metrics": [
                        {"name": "m", "unit": "s", "type": mtype,
                         "points": points, **metric_kw}
                    ],
                }
            ],
        }
    ]


def test_gauge_roundtrip_bit_exact_doubles():
    vals = [0.1, -0.0, float("inf"), 2.0**-1074, 1e308, 3.14159]
    pts = [{"attrs": {"k": "v"}, "time_unix_nano": 10 + i, "value": v}
           for i, v in enumerate(vals)]
    got = O.decode_export_metrics(O.encode_export_metrics(_req(pts)))
    assert len(got) == len(vals)
    assert [struct.pack("<d", r["value_double"]) for r in got] == [
        struct.pack("<d", v) for v in vals
    ]
    r = got[0]
    assert r["resource"] == {"service.name": "svc-1", "host": "h1"}
    assert (r["scope_name"], r["scope_version"]) == ("app", "1.2")
    assert (r["metric_name"], r["unit"], r["data_type"]) == ("m", "s", "gauge")
    assert r["attrs"] == {"k": "v"}
    assert r["time_unix_nano"] == 10
    assert r["value_int"] is None


def test_sum_roundtrip_int_temporality_monotonic():
    pts = [{"attrs": {}, "time_unix_nano": 7,
            "start_time_unix_nano": 3, "value": -42}]
    got = O.decode_export_metrics(
        O.encode_export_metrics(
            _req(pts, mtype="sum", temporality=2, is_monotonic=True)
        )
    )
    (r,) = got
    assert r["data_type"] == "sum"
    assert r["temporality"] == 2
    assert r["is_monotonic"] is True
    assert r["value_int"] == -42 and r["value_double"] is None
    assert r["start_time_unix_nano"] == 3 and r["time_unix_nano"] == 7


def test_typed_attribute_values():
    pts = [{"attrs": {"s": "x", "b": True, "i": -5, "d": 2.5},
            "time_unix_nano": 1, "value": 1.0}]
    (r,) = O.decode_export_metrics(O.encode_export_metrics(_req(pts)))
    assert r["attrs"] == {"s": "x", "b": True, "i": -5, "d": 2.5}


def test_unknown_fields_skipped():
    from prom_etl_db_spark.functions.remote_write import _enc_field, _enc_uvarint

    enc = bytearray(
        O.encode_export_metrics(_req([{"time_unix_nano": 1, "value": 1.5}]))
    )
    # unknown top-level field 9 (varint) + field 6 (fixed32)
    enc += _enc_field(9, 0) + _enc_uvarint(777)
    enc += _enc_field(6, 5) + b"\x01\x02\x03\x04"
    got = O.decode_export_metrics(bytes(enc))
    assert len(got) == 1 and got[0]["value_double"] == 1.5


def test_summary_roundtrip_bit_exact():
    """r9: summary (field 11) DECODES — SummaryDataPoint count/sum +
    φ-quantile (quantile, value) pairs, bit-exact doubles; no
    temporality (the Summary message has none — they are cumulative
    by definition)."""
    pts = [{"attrs": {"route": "/q"}, "time_unix_nano": 11,
            "start_time_unix_nano": 7, "count": 42, "sum": 13.25,
            "quantiles": [(0.0, -0.5), (0.5, 2.0**-1074),
                          (0.99, 1e308), (1.0, 9.75)]}]
    (r,) = O.decode_export_metrics(
        O.encode_export_metrics(_req(pts, mtype="summary")))
    assert r["data_type"] == "summary"
    assert r["temporality"] is None
    assert r["count"] == 42 and r["sum"] == 13.25
    assert [(q["quantile"], q["value"]) for q in r["quantile_values"]] == [
        (0.0, -0.5), (0.5, 2.0**-1074), (0.99, 1e308), (1.0, 9.75)]
    assert r["attrs"] == {"route": "/q"}
    # non-summary shapes carry no quantile_values
    (g,) = O.decode_export_metrics(
        O.encode_export_metrics(_req([{"time_unix_nano": 1, "value": 1.0}])))
    assert g["quantile_values"] is None


def test_summary_phi_out_of_range_refuses():
    for bad in (-0.01, 1.5, float("nan")):
        enc = O.encode_export_metrics(_req(
            [{"time_unix_nano": 1, "count": 1, "sum": 1.0,
              "quantiles": [(bad, 0.5)]}], mtype="summary"))
        with pytest.raises(ValueError, match="outside"):
            O.decode_export_metrics(enc)


def test_summary_corrupt_fuzz_refuses_loudly():
    good = O.encode_export_metrics(_req(
        [{"attrs": {"k": "v"}, "time_unix_nano": 9, "count": 7,
          "sum": 3.5, "quantiles": [(0.5, 1.0), (0.9, 2.0)]}],
        mtype="summary"))
    for cut in range(1, len(good)):
        try:
            O.decode_export_metrics(good[:cut])
        except ValueError:
            pass
    import random

    rng = random.Random(99)
    for _ in range(300):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            O.decode_export_metrics(bytes(b))
        except (ValueError, UnicodeDecodeError):
            pass


def test_histogram_roundtrip():
    """Explicit-bounds histogram: packed fixed64 counts, packed double
    bounds, fixed64 count, optional sum/min/max — all bit-exact."""
    pts = [{
        "attrs": {"route": "/api"},
        "time_unix_nano": 77,
        "count": 10,
        "sum": 123.5,
        "bucket_counts": [1, 2, 3, 4],
        "explicit_bounds": [0.5, 2.5, 5.0],
        "min": -0.25,
        "max": 9.75,
    }]
    got = O.decode_export_metrics(
        O.encode_export_metrics(_req(pts, mtype="histogram", temporality=2))
    )
    (r,) = got
    assert r["data_type"] == "histogram"
    assert r["temporality"] == 2
    assert r["count"] == 10
    assert r["sum"] == 123.5
    assert r["bucket_counts"] == [1, 2, 3, 4]
    assert r["explicit_bounds"] == [0.5, 2.5, 5.0]
    assert (r["hist_min"], r["hist_max"]) == (-0.25, 9.75)
    assert r["attrs"] == {"route": "/api"}
    assert r["value_double"] is None and r["value_int"] is None


def test_histogram_bucket_bounds_arity_refused():
    pts = [{"attrs": {}, "time_unix_nano": 1, "count": 3,
            "bucket_counts": [1, 2], "explicit_bounds": [0.5, 2.5]}]
    with pytest.raises(ValueError, match="one more entry"):
        O.decode_export_metrics(
            O.encode_export_metrics(_req(pts, mtype="histogram"))
        )


def test_histogram_packed_length_refused():
    from prom_etl_db_spark.functions.remote_write import _enc_field, _enc_len, _enc_uvarint

    # HistogramDataPoint with bucket_counts length 7 (not multiple of 8)
    hp = _enc_field(3, 1) + b"\x01\x00\x00\x00\x00\x00\x00\x00"
    hp += _enc_field(6, 2) + _enc_uvarint(7) + b"\x00" * 7
    hist = _enc_len(1, hp)
    metric = _enc_len(1, b"h") + _enc_len(9, hist)
    req = _enc_len(1, _enc_len(2, _enc_len(2, metric)))
    with pytest.raises(ValueError, match="multiple of 8"):
        O.decode_export_metrics(req)


def test_array_attr_values_refused():
    from prom_etl_db_spark.functions.remote_write import _enc_len

    # KeyValue with AnyValue.array_value (field 5)
    kv = _enc_len(1, b"k") + _enc_len(2, _enc_len(5, b""))
    res = _enc_len(1, kv)
    rm = _enc_len(1, res)
    req = _enc_len(1, rm)
    with pytest.raises(ValueError, match="array/kvlist"):
        O.decode_export_metrics(req)


def test_corrupt_fuzz_refuses_loudly():
    enc = O.encode_export_metrics(
        _req([{"attrs": {"a": "b"}, "time_unix_nano": 9, "value": 2.5}],
             mtype="sum", temporality=1, is_monotonic=False)
    )
    for cut in range(len(enc)):
        try:
            O.decode_export_metrics(enc[:cut])
        except ValueError:
            continue
    for pos in range(len(enc)):
        mutated = bytearray(enc)
        mutated[pos] ^= 0xFF
        try:
            O.decode_export_metrics(bytes(mutated))
        except (ValueError, UnicodeDecodeError):
            continue


def test_otlp_samples_gzip_sniff(spark):
    enc = O.encode_export_metrics(_req([{"time_unix_nano": 5, "value": 1.25}]))
    rows = [(1, enc), (2, gzip.compress(enc))]
    df = spark.createDataFrame(rows, "push_id long, body binary")
    got = {r["push_id"]: r for r in O.otlp_samples(df).collect()}
    assert got[1]["value_double"] == got[2]["value_double"] == 1.25
    assert got[1]["resource"]["service.name"] == "svc-1"
    assert got[1]["data_type"] == "gauge"


def test_gzip_bomb_guard():
    """r7 adversarial pass: a hostile gzip payload must not allocate
    unbounded memory in an executor."""
    import gzip as _gz

    from prom_etl_db_spark.functions.otlp import _gunzip_bounded

    with pytest.raises(ValueError, match="expands beyond"):
        _gunzip_bounded(_gz.compress(b"\x00" * 5_000_000), max_out=1 << 20)
    # at the limit exactly is fine
    assert _gunzip_bounded(_gz.compress(b"x" * 1024), max_out=1024) == b"x" * 1024


def test_property_roundtrip_random_metric_trees():
    """Generative roundtrip: arbitrary resource/scope/metric/point trees
    survive encode->decode exactly (values bit-exact; attr maps equal)."""
    from hypothesis import given, settings, strategies as st

    attr_vals = st.one_of(
        st.text(max_size=8), st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False),
    )
    attrs = st.dictionaries(st.text(min_size=1, max_size=6), attr_vals, max_size=3)
    point = st.fixed_dictionaries({
        "attrs": attrs,
        "time_unix_nano": st.integers(min_value=0, max_value=2**63 - 1),
        "value": st.one_of(
            st.floats(allow_nan=False),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
        ),
    })
    metric = st.fixed_dictionaries({
        "name": st.text(min_size=1, max_size=8),
        "type": st.sampled_from(["gauge", "sum"]),
        "temporality": st.sampled_from([1, 2]),
        "is_monotonic": st.booleans(),
        "points": st.lists(point, max_size=3),
    })
    req = st.lists(
        st.fixed_dictionaries({
            "resource": attrs,
            "scopes": st.lists(
                st.fixed_dictionaries({
                    "name": st.text(max_size=6),
                    "metrics": st.lists(metric, max_size=2),
                }),
                max_size=2,
            ),
        }),
        max_size=2,
    )

    @settings(max_examples=60, deadline=None)
    @given(tree=req)
    def roundtrip(tree) -> None:
        got = O.decode_export_metrics(O.encode_export_metrics(tree))
        want = []
        for rm in tree:
            for sc in rm["scopes"]:
                for m in sc["metrics"]:
                    for p in m["points"]:
                        want.append((
                            rm["resource"], sc["name"], m["name"],
                            m["type"],
                            m["temporality"] if m["type"] == "sum" else None,
                            m["is_monotonic"] if m["type"] == "sum" else None,
                            p["attrs"], p["time_unix_nano"],
                            p["value"],
                        ))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            res, scn, mn, dt, temp, mono, pattrs, tns, val = w
            assert g["resource"] == res and g["scope_name"] == scn
            assert g["metric_name"] == mn and g["data_type"] == dt
            assert g["temporality"] == temp and g["is_monotonic"] == mono
            assert g["attrs"] == pattrs and g["time_unix_nano"] == tns
            if isinstance(val, float):
                assert struct.pack("<d", g["value_double"]) == struct.pack("<d", val)
            else:
                assert g["value_int"] == val

    roundtrip()


def test_exp_histogram_roundtrip_bit_exact():
    """r8: ExponentialHistogramDataPoint — zigzag scale/offsets
    (negative values exercise the encoding), packed-varint bucket runs,
    fixed64 count/zero_count, double sum/min/max/zero_threshold."""
    pts = [{
        "attrs": {"route": "/api"},
        "time_unix_nano": 88,
        "count": 13,
        "sum": 41.5,
        "scale": -1,              # base 4 — negative scale is legal
        "zero_count": 2,
        "zero_threshold": 1e-9,
        "pos_offset": -3,         # zigzag negative offset
        "pos_counts": [4, 0, 5],
        "neg_offset": 1,
        "neg_counts": [2],
        "min": -8.25,
        "max": 97.0,
    }]
    got = O.decode_export_metrics(
        O.encode_export_metrics(
            _req(pts, mtype="exponential_histogram", temporality=1))
    )
    (r,) = got
    assert r["data_type"] == "exponential_histogram"
    assert r["temporality"] == 1
    assert r["count"] == 13 and r["zero_count"] == 2
    assert r["scale"] == -1
    assert r["zero_threshold"] == 1e-9
    assert (r["pos_offset"], r["pos_counts"]) == (-3, [4, 0, 5])
    assert (r["neg_offset"], r["neg_counts"]) == (1, [2])
    assert (r["hist_min"], r["hist_max"]) == (-8.25, 97.0)
    assert r["sum"] == 41.5
    assert r["attrs"] == {"route": "/api"}


def test_exp_histogram_unpacked_bucket_counts():
    """Unpacked repeated uint64 in Buckets (wire 0 entries) must parse
    — the same proto3 rule the classic histogram fix pinned."""
    from prom_etl_db_spark.functions.remote_write import (
        _enc_field, _enc_len, _enc_uvarint)

    buckets = _enc_field(1, 0) + _enc_uvarint(O._zigzag_enc(2))
    for c in (5, 6):
        buckets += _enc_field(2, 0) + _enc_uvarint(c)
    hp = _enc_field(3, 1) + struct.pack("<Q", 9)
    hp += _enc_field(4, 1) + struct.pack("<Q", 11)
    hp += _enc_field(6, 0) + _enc_uvarint(O._zigzag_enc(3))
    hp += _enc_len(8, buckets)
    metric = _enc_len(1, b"h") + _enc_len(10, _enc_len(1, hp))
    req = _enc_len(1, _enc_len(2, _enc_len(2, metric)))
    (r,) = O.decode_export_metrics(req)
    assert (r["pos_offset"], r["pos_counts"]) == (2, [5, 6])
    assert r["scale"] == 3


def test_exp_histogram_scale_out_of_range_refused():
    pts = [{"attrs": {}, "time_unix_nano": 1, "count": 1,
            "scale": 21, "pos_counts": [1]}]
    with pytest.raises(ValueError, match="outside"):
        O.decode_export_metrics(
            O.encode_export_metrics(_req(pts, mtype="exponential_histogram")))


def test_exp_histogram_count_below_buckets_refused():
    pts = [{"attrs": {}, "time_unix_nano": 1, "count": 2,
            "scale": 0, "zero_count": 1, "pos_counts": [3]}]
    with pytest.raises(ValueError, match="below the sum"):
        O.decode_export_metrics(
            O.encode_export_metrics(_req(pts, mtype="exponential_histogram")))


def test_exp_histogram_corrupt_fuzz_refuses_loudly():
    """Truncations and bit flips refuse with ValueError (or decode to a
    structurally valid tree) — never crash, never hang."""
    pts = [{"attrs": {"k": "v"}, "time_unix_nano": 5, "count": 9,
            "scale": 2, "zero_count": 1, "pos_offset": -4,
            "pos_counts": [3, 5], "sum": 1.5}]
    good = O.encode_export_metrics(
        _req(pts, mtype="exponential_histogram", temporality=2))
    for cut in range(1, len(good)):
        try:
            O.decode_export_metrics(good[:cut])
        except ValueError:
            pass
    import random

    rng = random.Random(88)
    for _ in range(300):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            O.decode_export_metrics(bytes(b))
        except ValueError:
            pass


def test_zigzag_codec():
    for n in (0, -1, 1, -2, 2, 2**31 - 1, -(2**31), 12345, -98765):
        assert O._zigzag_dec(O._zigzag_enc(n)) == n
    assert [O._zigzag_enc(n) for n in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]


def test_exemplar_roundtrip_all_three_point_shapes():
    """later r8: Exemplar (time=2, as_double=3/as_int=6, span_id=4,
    trace_id=5, filtered_attributes=7) decodes off NumberDataPoint(5),
    HistogramDataPoint(8), ExponentialHistogramDataPoint(11)."""
    ex1 = {"time_unix_nano": 77, "value": 2.5,
           "trace_id": "0f" * 16, "span_id": "ab" * 8,
           "attrs": {"cell": "a"}}
    ex2 = {"time_unix_nano": 78, "value": 9, "trace_id": "1e" * 16}
    gauge = _req([{"attrs": {}, "time_unix_nano": 1, "value": 1.0,
                   "exemplars": [ex1, ex2]}])
    (g,) = O.decode_export_metrics(O.encode_export_metrics(gauge))
    assert len(g["exemplars"]) == 2
    assert g["exemplars"][0]["trace_id"] == "0f" * 16
    assert g["exemplars"][0]["span_id"] == "ab" * 8
    assert g["exemplars"][0]["value_double"] == 2.5
    assert g["exemplars"][0]["attrs"] == {"cell": "a"}
    assert g["exemplars"][1]["value_int"] == 9
    assert g["exemplars"][1]["span_id"] is None

    hist = _req([{"attrs": {}, "time_unix_nano": 1, "count": 2,
                  "bucket_counts": [1, 1], "explicit_bounds": [5.0],
                  "exemplars": [ex1]}], mtype="histogram")
    (h,) = O.decode_export_metrics(O.encode_export_metrics(hist))
    assert h["exemplars"][0]["trace_id"] == "0f" * 16

    exp = _req([{"attrs": {}, "time_unix_nano": 1, "count": 3,
                 "scale": 1, "zero_count": 1,
                 "pos_offset": 0, "pos_counts": [1, 1],
                 "exemplars": [ex2]}], mtype="exponential_histogram")
    (e,) = O.decode_export_metrics(O.encode_export_metrics(exp))
    assert e["exemplars"][0]["value_int"] == 9


def test_exemplar_wrong_id_length_refused():
    from prom_etl_db_spark.functions.remote_write import (
        _enc_field, _enc_len)
    import struct as _st
    # 15-byte trace_id inside a gauge point's exemplar
    bad_ex = (_enc_field(2, 1) + _st.pack("<Q", 1)
              + _enc_field(3, 1) + _st.pack("<d", 1.0)
              + _enc_len(5, b"\x00" * 15))
    point = (_enc_field(3, 1) + _st.pack("<Q", 1)
             + _enc_field(4, 1) + _st.pack("<d", 1.0)
             + _enc_len(5, bad_ex))
    metric = (_enc_len(1, b"m") + _enc_len(5, _enc_len(1, point)))
    req = _enc_len(1, _enc_len(2, _enc_len(2, metric)))
    with pytest.raises(ValueError, match="trace_id is 15 bytes"):
        O.decode_export_metrics(req)


def test_otlp_exemplars_spark_path(spark):
    enc = O.encode_export_metrics(_req([
        {"attrs": {"k": "v"}, "time_unix_nano": 5, "value": 1.5,
         "exemplars": [{"time_unix_nano": 6, "value": 1.25,
                        "trace_id": "2a" * 16, "span_id": "bc" * 8}]},
        {"attrs": {"k": "w"}, "time_unix_nano": 7, "value": 2.5},
    ]))
    df = spark.createDataFrame([(3, enc)], "push_id long, body binary")
    rows = O.otlp_exemplars(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["trace_id"] == "2a" * 16 and r["span_id"] == "bc" * 8
    assert r["value_double"] == 1.25 and r["attrs"] == {"k": "v"}
