"""Sessionization / funnel / new doc-family operator tests (round 3)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

T0 = datetime(2024, 5, 1, 10, 0, 0)


@pytest.fixture(scope="module")
def ev(spark):
    rows = []
    # user 1: two sessions (gap 45m between event 3 and 4)
    for i, off in enumerate([0, 5, 10, 55, 60]):
        rows.append((i, T0 + timedelta(minutes=off), 1, "view", 1.0, "{}"))
    # user 2: one session, single event
    rows.append((10, T0, 2, "view", 1.0, "{}"))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )


def test_sessionize_splits_on_gap(ev):
    from prom_etl_db_spark.operators.analytics import sessionize

    out = {
        (r["user_id"], r["session_no"]): r
        for r in sessionize(ev, gap="30 minutes").collect()
    }
    assert set(out) == {(1, 0), (1, 1), (2, 0)}
    assert out[(1, 0)]["n_events"] == 3
    assert out[(1, 0)]["duration_s"] == 600.0
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 1)]["session_start"] == T0 + timedelta(minutes=55)
    assert out[(2, 0)]["n_events"] == 1 and out[(2, 0)]["duration_s"] == 0.0


def test_funnel_dp_levels_and_window(spark):
    from prom_etl_db_spark.operators.analytics import funnel_levels

    def mk(uid, *evts):
        return [
            (uid * 100 + i, T0 + timedelta(hours=h), uid, t, 1.0, "{}")
            for i, (t, h) in enumerate(evts)
        ]

    rows = (
        # u1: full chain inside window -> 3
        mk(1, ("view", 0), ("click", 1), ("purchase", 2))
        # u2: purchase BEFORE click -> only view+click -> 2
        + mk(2, ("view", 0), ("purchase", 1), ("click", 2))
        # u3: chain complete but span exceeds the 3h window -> 2
        + mk(3, ("view", 0), ("click", 1), ("purchase", 5))
        # u4: only purchase (no chain start) -> 0
        + mk(4, ("purchase", 0))
        # u5: EARLY view's window expires, LATER view restarts the chain -> 3
        + mk(5, ("view", 0), ("click", 1), ("view", 6), ("click", 7), ("purchase", 8))
    )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    out = {
        r["user_id"]: r["funnel_level"]
        for r in funnel_levels(
            ev, ["view", "click", "purchase"], window="3h"
        ).collect()
    }
    assert out == {1: 3, 2: 2, 3: 2, 4: 0, 5: 3}


def test_funnel_same_timestamp_steps_do_not_chain(spark):
    """Strict-increase rule at equal timestamps (the oracle's p.ts > c.ts):
    a step sharing its timestamp with the previous step must NOT extend
    the chain — the settled/pending DP split exists for exactly this.
    Regression: the chain-start-only DP accepted these."""
    from prom_etl_db_spark.operators.analytics import funnel_levels

    def mk(uid, *evts):
        return [
            (uid * 100 + i, T0 + timedelta(minutes=m), uid, t, 1.0, "{}")
            for i, (t, m) in enumerate(evts)
        ]

    rows = (
        # u1: click and purchase at the SAME minute -> purchase can't
        # chain (click itself chains off the earlier view) -> 2
        mk(1, ("view", 0), ("click", 5), ("purchase", 5))
        # u2: view and click simultaneous -> click can't chain -> 1
        + mk(2, ("view", 0), ("click", 0), ("purchase", 10))
        # u3: control — distinct minutes -> 3
        + mk(3, ("view", 0), ("click", 5), ("purchase", 6))
        # u4: simultaneous pair, then a LATER purchase: click@5 never
        # chained, so purchase@10 has no level-2 chain -> 1
        + mk(4, ("view", 5), ("click", 5), ("purchase", 10))
        # u5: the same-ts click doesn't chain, but a second click at a
        # later minute does, and purchase rides it -> 3
        + mk(5, ("view", 0), ("click", 0), ("click", 2), ("purchase", 4))
    )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    out = {
        r["user_id"]: r["funnel_level"]
        for r in funnel_levels(
            ev, ["view", "click", "purchase"], window="3h"
        ).collect()
    }
    assert out == {1: 2, 2: 1, 3: 3, 4: 1, 5: 3}


def test_paragraph_dedup_keeps_first_occurrence(spark):
    from prom_etl_db_spark.functions.dedup import paragraph_dedup_stats

    chunk_a = " ".join(f"a{i}" for i in range(20))
    chunk_b = " ".join(f"b{i}" for i in range(20))
    chunk_c = " ".join(f"c{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, chunk_a + " " + chunk_b),          # both first -> kept 2/2
            (2, chunk_a + " " + chunk_c),          # a dup, c first -> 1/2
            (3, chunk_b),                          # dup of doc1's 2nd chunk -> 0/1
            (4, "short tail only"),                # partial chunk, unique -> 1/1
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["kept_chunks"])
        for r in paragraph_dedup_stats(docs, 20).collect()
    }
    assert out == {1: (2, 2), 2: (2, 1), 3: (1, 0), 4: (1, 1)}


def test_duplicated_span_stats_marks_all_occurrences(spark):
    from prom_etl_db_spark.functions.dedup import duplicated_span_stats

    run = " ".join(f"w{i}" for i in range(20))  # a 20-token run
    docs = spark.createDataFrame(
        [
            (1, run + " unique1 unique2"),   # 3 spans; span0 shared with doc2
            (2, "lead " + run),              # 2 spans; span1 == doc1 span0
            (3, " ".join(f"z{i}" for i in range(25))),  # 6 spans, all unique
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"])
        for r in duplicated_span_stats(docs, 20).collect()
    }
    assert out == {1: (3, 1), 2: (2, 1), 3: (6, 0)}


def test_quantize_int8_endpoints_and_constant_dim(spark):
    from prom_etl_db_spark.functions.similarity import quantize_int8

    emb = spark.createDataFrame(
        [
            (1, [0.0, 5.0, 7.0]),
            (2, [1.0, 5.0, 3.0]),
            (3, [0.5, 5.0, 5.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["id"]: r["codes"] for r in quantize_int8(emb).collect()}
    assert out[1] == [0, 0, 255]     # min -> 0, constant dim -> 0, max -> 255
    assert out[2] == [255, 0, 0]
    assert out[3] == [128, 0, 128]   # midpoint rounds half-up


def test_histogram_fraction_hand_computed(spark):
    from prom_etl_db_spark.operators.promql import histogram_fraction

    # one histogram: cum counts 10@le=10, 30@le=20, 40@le=+Inf
    rows = [
        ({"name": "m", "le": "10"}, 10.0),
        ({"name": "m", "le": "20"}, 30.0),
        ({"name": "m", "le": "+Inf"}, 40.0),
    ]
    buckets = spark.createDataFrame(
        rows, "labels map<string,string>, value double"
    )
    out = histogram_fraction(buckets, 5.0, 15.0).collect()
    # cum(5) = 10*(5/10) = 5; cum(15) = 10 + 20*(5/10) = 20 -> (20-5)/40
    assert out[0]["value"] == pytest.approx(15 / 40)
    assert out[0]["labels"] == {"name": "m"}

    with pytest.raises(ValueError):
        histogram_fraction(buckets, 3.0, 3.0)


def test_paragraph_dedup_rewrite_reassembles_survivors(spark):
    from prom_etl_db_spark.functions.dedup import paragraph_dedup_rewrite

    chunk_a = " ".join(f"a{i}" for i in range(20))
    chunk_b = " ".join(f"b{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, chunk_a + " " + chunk_b),  # both first -> intact
            (2, chunk_b + " " + chunk_a),  # both lost -> empty
            (3, chunk_a + " fresh tail"),  # chunk_a lost, tail kept
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in paragraph_dedup_rewrite(docs, 20).collect()
    }
    assert out[1] == chunk_a + " " + chunk_b
    assert out[2] == ""
    assert out[3] == "fresh tail"


def test_sessionize_exact_gap_boundary_splits_like_streaming(spark):
    # streaming session_window merges on the half-open [t, t+gap): an
    # event at exactly t+gap starts a NEW session — the batch dual must
    # split there too, not merge on strict inequality
    from prom_etl_db_spark.operators.analytics import sessionize

    rows = [
        (1, T0, 9, "view", 1.0, "{}"),
        (2, T0 + timedelta(minutes=30), 9, "view", 1.0, "{}"),  # == gap
        (3, T0 + timedelta(minutes=59), 9, "view", 1.0, "{}"),  # < gap after #2
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    out = sorted(
        sessionize(ev, gap="30 minutes").collect(), key=lambda r: r["session_no"]
    )
    assert [(r["session_no"], r["n_events"]) for r in out] == [(0, 1), (1, 2)]



# -- LTTB downsampling (round 5) ---------------------------------------------


def test_lttb_keeps_endpoints_spike_and_count(spark):
    from datetime import datetime, timedelta

    from prom_etl_db_spark.operators.analytics import lttb_downsample

    t0 = datetime(2024, 1, 2)
    rows = []
    for i in range(40):
        # flat series with one huge spike at i=17
        rows.append((i, t0 + timedelta(minutes=i), 1, "s", 1000.0 if i == 17 else 10.0, "{}"))
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = sorted(lttb_downsample(ev, threshold=6).collect(), key=lambda r: r.pos)
    assert len(out) == 6
    xs = [r.x_ms for r in out]
    assert xs == sorted(xs)
    base_ms = int((t0 - datetime(2024, 1, 1)).total_seconds() * 1000)
    assert out[0].x_ms == base_ms                      # first point kept
    assert out[-1].x_ms == base_ms + 39 * 60_000       # last point kept
    assert any(r.v == 1000 for r in out)               # the spike survives
    # short series: all points pass through untouched
    short = spark.createDataFrame(
        rows[:5], ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    assert len(lttb_downsample(short, threshold=6).collect()) == 5


def test_lttb_tiebreak_prefers_earliest(spark):
    from datetime import datetime, timedelta

    from prom_etl_db_spark.operators.analytics import lttb_downsample

    t0 = datetime(2024, 1, 2)
    # interior points all identical value -> every area in a bucket equal
    # (zero) except where geometry forces it; with a strictly flat series
    # all areas are 0 and the FIRST candidate of each bucket must win
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "s", 5.0, "{}") for i in range(22)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = sorted(lttb_downsample(ev, threshold=6).collect(), key=lambda r: r.pos)
    # buckets over interior 1..20 (20 pts, 4 buckets of 5): first of each
    got_idx = [(r.x_ms // 60_000) - 24 * 60 for r in out]
    assert got_idx == [0, 1, 6, 11, 16, 21]
