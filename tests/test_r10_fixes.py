"""Round-10 regression tests: the ADVICE fixes.

1. ``_TsDupGuard`` — cross-batch duplicate-delta detection upgraded
   from newest-timestamp-only to a bounded retained set + below-horizon
   refusal (r9 ADVICE: a redelivered duplicate of any OLDER
   already-folded point silently double-added into cumulative state).
2. negative-bucket support in ``native_hist_increase``/``rate``
   (driven via the Spark session — see test_r10_neg_increase.py).
"""

from __future__ import annotations

import pandas as pd
import pytest


class _FakeState:
    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _hist_pdf(ts_list):
    return pd.DataFrame({
        "timestamp_ms": ts_list,
        "bucket_counts": [[1, 2] for _ in ts_list],
        "bounds_key": ["0.5,2.0" for _ in ts_list],
        "count": [3 for _ in ts_list],
        "sum": [6.0 for _ in ts_list],
    })


def test_dup_guard_catches_older_duplicate_across_batches():
    """The r9 guard compared only the NEWEST checkpointed timestamp;
    a redelivered duplicate of an older folded point double-added.
    Any retained timestamp is caught — and (r11, the poison-pill fix)
    the duplicate is EXCLUDED and counted, never raised: a raise on a
    stream replays the same batch after restart and dies again."""
    from prom_etl_db_spark.streaming.stateful import _fold_delta_hist

    state = _FakeState()
    (out1,) = _fold_delta_hist(
        ("s",), iter([_hist_pdf([100, 200, 300])]), state)
    assert list(out1["cum_count"]) == [3, 6, 9]
    assert list(out1["n_dropped"]) == [0, 0, 0]
    # batch 2 redelivers ts=100 — older than the newest (300):
    # excluded (no row emitted for it), counted, state unchanged
    (out2,) = _fold_delta_hist(("s",), iter([_hist_pdf([100])]), state)
    assert len(out2) == 0
    assert state.get[2] == 9          # cum_count did NOT double-add
    assert state.get[6] == 1          # the drop is visible in state
    # ...and the next legal arrival's row carries the cumulative count
    (out3,) = _fold_delta_hist(("s",), iter([_hist_pdf([400])]), state)
    assert list(out3["cum_count"]) == [12]
    assert list(out3["n_dropped"]) == [1]


def test_dup_guard_still_folds_distinct_late_arrival():
    """A legal DISTINCT late arrival (older than the newest but not a
    duplicate) must still fold — addition is order-independent."""
    from prom_etl_db_spark.streaming.stateful import _fold_delta_hist

    state = _FakeState()
    list(_fold_delta_hist(("s",), iter([_hist_pdf([100, 300])]), state))
    (out,) = _fold_delta_hist(("s",), iter([_hist_pdf([200])]), state)
    assert list(out["cum_count"]) == [9]
    # and the retained set now holds all three
    assert sorted(state.get[5]) == [100, 200, 300]


def test_dup_guard_excludes_below_full_horizon():
    """Once the retained set is full, an arrival OLDER than its minimum
    is indistinguishable from a redelivered duplicate — excluded and
    counted (r11: visible-not-fatal; silently folding it would
    reintroduce the double-add hazard, raising would wedge the
    stream)."""
    from prom_etl_db_spark.streaming.stateful import (
        _DUP_HORIZON,
        _fold_delta_hist,
    )

    state = _FakeState()
    ts = [1000 + 10 * i for i in range(_DUP_HORIZON)]
    list(_fold_delta_hist(("s",), iter([_hist_pdf(ts)]), state))
    assert len(state.get[5]) == _DUP_HORIZON
    (out,) = _fold_delta_hist(("s",), iter([_hist_pdf([500])]), state)
    assert len(out) == 0 and state.get[6] == 1
    # within the horizon (distinct, newer than the floor) still folds
    (out,) = _fold_delta_hist(("s",), iter([_hist_pdf([1005])]), state)
    assert len(out) == 1 and list(out["n_dropped"]) == [1]
    # the retained set stays bounded after trimming
    assert len(state.get[5]) == _DUP_HORIZON


def test_dup_guard_exp_fold_same_contract():
    """The exponential-histogram fold shares the guard."""
    from prom_etl_db_spark.streaming.stateful import _fold_delta_exp_hist

    def pdf(ts_list):
        return pd.DataFrame({
            "timestamp_ms": ts_list,
            "scale": [2 for _ in ts_list],
            "pos_offset": [0 for _ in ts_list],
            "pos_counts": [[1, 1] for _ in ts_list],
            "neg_offset": [0 for _ in ts_list],
            "neg_counts": [[] for _ in ts_list],
            "zero_count": [0 for _ in ts_list],
            "count": [2 for _ in ts_list],
            "sum": [4.0 for _ in ts_list],
        })

    state = _FakeState()
    list(_fold_delta_exp_hist(("s",), iter([pdf([100, 300])]), state))
    # redelivered ts=100: excluded-and-counted, no raise (r11)
    (out_dup,) = _fold_delta_exp_hist(("s",), iter([pdf([100])]), state)
    assert len(out_dup) == 0 and state.get[10] == 1
    (out,) = _fold_delta_exp_hist(("s",), iter([pdf([200])]), state)
    assert list(out["cum_count"]) == [6]
    assert list(out["n_dropped"]) == [1]


def test_exemplar_report_fold_exemplar_only_first_batch():
    """An exemplar-only first batch (no samples yet) must hold the
    exemplar PENDING and emit no report row; the window materializes
    with the first samples and the pending exemplar folds in."""
    from prom_etl_db_spark.streaming.stateful import _fold_exemplar_report

    state = _FakeState()
    b1 = pd.DataFrame({"kind": ["e"], "timestamp_ms": [150],
                       "value": [5.0]})
    (out1,) = _fold_exemplar_report(("s",), iter([b1]), state)
    assert len(out1) == 0
    b2 = pd.DataFrame({"kind": ["s", "s"],
                       "timestamp_ms": [100, 300],
                       "value": [1.0, 4.0]})
    (out2,) = _fold_exemplar_report(("s",), iter([b2]), state)
    assert out2["n_exemplars"].iloc[0] == 1
    assert out2["increase"].iloc[0] == 3.0
    assert out2["n_stale_exemplars"].iloc[0] == 0


def test_exemplar_report_fold_pending_overflow_refuses():
    from prom_etl_db_spark.streaming.stateful import (
        _EX_PENDING_CAP,
        _fold_exemplar_report,
    )

    state = _FakeState()
    n = _EX_PENDING_CAP + 1
    b = pd.DataFrame({"kind": ["e"] * n,
                      "timestamp_ms": list(range(1000, 1000 + n)),
                      "value": [1.0] * n})
    with pytest.raises(ValueError, match="pending"):
        list(_fold_exemplar_report(("s",), iter([b]), state))
