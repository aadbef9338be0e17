"""Round-10: the exemplar → rate-window join
(`operators/exemplars.exemplar_rate_report`) — seams the gate query's
closed-form fixture can't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

T0 = 1706572800000


def _samples(spark, rows):
    return spark.createDataFrame(
        [Row(push_id=p, metric_name="m", timestamp_ms=t, value=v)
         for p, t, v in rows],
        "push_id long, metric_name string, timestamp_ms long, value double")


def _exemplars(spark, rows):
    return spark.createDataFrame(
        [Row(push_id=p, metric_name="m", value=v, timestamp_ms=t)
         for p, t, v in rows],
        "push_id long, metric_name string, value double, timestamp_ms long")


def test_series_without_exemplars_stays_in_report(spark):
    """A series with NO in-window exemplars keeps its row (n=0, NULL
    stats) — dropping it would hide exactly the under-sampled series
    the bias report exists to surface."""
    from prom_etl_db_spark.operators.exemplars import exemplar_rate_report

    s = _samples(spark, [(1, T0, 2.0), (1, T0 + 300000, 8.0),
                         (2, T0, 1.0), (2, T0 + 300000, 4.0)])
    e = _exemplars(spark, [(1, T0 + 100, 5.0),
                           (2, T0 - 100, 9.0)])     # outside for push 2
    rep = {r["push_id"]: r for r in exemplar_rate_report(s, e).collect()}
    assert rep[1]["n_exemplars"] == 1
    assert rep[1]["exemplar_mean"] == pytest.approx(5.0)
    assert rep[1]["sampling_ratio"] == pytest.approx(1 / 6.0)
    assert rep[2]["n_exemplars"] == 0
    assert rep[2]["exemplar_mean"] is None
    assert rep[2]["sampling_ratio"] == pytest.approx(0.0)


def test_reset_uses_last_value_verbatim(spark):
    from prom_etl_db_spark.operators.exemplars import exemplar_rate_report

    s = _samples(spark, [(1, T0, 10.0), (1, T0 + 300000, 3.0)])
    e = _exemplars(spark, [])
    (r,) = exemplar_rate_report(s, e).collect()
    assert r["reset"] is True and r["increase"] == 3.0
    assert r["rate_per_sec"] == pytest.approx(0.01)


def test_zero_increase_gives_null_ratio(spark):
    """Flat counter: increase 0 → sampling_ratio NULL (a ratio over
    zero events would be fabricated), exemplars still counted."""
    from prom_etl_db_spark.operators.exemplars import exemplar_rate_report

    s = _samples(spark, [(1, T0, 5.0), (1, T0 + 300000, 5.0)])
    e = _exemplars(spark, [(1, T0 + 1000, 2.0)])
    (r,) = exemplar_rate_report(s, e).collect()
    assert r["increase"] == 0.0 and r["sampling_ratio"] is None
    assert r["n_exemplars"] == 1


def test_window_bounds_inclusive(spark):
    """Exemplars AT the endpoints belong to the window (the endpoints
    are observed scrapes)."""
    from prom_etl_db_spark.operators.exemplars import exemplar_rate_report

    s = _samples(spark, [(1, T0, 1.0), (1, T0 + 300000, 2.0)])
    e = _exemplars(spark, [(1, T0, 1.5), (1, T0 + 300000, 2.5),
                           (1, T0 + 300001, 9.0)])
    (r,) = exemplar_rate_report(s, e).collect()
    assert r["n_exemplars"] == 2
    assert r["exemplar_min"] == 1.5 and r["exemplar_max"] == 2.5
