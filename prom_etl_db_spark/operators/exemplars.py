"""Exemplar-consuming analytics (r10 — VERDICT r9 stretch task #8).

All four ingestion formats (remote-write v1/v2, OTLP, OpenMetrics text)
land exemplars in one trace-link shape: the series identity plus the
exemplar's own labels (trace_id/span_id), value, and timestamp. This
module adds the operator the ecosystem actually runs on that table —
the exemplar → rate-window join behind Grafana's "show traces for this
spike" panel and the trace-sampling-bias report an observability team
uses to check whether its exemplar sampling keeps up with traffic.

Reference tie-in: the reference stores raw samples and delegates all
query math (/root/reference/internal/prometheus/client.go); exemplar
analytics has no reference twin — this is ecosystem surface built on
the repo's own decode layer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exemplar_rate_report(
    samples: DataFrame,
    exemplars: DataFrame,
    *,
    series_cols: Sequence[str] = ("push_id", "metric_name"),
) -> DataFrame:
    """Per series: the counter rate window joined with the exemplars
    that land INSIDE it, plus the sampling-bias numbers.

    ``samples``: (series_cols..., timestamp_ms long, value double) —
    cumulative counter samples. ``exemplars``: (series_cols...,
    value double, timestamp_ms long) — the decoders' trace-link rows.

    Semantics:
    - the rate window per series is [first_ts, last_ts] with the
      counter increase between the endpoints (a drop is a reset →
      the increase is the last value verbatim, the scalar rule);
    - an exemplar belongs to the window iff its timestamp lies in
      [first_ts, last_ts] INCLUSIVE (Prometheus exemplar storage
      attaches exemplars to scrapes inside the queried range; ones
      outside — stale traces from before the window — are excluded);
    - ``sampling_ratio`` = n_exemplars / increase: the fraction of
      counted events that carry a trace link. A healthy exemplar
      pipeline keeps this roughly constant across series; a series
      whose ratio collapses is under-sampled (the bias the report
      exists to surface). NULL when the increase is 0 (no events —
      a ratio would be fabricated);
    - series with NO in-window exemplars stay in the report with
      n_exemplars = 0 and NULL value stats (dropping them would hide
      exactly the under-sampled series).

    Plan: one hash agg per input (series-keyed endpoint snapshot;
    series-keyed exemplar stats after an equi-join on the series key
    with the range filter riding the join) — two shuffles total, both
    on the series key, no driver collect. The exemplar side is the
    SPARSE side (sampled traces); AQE broadcast-joins it when small.
    """
    by = list(series_cols)
    win = samples.groupBy(*by).agg(
        F.min_by(F.struct("timestamp_ms", "value"), "timestamp_ms")
        .alias("a"),
        F.max_by(F.struct("timestamp_ms", "value"), "timestamp_ms")
        .alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    reset = b["value"] < a["value"]
    win = win.select(
        *by,
        a["timestamp_ms"].alias("first_ts"),
        b["timestamp_ms"].alias("last_ts"),
        reset.alias("reset"),
        F.when(reset, b["value"]).otherwise(b["value"] - a["value"])
        .alias("increase"),
    ).withColumn(
        "rate_per_sec",
        F.try_divide(
            F.col("increase"),
            (F.col("last_ts") - F.col("first_ts")).cast("double") / 1000.0,
        ),
    )
    ex = exemplars.select(
        *by,
        F.col("value").alias("__ex_value"),
        F.col("timestamp_ms").alias("__ex_ts"),
    )
    joined = win.join(ex, on=by, how="left").withColumn(
        "__in",
        (F.col("__ex_ts") >= F.col("first_ts"))
        & (F.col("__ex_ts") <= F.col("last_ts")),
    )
    inw = F.when(F.col("__in"), F.col("__ex_value"))
    rep = joined.groupBy(
        *by, "first_ts", "last_ts", "reset", "increase", "rate_per_sec"
    ).agg(
        F.count(inw).alias("n_exemplars"),
        F.min(inw).alias("exemplar_min"),
        F.max(inw).alias("exemplar_max"),
        F.avg(inw).alias("exemplar_mean"),
    )
    return rep.withColumn(
        "sampling_ratio",
        F.when(
            F.col("increase") > 0,
            F.col("n_exemplars").cast("double") / F.col("increase"),
        ),
    )
