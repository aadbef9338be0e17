"""Downstream SQL analytics surface (SURVEY.md §2.C, rows C1-C13).

The reference documents this consumption layer as raw MySQL queries
(`/root/reference/docs/user-guide.md:219-347`,
`/root/reference/scripts/query_gpu_daily.sql:1-28`); here each becomes a
DataFrame builder over the engine's tables. Everything stays declarative so
Catalyst pushes filters/pruning into the scans and whole-stage codegen
covers the aggregations (SURVEY.md §4.2 — none of this surface needs custom
rules).

Functions take the source DataFrame(s) and return an un-collected result
DataFrame. Computed columns are aliased explicitly (driver contract: names
must match the DuckDB oracle).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# -- C1/C10: JSON label extraction & filtering -----------------------------


def label_extract(events: DataFrame) -> DataFrame:
    """C1: pull one key out of the JSON props/labels per row
    (`JSON_UNQUOTE(JSON_EXTRACT(labels,'$.node'))` — query_gpu_daily.sql:14).
    """
    return events.select(
        F.col("event_id"),
        F.col("event_type"),
        F.get_json_object(F.col("props"), "$.k").alias("label_k"),
        F.col("value"),
    )


def label_filter_slice(events: DataFrame, key: str, val: str) -> DataFrame:
    """C10: equality filter on an extracted JSON label
    (user-guide.md:262-272)."""
    return (
        events.where(F.get_json_object(F.col("props"), f"$.{key}") == val)
        .select("event_id", "event_type", "ts", "value")
    )


# -- C2: string split / prefix ---------------------------------------------


def substring_index_prefix(parts: DataFrame) -> DataFrame:
    """C2: ``SUBSTRING_INDEX(name, ' ', 2)`` — first two tokens of a name
    (query_gpu_daily.sql:9-13 uses '-' on node names; the fixture's
    part-name is space-delimited)."""
    return parts.select(
        F.col("p_partkey"),
        F.substring_index(F.col("p_name"), " ", 2).alias("name_prefix"),
    )


# -- C3/C4: grouped aggregates & date bucketing ----------------------------


def hourly_rollup(events: DataFrame) -> DataFrame:
    """C3+C4: per-hour per-type count/avg/min/max (user-guide.md:248-257).

    The avg ships as its exact pieces (decimal sum + count): a rounded
    double average can land exactly on a round-half boundary where Spark
    (HALF_UP on the decimal repr) and a binary-exact engine round apart —
    sf0.1 produces such a group (avg exactly 51.51125)."""
    return (
        events.groupBy(
            F.date_trunc("HOUR", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


# -- C5: time-range predicates ---------------------------------------------


def time_window_scan(events: DataFrame, now: datetime, hours: int = 24) -> DataFrame:
    """C5: last-N-hours scan relative to an explicit ``now``
    (`timestamp >= NOW() - INTERVAL 24 HOUR`, user-guide.md:236-243; the
    fixture is static so ``now`` is frozen, never the wall clock)."""
    lo = F.lit(now) - F.expr(f"INTERVAL {hours} HOURS")
    return events.where(F.col("ts") >= lo).select(
        "event_id", "ts", "event_type", "value"
    )


# -- C6: top-N --------------------------------------------------------------


def latest_n(events: DataFrame, event_type: str, n: int = 100) -> DataFrame:
    """C6 (and A17): ``WHERE query_id=? ORDER BY timestamp DESC LIMIT n``
    (`/root/reference/internal/database/mysql.go:166-213`). event_id breaks
    timestamp ties so the limit is deterministic."""
    return (
        events.where(F.col("event_type") == event_type)
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(n)
        .select("event_id", "ts", "user_id", "value")
    )


# -- C7/C9/C11: the GPU-daily report shape ---------------------------------


def daily_report(events: DataFrame) -> DataFrame:
    """C7+C9+C11: the parameterized daily report
    (query_gpu_daily.sql:1-28): inner per-(label,day) SUM subquery, outer
    projection with ROUND, multi-key ordering. Expressed as DataFrame
    chaining (the derived table is just composition)."""
    inner = (
        events.select(
            F.get_json_object(F.col("props"), "$.k").alias("k"),
            F.to_date(F.col("ts")).alias("day"),
            F.col("value"),
        )
        .groupBy("k", "day")
        .agg(F.sum("value").alias("total_value"))
    )
    return inner.select(
        F.col("k"),
        F.col("day"),
        F.round(F.col("total_value"), 3).alias("total_value"),
    )


# -- C8: conditional aggregation -------------------------------------------


def success_rate(events: DataFrame) -> DataFrame:
    """C8: ``COUNT(CASE WHEN status='success' THEN 1 END)`` + percentage
    (user-guide.md:333-346) — 'error' events play the failure role."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("value") > 10.0, 1)).alias("high_value"),
        F.round(
            100.0 * F.count(F.when(F.col("value") > 10.0, 1)) / F.count(F.lit(1)), 2
        ).alias("high_value_pct"),
    )


# -- C12/C13: freshness & per-key stats ------------------------------------


def per_key_stats(events: DataFrame) -> DataFrame:
    """C12+C13 (and A19/A22): records/earliest/latest/avg per key
    (user-guide.md:277-285)."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("records"),
        F.min("ts").alias("earliest"),
        F.max("ts").alias("latest"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


# -- beyond-ref: sessionization & funnel (batch event analytics) ------------


def sessionize(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Gap-based batch sessionization: a new session starts whenever a
    user's inter-event gap REACHES ``gap`` — the batch dual of the
    streaming ``session_window`` rollup (streaming/jobs.py), whose merge
    interval is half-open [t, t+gap): an event at exactly t+gap starts a
    new session there, so the break test here is >= (a strict > would
    merge exact-boundary events in batch but split them in streaming).

    Two ordered windows per user (lag for the break flag, running sum for
    the session ordinal), then one hash aggregation per (user, session).
    One shuffle on user_id; AQE splits hot users. No driver-side state —
    at 100 TB parallelism is user-cardinality wide.

    Output: (user_id, session_no, session_start, session_end, n_events,
    duration_s).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    gap_interval = F.expr(f"INTERVAL {gap}")
    brk = F.when(
        F.col(ts_col) >= F.lag(ts_col).over(w) + gap_interval, 1
    ).otherwise(0)
    cum = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = events.withColumn("__brk", brk).withColumn(
        "__session_no", F.sum("__brk").over(cum).cast("bigint")
    )
    return sessions.groupBy(user_col, "__session_no").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (
                # NTZ-safe exact micros (Spark 4.1 refuses NTZ→numeric;
                # the session tz is pinned UTC so the bridge cast is exact)
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            ).cast("double")
            / 1e6
        ).alias("duration_s"),
    ).withColumnRenamed("__session_no", "session_no")


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    *,
    window: str = "7d",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """windowFunnel-style sequence matching: per user, the deepest prefix
    of ``steps`` completed as a strictly-increasing-time chain whose span
    fits in ``window`` (measured from the chain's FIRST event).

    Scale shape: ONE hash aggregation collects each user's (ts, step)
    events sorted (array_sort of a collect_list — histories are bounded;
    a user is one Arrow-free JVM row), then a single ``aggregate`` fold
    runs the DP. No joins, no per-level passes, no Python.

    DP state, per level k: the LATEST chain-start time among viable
    chains (a later start maximizes the remaining window headroom —
    extending at time t needs t − start ≤ window), split into two
    classes by the previous step's event time:

    - ``s[k]`` (settled): chains whose level-k event happened at a
      STRICTLY EARLIER timestamp than the event being folded — these are
      extendable now (strict-increase holds).
    - ``p[k]`` (pending): chains whose level-k event shares the CURRENT
      timestamp — extendable only once the fold reaches a later
      timestamp, at which point they merge into settled.

    Tracking only chain starts without the split would let two
    same-timestamp events chain (start < t passes even when the
    previous STEP's event is simultaneous), silently violating the
    strict ordering the oracle (``p.ts > c.ts``) defines.

    Output: (user_id, funnel_level) for users with ≥ 1 ``steps`` event.
    """
    n = len(steps)
    if n < 2:
        raise ValueError("funnel needs at least 2 steps")
    step_map = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i + 1))]
    )
    from prom_etl_db_spark.timeparse import parse_duration

    window_us = int(parse_duration(window).total_seconds() * 1_000_000)

    evs = (
        events.where(F.col(type_col).isin(steps))
        .select(
            F.col(user_col).alias("user_id"),
            F.struct(
                # exact integer micros (NTZ-safe; see sessionize note)
                F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
                step_map[F.col(type_col)].alias("step"),
            ).alias("e"),
        )
    )
    # DP state: (pt = last folded timestamp, s[k]/p[k] = latest
    # chain-start micros reaching level k+1 among settled / pending
    # chains; NULL = unreached). Fold over the time-sorted event structs.
    nulls = F.array(*[F.lit(None).cast("long") for _ in range(n)])
    zero = F.struct(
        F.lit(None).cast("long").alias("pt"),
        nulls.alias("s"),
        nulls.alias("p"),
    )

    def fold(acc, e):
        # timestamp advanced -> pending chains' last events are now
        # strictly in the past: settle them
        adv = acc["pt"].isNull() | (e["t"] > acc["pt"])
        settled = [
            F.when(adv, F.greatest(acc["s"][k], acc["p"][k])).otherwise(acc["s"][k])
            for k in range(n)
        ]
        pend = [
            F.when(adv, F.lit(None).cast("long")).otherwise(acc["p"][k])
            for k in range(n)
        ]
        out_p = []
        for k in range(n):
            if k == 0:
                cond = e["step"] == 1
                upd = F.greatest(pend[0], e["t"])
            else:
                # extend only off SETTLED level-k chains: their last event
                # is strictly earlier than e.t by construction, so the
                # strict-increase check is structural, not a comparison
                prev = settled[k - 1]
                cond = (
                    (e["step"] == k + 1)
                    & prev.isNotNull()
                    & (e["t"] - prev <= F.lit(window_us))
                )
                upd = F.greatest(pend[k], prev)
            out_p.append(F.when(cond, upd).otherwise(pend[k]))
        return F.struct(
            e["t"].alias("pt"),
            F.array(*settled).alias("s"),
            F.array(*out_p).alias("p"),
        )

    folded = (
        evs.groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("es"))
        .select(
            "user_id",
            F.aggregate(F.col("es"), zero, fold).alias("st"),
        )
    )
    reached = [F.greatest(F.col("st")["s"][k], F.col("st")["p"][k]) for k in range(n)]
    level_expr = F.coalesce(
        *[
            F.when(reached[k].isNotNull(), F.lit(k + 1))
            for k in range(n - 1, -1, -1)
        ],
        F.lit(0),
    )
    return folded.select("user_id", level_expr.cast("int").alias("funnel_level"))


# -- LTTB downsampling ------------------------------------------------------


def lttb_downsample(
    events: DataFrame,
    series_col: str = "event_type",
    threshold: int = 20,
    base_ts: datetime = datetime(2024, 1, 1),
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
    the algorithm Grafana/Prometheus dashboards use to draw a 2M-point
    series with 1k pixels): per series, keep first and last points and,
    for each of ``threshold−2`` equal-COUNT buckets of interior points,
    the point maximizing the triangle area against the previously
    selected point and the NEXT bucket's centroid (the last bucket uses
    the final point as its anchor).

    Determinism-by-construction (the driver hash relies on it): the x
    axis is integer milliseconds since ``base_ts`` and values are
    floored to integers, so every centroid SUM is exact in float64
    (rebased ms sums stay ≪ 2^53 at any SF) and every area is computed
    from bit-identical operands with a fixed expression tree — Spark
    and the DuckDB oracle make the identical argmax choice, ties broken
    toward the earliest point.

    Scale posture: the sequential chain (bucket i's choice feeds bucket
    i+1) is per-series, so the implementation is applyInPandas grouped
    by the series key — embarrassingly parallel across series, which is
    the real cardinality axis at 100 TB (millions of series × bounded
    points per dashboard window). Series longer than executor memory
    should be pre-windowed by time range (the dashboard contract)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    # tz-pinned: naive .timestamp() reads the HOST timezone; ts is NTZ so
    # the pandas epoch is zone-free and the rebase must be too
    from datetime import timezone

    base_us = int(base_ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    schema = StructType(
        [
            StructField("series", StringType(), False),
            StructField("pos", IntegerType(), False),
            StructField("x_ms", LongType(), False),
            StructField("v", LongType(), False),
        ]
    )

    def one_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        x = (pdf["ts"].astype("datetime64[us]").astype("int64") - base_us) // 1000
        x = x.to_numpy(dtype=np.int64)
        v = np.floor(pdf["value"].to_numpy(dtype=np.float64) + 0.5).astype(np.int64)
        n, t = len(x), threshold
        s = str(pdf[series_col].iloc[0])
        if n <= t:
            return pd.DataFrame(
                {"series": s, "pos": np.arange(n, dtype=np.int32),
                 "x_ms": x, "v": v}
            )
        nb = t - 2
        # interior point i (0-based 1..n-2) -> bucket (i-1)*nb // (n-2)
        idx = np.arange(1, n - 1, dtype=np.int64)
        bucket = (idx - 1) * nb // (n - 2)
        sel_x, sel_v = [x[0]], [v[0]]
        ax, ay = float(x[0]), float(v[0])
        for b in range(nb):
            cur = idx[bucket == b]
            if b + 1 < nb:
                nxt = idx[bucket == b + 1]
                cx = float(x[nxt].sum()) / len(nxt)
                cy = float(v[nxt].sum()) / len(nxt)
            else:
                cx, cy = float(x[n - 1]), float(v[n - 1])
            bx = x[cur].astype(np.float64)
            by = v[cur].astype(np.float64)
            area = np.abs((ax - cx) * (by - ay) - (ax - bx) * (cy - ay))
            # argmax with earliest-x tiebreak: np.argmax takes the first
            # maximum and cur is in ascending x order
            j = cur[int(np.argmax(area))]
            sel_x.append(int(x[j]))
            sel_v.append(int(v[j]))
            ax, ay = float(x[j]), float(v[j])
        sel_x.append(int(x[n - 1]))
        sel_v.append(int(v[n - 1]))
        return pd.DataFrame(
            {
                "series": s,
                "pos": np.arange(t, dtype=np.int32),
                "x_ms": np.array(sel_x, dtype=np.int64),
                "v": np.array(sel_v, dtype=np.int64),
            }
        )

    cols = events.select(series_col, "ts", "event_id", "value")
    return cols.groupBy(series_col).applyInPandas(one_series, schema)
