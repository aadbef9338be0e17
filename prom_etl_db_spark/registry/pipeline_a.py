"""SURVEY.md §2.A — pipeline operators (ingest normalization, scans,
retention, backfill idempotency, the relative-time DSL grid)."""

from __future__ import annotations

from datetime import datetime, timedelta  # noqa: F401

import pandas as pd  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from prom_etl_db_spark import store  # noqa: F401
from prom_etl_db_spark.functions import (  # noqa: F401
    clustering,
    decontam,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
from prom_etl_db_spark.operators import analytics, promql  # noqa: F401
from prom_etl_db_spark.registry.core import (  # noqa: F401
    FLAGSHIP_DAY,
    NOW,
    _event_samples,
    _events,
    _events_wide,
    _t,
    register,
)
from prom_etl_db_spark.timeparse import RelativeTimeParser  # noqa: F401


# =========================================================================
# A — pipeline operators (ingest normalization, scans, idempotency)
# =========================================================================


@register(
    "ingest_normalize_events",
    oracle="""
SELECT 'events_ingest' AS query_id, event_type AS metric_name,
       json_extract_string(props,'$.k') AS label_k,
       CAST(user_id AS VARCHAR) AS label_user,
       value, CAST(ts AS TIMESTAMP) AS timestamp, 'instant' AS result_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS collected_at,
       CAST(date_trunc('day', ts) AS DATE) AS collected_date
FROM events
""",
)
def ingest_normalize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8-A13 composite: events → MetricRecord shape (label map exploded to
    scalar columns for the hash compare — maps aren't hash-stable across
    engines)."""
    from prom_etl_db_spark.ingest import events_as_metric_records

    rec = events_as_metric_records(_events(spark, sf_dir))
    return rec.select(
        "query_id",
        "metric_name",
        F.element_at("labels", "k").alias("label_k"),
        F.element_at("labels", "user_id").alias("label_user"),
        "value",
        "timestamp",
        "result_type",
        "collected_at",
        "collected_date",
    )


@register(
    "collected_at_sameday_range",
    oracle="""
SELECT TIMESTAMP '2024-01-30 00:00:00' AS collected_at, count(*) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-30 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
""",
)
def collected_at_sameday_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: a same-day range query (yesterday → yesterday_end, now frozen at
    2024-01-31) buckets every point to that day's start
    (`calculateCollectedAt`, executor.go:414-436)."""
    from prom_etl_db_spark.ingest import collected_at_col

    day0, day1 = FLAGSHIP_DAY, FLAGSHIP_DAY + timedelta(days=1)
    ev = _events(spark, sf_dir).where(
        (F.col("ts") >= F.lit(day0)) & (F.col("ts") < F.lit(day1))
    )
    tagged = ev.withColumn(
        "collected_at",
        collected_at_col(
            F.col("ts"),
            "range",
            now=NOW,
            start_expr="yesterday",
            end_expr="yesterday_end",
        ),
    )
    return tagged.groupBy("collected_at").agg(F.count(F.lit(1)).alias("n"))


@register(
    "latest_n_scan",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events
WHERE event_type = 'click'
ORDER BY ts DESC, event_id DESC LIMIT 100
""",
)
def latest_n_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17/C6: WHERE key ORDER BY timestamp DESC LIMIT n (mysql.go:166-213)."""
    return analytics.latest_n(_events(spark, sf_dir), "click", 100)


@register(
    "metrics_count",
    oracle="SELECT count(*) AS records FROM events WHERE event_type = 'view'",
)
def metrics_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19: COUNT(*) per key (mysql.go:262-272)."""
    return (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .agg(F.count(F.lit(1)).alias("records"))
    )


@register(
    "table_stats",
    oracle="""
SELECT 'events' AS table_name, count(*) AS n FROM events
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
""",
)
def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22: whitelisted per-table row counts (mysql.go:317-349)."""
    parts = [
        _events(spark, sf_dir).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("events").alias("table_name"), "n"
        ),
        _t(spark, sf_dir, "orders").agg(
            F.count(F.lit(1)).alias("n")
        ).select(F.lit("orders").alias("table_name"), "n"),
        _t(spark, sf_dir, "lineitem").agg(
            F.count(F.lit(1)).alias("n")
        ).select(F.lit("lineitem").alias("table_name"), "n"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "retention_horizon",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
GROUP BY CAST(date_trunc('day', ts) AS DATE)
""",
)
def retention_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20 semantics: rows surviving `collected_at >= cutoff` per day
    (CleanupOldMetrics keeps the complement, mysql.go:275-289)."""
    return (
        _events(spark, sf_dir)
        .where(F.col("ts") >= F.lit(datetime(2024, 1, 15)))
        .groupBy(F.to_date(F.date_trunc("DAY", F.col("ts"))).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "backfill_skip_existing",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM events x
  WHERE x.ts < TIMESTAMP '2024-01-15 00:00:00'
    AND x.event_type = e.event_type
    AND date_trunc('day', x.ts) = date_trunc('day', e.ts)
)
GROUP BY CAST(date_trunc('day', ts) AS DATE)
""",
)
def backfill_skip_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A26: idempotent backfill — incoming (key, day) slices already present
    are skipped via a broadcast left_anti join (repair/main.go:557-576)."""
    ev = _events(spark, sf_dir).withColumn(
        "day", F.to_date(F.date_trunc("DAY", F.col("ts")))
    )
    existing = (
        ev.where(F.col("ts") < F.lit(datetime(2024, 1, 15)))
        .select("event_type", "day")
        .distinct()
    )
    surviving = ev.join(F.broadcast(existing), ["event_type", "day"], "left_anti")
    return surviving.groupBy("day").agg(F.count(F.lit(1)).alias("n"))


@register(
    "timeparse_grid",
    oracle="""
SELECT * FROM (VALUES
  ('now',            TIMESTAMP '2024-01-31 00:00:00'),
  ('today',          TIMESTAMP '2024-01-31 00:00:00'),
  ('today_end',      TIMESTAMP '2024-01-31 23:59:59.999999'),
  ('yesterday',      TIMESTAMP '2024-01-30 00:00:00'),
  ('yesterday_end',  TIMESTAMP '2024-01-30 23:59:59.999999'),
  ('last_week',      TIMESTAMP '2024-01-21 00:00:00'),
  ('last_week_end',  TIMESTAMP '2024-01-27 23:59:59.999999'),
  ('last_month',     TIMESTAMP '2023-12-01 00:00:00'),
  ('last_month_end', TIMESTAMP '2023-12-31 23:59:59.999999'),
  ('last_quarter',   TIMESTAMP '2023-10-01 00:00:00'),
  ('last_year',      TIMESTAMP '2023-01-01 00:00:00'),
  ('today@06:30',    TIMESTAMP '2024-01-31 06:30:00'),
  ('yesterday@23:59:59', TIMESTAMP '2024-01-30 23:59:59'),
  ('-1d',            TIMESTAMP '2024-01-30 00:00:00'),
  ('-1h30m',         TIMESTAMP '2024-01-30 22:30:00'),
  ('+2h',            TIMESTAMP '2024-01-31 02:00:00'),
  ('now-1h',         TIMESTAMP '2024-01-30 23:00:00'),
  ('-1w',            TIMESTAMP '2024-01-24 00:00:00')
) AS t(expr, resolved)
""",
)
def timeparse_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: the documented relative-time grammar resolved against a frozen
    now (2024-01-31 00:00, a Wednesday) — oracle rows are hand-computed
    expectations (parser.go:58-247 + user-guide.md:132-167 superset)."""
    parser = RelativeTimeParser(NOW)
    exprs = [
        "now", "today", "today_end", "yesterday", "yesterday_end",
        "last_week", "last_week_end", "last_month", "last_month_end",
        "last_quarter", "last_year", "today@06:30", "yesterday@23:59:59",
        "-1d", "-1h30m", "+2h", "now-1h", "-1w",
    ]
    rows = [(e, parser.parse(e)) for e in exprs]
    return spark.createDataFrame(rows, "expr string, resolved timestamp")




@register(
    "remote_write_decode",
    oracle="""
SELECT event_id AS push_id,
       event_type AS metric_name,
       CAST(user_id AS VARCHAR) AS user_label,
       value,
       CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) * 1000 AS BIGINT) AS timestamp_ms
FROM events
""",
)
def remote_write_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension (r6): Prometheus REMOTE-WRITE ingestion — the push
    half of the ecosystem the reference pulls from
    (/root/reference/internal/prometheus/client.go consumes the query
    API; remote_write_spec is what Prometheus itself emits). Each event
    becomes one snappy-block-compressed protobuf WriteRequest built by
    the from-scratch encoder (fixture role), then the REAL decoder —
    from-scratch snappy block format + proto wire walk, zero libraries
    — recovers (metric, labels, value, ts). Doubles ride fixed64 so the
    roundtrip is BIT-exact and the oracle compares raw event values;
    timestamps are exact int64 ms. Plan: two Arrow-batched stages
    (encode fixture, decode), zero shuffle, per-payload parallel — the
    shape of a fleet's pushes landing in object storage. See
    functions/remote_write.py (corrupt-stream fuzz gates in
    tests/test_remote_write.py)."""
    from pyspark.sql.types import BinaryType

    from prom_etl_db_spark.functions import remote_write as RW

    # ts is TIMESTAMP_NTZ: TZ-free epoch reconstruction (the calendar
    # family's pattern), second resolution as remote-write agents send
    t = F.col("ts")
    epoch_s = (
        F.datediff(t.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + F.hour(t).cast("long") * 3600
        + F.minute(t).cast("long") * 60
        + F.second(t).cast("long")
    )
    ev = _events_wide(spark, sf_dir).select(
        "event_id", "event_type", "user_id", "value",
        (epoch_s * 1000).cast("long").alias("ts_ms"),
    )

    def build(name: pd.Series, user: pd.Series, val: pd.Series, ts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                RW.snappy_compress(
                    RW.encode_write_request(
                        [
                            {
                                "labels": {"__name__": n, "user": str(u)},
                                "samples": [(float(v), int(t))],
                            }
                        ]
                    )
                )
                for n, u, v, t in zip(name, user, val, ts)
            ]
        )

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "user_id", "value", "ts_ms").alias("body"),
    )
    out = RW.remote_write_samples(payloads)
    return out.select(
        "push_id",
        "metric_name",
        F.col("labels")["user"].alias("user_label"),
        "value",
        "timestamp_ms",
    )


@register(
    "relabel_pipeline",
    oracle="""
SELECT event_id,
  event_type AS name,
  CAST(user_id AS VARCHAR) AS user,
  CASE WHEN event_type = 'purchase' THEN CAST(user_id AS VARCHAR) END AS pu,
  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 17, 16))::UBIGINT % 16
       AS VARCHAR) AS shard,
  coalesce(json_extract_string(props, '$.k'), '') AS meta_k,
  CAST(CASE WHEN event_type = 'purchase' THEN 6 ELSE 5 END AS INT) AS n_labels
FROM events
WHERE event_type IN ('purchase', 'click')
""",
)
def relabel_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension (r6): Prometheus relabel_configs — the scrape
    pipeline's universal label rewrite, applied rule-by-rule exactly
    as Prometheus does (anchored regexes, $N expansion, empty
    expansion deletes, hashmod = BigEndian.Uint64(md5[8:16]) % m).
    Five rules exercise five actions: keep (purchase|click), replace
    (capture the user off purchase series into 'pu'), hashmod (16-way
    'shard' — the horizontal-sharding rule; the oracle reproduces the
    Go hash algebra bit-for-bit in DuckDB integer ops), labelmap
    (meta_* copies), labeldrop (tmp_* scrape scaffolding). Output is
    flattened label columns + the final label-set size, so the oracle
    states every rule's closed form. Plan: pure Column HOFs over the
    labels map, whole-stage codegen, filters pushed down, zero
    Python. See operators/relabel.py."""
    from prom_etl_db_spark.operators.relabel import RelabelConfig as C
    from prom_etl_db_spark.operators.relabel import apply_relabel

    ev = _events(spark, sf_dir)
    samples = ev.select(
        "event_id",
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("user"), F.lit("k"), F.lit("tmp_trace")),
            F.array(
                F.col("event_type"),
                F.col("user_id").cast("string"),
                F.coalesce(F.get_json_object("props", "$.k"), F.lit("")),
                F.concat(F.lit("x"), F.col("event_id").cast("string")),
            ),
        ).alias("labels"),
    )
    out = apply_relabel(
        samples,
        [
            C(action="keep", source_labels=("__name__",), regex="purchase|click"),
            C(
                action="replace",
                source_labels=("__name__", "user"),
                separator="/",
                regex="(purchase)/(.*)",
                target_label="pu",
                replacement="$2",
            ),
            C(action="hashmod", source_labels=("user",), target_label="shard", modulus=16),
            C(action="labelmap", regex="(k)", replacement="meta_$1"),
            C(action="labeldrop", regex="tmp_.*"),
        ],
    )
    return out.select(
        "event_id",
        F.col("labels")["__name__"].alias("name"),
        F.col("labels")["user"].alias("user"),
        F.col("labels")["pu"].alias("pu"),
        F.col("labels")["shard"].alias("shard"),
        F.col("labels")["meta_k"].alias("meta_k"),
        F.size("labels").cast("int").alias("n_labels"),
    )


@register(
    "metrics_pipeline_v2",
    oracle="""
SELECT event_type AS name,
  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 17, 16))::UBIGINT % 8
       AS VARCHAR) AS shard,
  CAST(count(*) AS BIGINT) AS n,
  round(sum(value), 4) AS sum_value
FROM events
WHERE event_type IN ('purchase', 'click')
GROUP BY 1, 2
""",
)
def metrics_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-arc FLAGSHIP v2 (r6): the PUSH ingestion path composed end to
    end — remote-write payloads (snappy block + protobuf WriteRequest,
    decoded by the real from-scratch wire walk) → Prometheus
    relabel_configs (keep purchase|click, hashmod 8-way shard) → the
    per-(metric, shard) rollup a sharded TSDB router runs. Each stage
    is individually oracle-gated (remote_write_decode,
    relabel_pipeline); this query proves the composition, with the
    oracle restating the whole chain as closed forms over events (the
    crawl_pipeline_v1 pattern). Values survive the wire BIT-exactly
    (fixed64), so only the final sum is rounded (engine summation
    order)."""
    from pyspark.sql.types import BinaryType

    from prom_etl_db_spark.functions import remote_write as RW
    from prom_etl_db_spark.operators.relabel import RelabelConfig as C
    from prom_etl_db_spark.operators.relabel import apply_relabel

    ev = _events_wide(spark, sf_dir).select(
        "event_id", "event_type", "user_id", "value"
    )

    def build(name: pd.Series, user: pd.Series, val: pd.Series) -> pd.Series:
        return pd.Series(
            [
                RW.snappy_compress(
                    RW.encode_write_request(
                        [
                            {
                                "labels": {"__name__": n, "user": str(u)},
                                "samples": [(float(v), 1706572800000)],
                            }
                        ]
                    )
                )
                for n, u, v in zip(name, user, val)
            ]
        )

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "user_id", "value").alias("body"),
    )
    samples = RW.remote_write_samples(payloads)
    labeled = samples.select(
        "push_id",
        "value",
        F.map_concat(
            F.create_map(F.lit("__name__"), F.col("metric_name")), F.col("labels")
        ).alias("labels"),
    )
    routed = apply_relabel(
        labeled,
        [
            C(action="keep", source_labels=("__name__",), regex="purchase|click"),
            C(action="hashmod", source_labels=("user",), target_label="shard", modulus=8),
        ],
    )
    return (
        routed.groupBy(
            F.col("labels")["__name__"].alias("name"),
            F.col("labels")["shard"].alias("shard"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


_HRW_NODES = ["ing-a", "ing-b", "ing-c", "ing-d", "ing-e"]
_HRW_STRUCTS_SQL = ", ".join(
    f"struct_pack(w := ('0x' || substr(md5('hrw-{n}-' || CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT,"
    f" n := '{n}')"
    for n in _HRW_NODES
)


@register(
    "scrape_target_rendezvous",
    oracle=f"""
SELECT user_id, list_max([{_HRW_STRUCTS_SQL}]).n AS node
FROM (SELECT DISTINCT user_id FROM events)
""",
)
def scrape_target_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension (r6): rendezvous (highest-random-weight) sharding —
    the consistent alternative to hashmod for assigning scrape targets
    / series to ingesters: node = argmax md5(node, key), so removing a
    node reassigns ONLY its own keys (minimal disruption; the unit
    test pins that property, and the 5-node assignment here is
    replayed by DuckDB's greatest() over the same (weight, node)
    structs — one argmax, two engines). Pure Column: greatest() over
    per-node structs, zero shuffle beyond the distinct."""
    from prom_etl_db_spark.operators.relabel import rendezvous_assign

    users = _events(spark, sf_dir).select("user_id").distinct()
    return users.select(
        "user_id",
        rendezvous_assign(F.col("user_id").cast("string"), _HRW_NODES).alias("node"),
    )


@register(
    "otlp_metrics_decode",
    oracle="""
SELECT event_id AS push_id,
  'svc-' || CAST(user_id % 4 AS BIGINT) AS service,
  'app' AS scope_name,
  event_type AS metric_name,
  CASE WHEN event_id % 2 = 0 THEN 'gauge' ELSE 'sum' END AS data_type,
  CAST(CASE WHEN event_id % 2 = 1 THEN 2 END AS INT) AS temporality,
  CASE WHEN event_id % 2 = 1 THEN TRUE END AS is_monotonic,
  CAST(user_id AS VARCHAR) AS user_attr,
  CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) * 1000000000 AS BIGINT)
    AS time_unix_nano,
  CASE WHEN event_id % 2 = 0 THEN value END AS value_double,
  CAST(CASE WHEN event_id % 2 = 1 THEN user_id END AS BIGINT) AS value_int
FROM events
""",
)
def otlp_metrics_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension (r7, VERDICT r6 task #4): OTLP metrics ingestion —
    the OTHER push protocol of the reference's ecosystem (Prometheus
    accepts OTLP on /api/v1/otlp/v1/metrics; the reference's pull
    client is internal/prometheus/client.go). Each event becomes one
    ExportMetricsServiceRequest built by the fixture encoder — even
    event_ids a GAUGE point carrying the event value as fixed64
    as_double (BIT-exact on the wire), odd event_ids a cumulative
    monotonic SUM carrying user_id as sfixed64 as_int (exact) — and
    every third payload is additionally gzip-compressed to exercise
    the OTLP/HTTP content-encoding sniff. The REAL decoder (the same
    from-scratch proto3 wire walk as remote-write, one more message
    schema: resource → scope → metric → number data points) recovers
    resource attrs, scope, metric identity, sum temporality/
    monotonicity, point attrs and the typed values; the oracle
    restates all of it as closed forms over events. Plan: two
    Arrow-batched stages (encode fixture, decode), zero shuffle,
    per-payload parallel — OTLP exporters batch one request per
    export interval per agent. See functions/otlp.py (corrupt-stream
    fuzz gates in tests/test_otlp.py)."""
    import gzip as _gzip

    from pyspark.sql.types import BinaryType

    from prom_etl_db_spark.functions import otlp as OT

    t = F.col("ts")
    epoch_s = (
        F.datediff(t.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + F.hour(t).cast("long") * 3600
        + F.minute(t).cast("long") * 60
        + F.second(t).cast("long")
    )
    ev = _events_wide(spark, sf_dir).select(
        "event_id", "event_type", "user_id", "value",
        (epoch_s * 1_000_000_000).cast("long").alias("ts_ns"),
    )

    def build(
        eid: pd.Series, name: pd.Series, user: pd.Series,
        val: pd.Series, ts: pd.Series,
    ) -> pd.Series:
        out = []
        for e, n, u, v, tns in zip(eid, name, user, val, ts):
            if int(e) % 2 == 0:
                metric = {
                    "name": n, "unit": "1", "type": "gauge",
                    "points": [{"attrs": {"user": str(u)},
                                "time_unix_nano": int(tns),
                                "value": float(v)}],
                }
            else:
                metric = {
                    "name": n, "unit": "1", "type": "sum",
                    "temporality": 2, "is_monotonic": True,
                    "points": [{"attrs": {"user": str(u)},
                                "time_unix_nano": int(tns),
                                "value": int(u)}],
                }
            req = OT.encode_export_metrics(
                [{
                    "resource": {"service.name": f"svc-{int(u) % 4}"},
                    "scopes": [{"name": "app", "metrics": [metric]}],
                }]
            )
            if int(e) % 3 == 0:
                req = _gzip.compress(req, compresslevel=1)
            out.append(req)
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_id", "event_type", "user_id", "value", "ts_ns").alias("body"),
    )
    out = OT.otlp_samples(payloads)
    return out.select(
        "push_id",
        F.col("resource")["service.name"].alias("service"),
        "scope_name",
        "metric_name",
        "data_type",
        "temporality",
        "is_monotonic",
        F.col("attrs")["user"].alias("user_attr"),
        "time_unix_nano",
        "value_double",
        "value_int",
    )


@register(
    "metrics_pipeline_v3",
    oracle="""
SELECT event_type AS name,
  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 17, 16))::UBIGINT % 8
       AS VARCHAR) AS shard,
  CAST(count(*) AS BIGINT) AS n,
  round(sum(value), 4) AS sum_value
FROM events
WHERE event_type IN ('purchase', 'click')
GROUP BY 1, 2
""",
)
def metrics_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-arc FLAGSHIP v3 (r7): the OTLP push path composed end to end —
    gauge ExportMetricsServiceRequests (proto3 wire walk, values
    bit-exact on fixed64) → attrs promoted into the Prometheus label
    shape → relabel_configs (keep purchase|click, hashmod 8-way shard)
    → the per-(metric, shard) rollup a sharded TSDB router runs: the
    same downstream as metrics_pipeline_v2, proving the two push
    protocols land in ONE set of operators. Each stage is individually
    oracle-gated (otlp_metrics_decode, relabel_pipeline); the oracle
    restates the chain as closed forms over events. Only the final sum
    is rounded (engine summation order)."""
    from pyspark.sql.types import BinaryType

    from prom_etl_db_spark.functions import otlp as OT
    from prom_etl_db_spark.operators.relabel import RelabelConfig as C
    from prom_etl_db_spark.operators.relabel import apply_relabel

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id", "value")

    def build(name: pd.Series, user: pd.Series, val: pd.Series) -> pd.Series:
        return pd.Series(
            [
                OT.encode_export_metrics(
                    [{
                        "resource": {"service.name": "push-gw"},
                        "scopes": [{
                            "name": "app",
                            "metrics": [{
                                "name": n, "type": "gauge",
                                "points": [{"attrs": {"user": str(u)},
                                            "time_unix_nano": 1706572800_000000000,
                                            "value": float(v)}],
                            }],
                        }],
                    }]
                )
                for n, u, v in zip(name, user, val)
            ]
        )

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_type", "user_id", "value").alias("body"),
    )
    samples = OT.otlp_samples(payloads)
    labeled = samples.select(
        "push_id",
        F.col("value_double").alias("value"),
        F.map_concat(
            F.create_map(F.lit("__name__"), F.col("metric_name")),
            F.col("attrs"),
        ).alias("labels"),
    )
    routed = apply_relabel(
        labeled,
        [
            C(action="keep", source_labels=("__name__",), regex="purchase|click"),
            C(action="hashmod", source_labels=("user",), target_label="shard", modulus=8),
        ],
    )
    return (
        routed.groupBy(
            F.col("labels")["__name__"].alias("name"),
            F.col("labels")["shard"].alias("shard"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "otlp_histogram_decode",
    oracle="""
SELECT event_id AS push_id,
  event_type AS metric_name,
  CAST(2 AS INT) AS temporality,
  CAST(user_id % 3 + 1 AS BIGINT) + CAST(user_id % 5 AS BIGINT)
    + CAST(user_id % 7 AS BIGINT) + CAST(user_id % 2 AS BIGINT) AS count,
  CAST(user_id AS DOUBLE) * 2.5 AS sum_value,
  CAST(user_id % 3 + 1 AS VARCHAR) || ',' || CAST(user_id % 5 AS VARCHAR)
    || ',' || CAST(user_id % 7 AS VARCHAR) || ',' || CAST(user_id % 2 AS VARCHAR)
    AS bucket_counts_csv,
  '0.5,2.5,5.0' AS explicit_bounds_csv,
  CAST(0.5 AS DOUBLE) AS hist_min,
  CAST(user_id % 7 AS DOUBLE) + 0.5 AS hist_max
FROM events
""",
)
def otlp_histogram_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension (r7): OTLP EXPLICIT-BOUNDS HISTOGRAMS — the shape
    that closes the r7 OTLP subset's biggest refusal: every event
    becomes one HistogramDataPoint (fixed64 count, PACKED fixed64
    bucket_counts, PACKED double explicit_bounds, optional sum/min/max
    doubles — all bit-exact on the wire), decoded by the same proto3
    walk. Bucket counts are closed forms of user_id so the oracle
    restates every array element and scalar exactly; arrays ride the
    hash as comma-joined strings (array_join on the Spark side, || on
    the DuckDB side) — the driver compare's proven type envelope has
    no LIST-column precedent, so serialize rather than gamble. See functions/otlp.py;
    arity/packed-length fuzz in tests/test_otlp.py."""
    from pyspark.sql.types import BinaryType

    from prom_etl_db_spark.functions import otlp as OT

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(eid: pd.Series, name: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for e, n, u in zip(eid, name, user):
            u = int(u)
            bc = [u % 3 + 1, u % 5, u % 7, u % 2]
            metric = {
                "name": n, "type": "histogram", "temporality": 2,
                "points": [{
                    "attrs": {"user": str(u)},
                    "time_unix_nano": 1706572800_000000000,
                    "count": sum(bc),
                    "sum": u * 2.5,
                    "bucket_counts": bc,
                    "explicit_bounds": [0.5, 2.5, 5.0],
                    "min": 0.5,
                    "max": (u % 7) + 0.5,
                }],
            }
            out.append(OT.encode_export_metrics(
                [{"resource": {}, "scopes": [{"name": "app",
                                              "metrics": [metric]}]}]
            ))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_id", "event_type", "user_id").alias("body"),
    )
    out = OT.otlp_samples(payloads)
    return out.select(
        "push_id",
        "metric_name",
        "temporality",
        "count",
        F.col("sum").alias("sum_value"),
        F.array_join(
            F.transform(F.col("bucket_counts"), lambda c: c.cast("string")), ","
        ).alias("bucket_counts_csv"),
        F.array_join(
            F.transform(F.col("explicit_bounds"), lambda b: b.cast("string")), ","
        ).alias("explicit_bounds_csv"),
        "hist_min",
        "hist_max",
    )


@register(
    "otlp_hist_quantile_pipeline",
    oracle="""
WITH h AS (
  SELECT event_id, event_type, user_id,
    [CAST(user_id % 3 + 1 AS BIGINT), CAST(user_id % 5 AS BIGINT),
     CAST(user_id % 7 AS BIGINT), CAST(user_id % 2 AS BIGINT)] AS bc
  FROM events
), b AS (
  SELECT event_id, event_type, user_id,
    unnest([0.5::DOUBLE, 2.5::DOUBLE, 5.0::DOUBLE, 'inf'::DOUBLE]) AS le,
    unnest([bc[1], bc[1]+bc[2], bc[1]+bc[2]+bc[3],
            bc[1]+bc[2]+bc[3]+bc[4]]) AS cum
  FROM h
), w AS (
  SELECT *,
    lag(cum) OVER (PARTITION BY event_id ORDER BY le) AS prev_cum,
    lag(le)  OVER (PARTITION BY event_id ORDER BY le) AS prev_le,
    max(cum) OVER (PARTITION BY event_id) * 0.9 AS target
  FROM b
), crossing AS (
  SELECT * FROM w
  WHERE cum >= target AND (prev_cum IS NULL OR prev_cum < target)
)
SELECT event_id AS push_id, event_type AS metric_name,
  CAST(user_id AS VARCHAR) AS user,
  round(CASE WHEN le = 'inf'::DOUBLE THEN prev_le
        ELSE coalesce(prev_le, 0.0)
             + (le - coalesce(prev_le, 0.0))
               * (target - coalesce(prev_cum, 0.0))
               / (cum - coalesce(prev_cum, 0.0)) END, 6) AS p90
FROM crossing
""",
)
def otlp_hist_quantile_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B composition FLAGSHIP (r7): OTLP histogram push → Prometheus
    classic le-bucket series (the OTLP spec's own Prometheus-
    compatibility mapping: cumulative counts, le = bound, '+Inf' =
    total) → the EXISTING PromQL ``histogram_quantile`` operator at
    q=0.9 — proving the OTLP ingestion lands in the engine's PromQL
    surface unchanged. One histogram per event (bucket counts closed
    forms of user_id, first bucket +1 so the total is never zero);
    the oracle replays the operator's exact interpolation algebra
    (crossing bucket, lower-bound-0 first bucket, +Inf → highest
    finite bound) over the same closed forms. Plan: decode
    (mapInPandas) → posexplode to bucket rows (pure Column) → the
    operator's one window + one max per histogram."""
    from pyspark.sql.types import BinaryType

    from prom_etl_db_spark.functions import otlp as OT

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(eid: pd.Series, name: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for e, n, u in zip(eid, name, user):
            u = int(u)
            bc = [u % 3 + 1, u % 5, u % 7, u % 2]
            metric = {
                "name": n, "type": "histogram", "temporality": 2,
                "points": [{
                    "attrs": {"user": str(u)},
                    "time_unix_nano": 1706572800_000000000,
                    "count": sum(bc),
                    "bucket_counts": bc,
                    "explicit_bounds": [0.5, 2.5, 5.0],
                }],
            }
            out.append(OT.encode_export_metrics(
                [{"resource": {}, "scopes": [{"name": "app",
                                              "metrics": [metric]}]}]
            ))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_id", "event_type", "user_id").alias("body"),
    )
    pts = OT.otlp_samples(payloads)
    # OTLP → Prometheus classic buckets: cumulative counts, le labels,
    # '+Inf' carries the total (the spec's compatibility mapping)
    les = F.concat(
        F.transform(F.col("explicit_bounds"), lambda b: b.cast("string")),
        F.array(F.lit("+Inf")),
    )
    cums = F.aggregate(
        F.col("bucket_counts"),
        F.array().cast("array<bigint>"),
        lambda acc, x: F.concat(
            acc,
            F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0)) + x),
        ),
    )
    buckets = pts.select(
        "metric_name",
        F.col("push_id").cast("string").alias("eid"),
        F.col("attrs")["user"].alias("user"),
        F.posexplode(F.arrays_zip(les.alias("le"), cums.alias("cum"))).alias(
            "i", "z"
        ),
    ).select(
        # eid rides as a label so each PUSH is its own histogram series
        # (several events share (metric, user) — a real scrape would
        # key on instance/job the same way)
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("user"), F.lit("eid"), F.lit("le")),
            F.array(
                F.concat(F.col("metric_name"), F.lit("_bucket")),
                F.col("user"),
                F.col("eid"),
                F.col("z.le"),
            ),
        ).alias("labels"),
        F.col("z.cum").cast("double").alias("value"),
    )
    hq = promql.histogram_quantile(buckets, 0.9)
    return hq.select(
        F.col("labels")["eid"].cast("long").alias("push_id"),
        F.regexp_replace(
            F.col("labels")["__name__"], "_bucket$", ""
        ).alias("metric_name"),
        F.col("labels")["user"].alias("user"),
        F.round("value", 6).alias("p90"),
    )


@register(
    "otlp_exp_histogram_decode",
    oracle="""
SELECT event_id AS push_id,
  event_type AS metric_name,
  CAST(2 AS INT) AS temporality,
  CAST(user_id % 4 - 1 AS INT) AS scale,
  CAST(user_id % 3 AS BIGINT) AS zero_count,
  CAST(1e-8 AS DOUBLE) AS zero_threshold,
  CAST(user_id % 5 - 2 AS INT) AS pos_offset,
  CAST(user_id % 3 + 1 AS VARCHAR) || ',' || CAST(user_id % 4 AS VARCHAR)
    || ',' || CAST(user_id % 2 + 1 AS VARCHAR) AS pos_counts_csv,
  CAST(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS neg_offset,
  CASE WHEN user_id % 3 = 0 THEN CAST(user_id % 4 + 1 AS VARCHAR)
       ELSE '' END AS neg_counts_csv,
  CAST(user_id % 3 AS BIGINT) + CAST(user_id % 3 + 1 AS BIGINT)
    + CAST(user_id % 4 AS BIGINT) + CAST(user_id % 2 + 1 AS BIGINT)
    + CASE WHEN user_id % 3 = 0 THEN CAST(user_id % 4 + 1 AS BIGINT)
      ELSE 0 END AS count,
  CAST(user_id AS DOUBLE) * 1.25 AS sum_value
FROM events
""",
)
def otlp_exp_histogram_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension (r8, VERDICT r7 next-round #3): OTLP EXPONENTIAL
    HISTOGRAMS — the wire twin of Prometheus native histograms and the
    one loud refusal a real OTLP user hit in r7. Every event becomes
    one ExponentialHistogramDataPoint with closed-form fields of
    user_id: ZIGZAG sint32 scale (negative values exercised) and
    bucket offsets, packed-varint uint64 bucket runs, fixed64
    count/zero_count, double sum/zero_threshold — all bit-exact on the
    wire; negative-direction buckets present on the user_id%3==0 slice
    so both present and absent shapes hash. Arrays ride as csv strings
    (the proven driver type envelope). Reference tie-in: the push
    ingestion surface the reference delegates to Prometheus
    (internal/prometheus/client.go pulls what agents pushed); spec:
    opentelemetry-proto metrics.proto ExponentialHistogramDataPoint.
    Plan: one pandas_udf encode + one mapInPandas decode, zero shuffle.
    Fuzz + roundtrip gates in tests/test_otlp.py."""
    from pyspark.sql.types import BinaryType

    from prom_etl_db_spark.functions import otlp as OT

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(eid: pd.Series, name: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for e, n, u in zip(eid, name, user):
            u = int(u)
            pc = [u % 3 + 1, u % 4, u % 2 + 1]
            nc = [u % 4 + 1] if u % 3 == 0 else []
            point = {
                "attrs": {"user": str(u)},
                "time_unix_nano": 1706572800_000000000,
                "count": (u % 3) + sum(pc) + sum(nc),
                "sum": u * 1.25,
                "scale": u % 4 - 1,
                "zero_count": u % 3,
                "zero_threshold": 1e-8,
                "pos_offset": u % 5 - 2,
                "pos_counts": pc,
            }
            if nc:
                point["neg_offset"] = 1
                point["neg_counts"] = nc
            metric = {"name": n, "type": "exponential_histogram",
                      "temporality": 2, "points": [point]}
            out.append(OT.encode_export_metrics(
                [{"resource": {}, "scopes": [{"name": "app",
                                              "metrics": [metric]}]}]
            ))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_id", "event_type", "user_id").alias("body"),
    )
    out = OT.otlp_samples(payloads)
    return out.select(
        "push_id",
        "metric_name",
        "temporality",
        "scale",
        "zero_count",
        "zero_threshold",
        "pos_offset",
        F.array_join(
            F.transform(F.col("pos_counts"), lambda c: c.cast("string")), ","
        ).alias("pos_counts_csv"),
        "neg_offset",
        F.array_join(
            F.transform(F.col("neg_counts"), lambda c: c.cast("string")), ","
        ).alias("neg_counts_csv"),
        "count",
        F.col("sum").alias("sum_value"),
    )


@register(
    "otlp_exp_hist_quantile",
    oracle="""
WITH h AS (
  SELECT event_id, event_type, user_id,
    CAST(user_id % 4 - 1 AS INT) AS s,
    CAST(user_id % 5 - 2 AS INT) AS o,
    CAST(user_id % 2 AS BIGINT) AS z,
    [CAST(user_id % 3 + 1 AS BIGINT), CAST(user_id % 5 AS BIGINT),
     CAST(user_id % 7 AS BIGINT), CAST(user_id % 2 AS BIGINT)] AS c
  FROM events
), b AS (
  SELECT event_id, event_type, user_id,
    unnest([power(2.0, o * power(2.0, -s)),
            power(2.0, (o + 1) * power(2.0, -s)),
            power(2.0, (o + 2) * power(2.0, -s)),
            power(2.0, (o + 3) * power(2.0, -s)),
            power(2.0, (o + 4) * power(2.0, -s)),
            'inf'::DOUBLE]) AS le,
    unnest([z, z + c[1], z + c[1] + c[2], z + c[1] + c[2] + c[3],
            z + c[1] + c[2] + c[3] + c[4],
            z + c[1] + c[2] + c[3] + c[4]]) AS cum
  FROM h
), w AS (
  SELECT *,
    lag(cum) OVER (PARTITION BY event_id ORDER BY le) AS prev_cum,
    lag(le)  OVER (PARTITION BY event_id ORDER BY le) AS prev_le,
    max(cum) OVER (PARTITION BY event_id) * 0.9 AS target
  FROM b
), crossing AS (
  SELECT * FROM w
  WHERE cum >= target AND (prev_cum IS NULL OR prev_cum < target)
)
SELECT event_id AS push_id, event_type AS metric_name,
  CAST(user_id AS VARCHAR) AS user,
  round(CASE WHEN le = 'inf'::DOUBLE THEN prev_le
        ELSE coalesce(prev_le, 0.0)
             + (le - coalesce(prev_le, 0.0))
               * (target - coalesce(prev_cum, 0.0))
               / (cum - coalesce(prev_cum, 0.0)) END, 6) AS p90
FROM crossing
""",
)
def otlp_exp_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B composition (r8): OTLP EXPONENTIAL histogram push → classic
    le-bucket series via the FORMULA-defined boundary algebra (base =
    2^(2^-scale); bucket at index i upper-bounds at base^(i+1); the
    zero bucket maps to le = base^offset, the first positive bucket's
    lower bound; '+Inf' carries the total) → the EXISTING PromQL
    ``histogram_quantile`` at q=0.9 — the same operator-reuse proof as
    ``otlp_hist_quantile_pipeline``, now for the native-histogram wire
    twin. Positive-direction + zero observations only (latency-shaped
    data; negative buckets decode but are out of quantile scope by
    construction here). The oracle replays the scale/index algebra in
    SQL (power(2, (o+i)*2^-s)) plus the operator's exact interpolation.
    Plan: encode (pandas_udf) → decode (mapInPandas) → pure-Column
    le/cum arrays → posexplode → one window + one max per histogram —
    single shuffle on the histogram key."""
    from pyspark.sql.types import BinaryType

    from prom_etl_db_spark.functions import otlp as OT

    ev = _events_wide(spark, sf_dir).select("event_id", "event_type", "user_id")

    def build(eid: pd.Series, name: pd.Series, user: pd.Series) -> pd.Series:
        out = []
        for e, n, u in zip(eid, name, user):
            u = int(u)
            pc = [u % 3 + 1, u % 5, u % 7, u % 2]
            point = {
                "attrs": {"user": str(u)},
                "time_unix_nano": 1706572800_000000000,
                "count": (u % 2) + sum(pc),
                "scale": u % 4 - 1,
                "zero_count": u % 2,
                "pos_offset": u % 5 - 2,
                "pos_counts": pc,
            }
            metric = {"name": n, "type": "exponential_histogram",
                      "temporality": 2, "points": [point]}
            out.append(OT.encode_export_metrics(
                [{"resource": {}, "scopes": [{"name": "app",
                                              "metrics": [metric]}]}]
            ))
        return pd.Series(out)

    _build = F.pandas_udf(build, returnType=BinaryType())
    payloads = ev.select(
        F.col("event_id").alias("push_id"),
        _build("event_id", "event_type", "user_id").alias("body"),
    )
    pts = OT.otlp_samples(payloads)
    # exponential → classic le-buckets: le_i = 2^((offset+i) * 2^-scale)
    # for i=0 (the zero bucket's bound = first bucket's LOWER bound)
    # through i=4 (each bucket's upper bound), then '+Inf' = total.
    inv = F.pow(F.lit(2.0), -F.col("scale").cast("double"))
    les = F.concat(
        F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda i: F.pow(
                F.lit(2.0),
                (F.col("pos_offset").cast("double") + i.cast("double")) * inv,
            ).cast("string"),
        ),
        F.array(F.lit("+Inf")),
    )
    cums = F.concat(
        F.aggregate(
            F.col("pos_counts"),
            F.array(F.col("zero_count")),
            lambda acc, x: F.concat(
                acc, F.array(F.try_element_at(acc, F.lit(-1)) + x)
            ),
        ),
        F.array(F.col("count")),
    )
    buckets = pts.select(
        "metric_name",
        F.col("push_id").cast("string").alias("eid"),
        F.col("attrs")["user"].alias("user"),
        F.posexplode(F.arrays_zip(les.alias("le"), cums.alias("cum"))).alias(
            "i", "z"
        ),
    ).select(
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("user"), F.lit("eid"), F.lit("le")),
            F.array(
                F.concat(F.col("metric_name"), F.lit("_bucket")),
                F.col("user"),
                F.col("eid"),
                F.col("z.le"),
            ),
        ).alias("labels"),
        F.col("z.cum").cast("double").alias("value"),
    )
    hq = promql.histogram_quantile(buckets, 0.9)
    return hq.select(
        F.col("labels")["eid"].cast("long").alias("push_id"),
        F.regexp_replace(
            F.col("labels")["__name__"], "_bucket$", ""
        ).alias("metric_name"),
        F.col("labels")["user"].alias("user"),
        F.round("value", 6).alias("p90"),
    )
