"""prom_etl_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of samzong/prom-etl-db.

The reference (study-only, at /root/reference) is a cron-scheduled Go ETL
daemon delegating query execution to Prometheus (PromQL) and MySQL (SQL).
This package re-expresses all three layers Spark-first:

- ``timeparse``   — the relative-time expression DSL (T1).
- ``schema``      — canonical StructTypes + series-key canonicalization.
- ``ingest``      — result-shape normalization, matrix explode, projection,
                    casts, day-truncation, malformed-row quarantine (A4-A13).
- ``store``       — idempotent append/overwrite-day sinks, retention,
                    audit records (A14-A26).
- ``operators.promql``    — the PromQL subset as DataFrame combinators (B1-B8).
- ``operators.analytics`` — the downstream SQL surface (C1-C13).
- ``functions``   — LLM-data-pipeline ops: dedup, similarity search,
                    text analysis, multimodal plumbing (E1-E5).
- ``streaming``   — Structured Streaming triggers/watermark jobs (§2.D).
"""

__version__ = "0.1.0"
