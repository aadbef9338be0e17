from prom_etl_db_spark.streaming.jobs import (
    stream_events_to_metrics,
    windowed_rollup_stream,
)

__all__ = ["stream_events_to_metrics", "windowed_rollup_stream"]
