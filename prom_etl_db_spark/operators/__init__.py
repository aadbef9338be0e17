from prom_etl_db_spark.operators import analytics, promql

__all__ = ["analytics", "promql"]
