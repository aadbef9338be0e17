from prom_etl_db_spark.plans.explain import explain_str, pushed_filters, scan_columns

__all__ = ["explain_str", "pushed_filters", "scan_columns"]
