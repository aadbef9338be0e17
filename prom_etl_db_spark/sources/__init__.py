from prom_etl_db_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views
from prom_etl_db_spark.sources.prometheus import (
    FixturePrometheusSource,
    matrix_response_df,
    vector_response_df,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "FixturePrometheusSource",
    "matrix_response_df",
    "vector_response_df",
]
