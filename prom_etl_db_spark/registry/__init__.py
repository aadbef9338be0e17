"""Query-registry package — see core.py. Section modules register
on import; prom_etl_db_spark.queries imports them IN ORDER (definition
order is the gate-window tail order)."""
