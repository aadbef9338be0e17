"""PromQL calendar family (operators/promql.py time_component_columns —
round 5): closed-form civil-from-days vs Python's datetime, including
leap-year and year-boundary edges."""

import datetime
import random

from pyspark.sql import functions as F

from prom_etl_db_spark.operators.promql import time_component_columns

_DIM = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _want(v):
    dt = datetime.datetime.fromtimestamp(v, datetime.timezone.utc)
    leap = (dt.year % 4 == 0 and dt.year % 100 != 0) or dt.year % 400 == 0
    dim = 29 if (dt.month == 2 and leap) else _DIM[dt.month - 1]
    return (
        dt.year, dt.month, dt.day, (dt.weekday() + 1) % 7,
        dt.timetuple().tm_yday, dim, dt.hour, dt.minute,
    )


def test_civil_from_days_matches_datetime(spark):
    random.seed(5)
    edges = [
        0, 86399, 86400,                     # epoch day boundary
        951782399, 951782400,                # 2000-02-29 (400-year leap)
        4107542399, 4107542400,              # 2100-02-28->03-01 (non-leap)
        1704067199, 1704067200,              # 2023->2024 year boundary
    ]
    secs = edges + [random.randint(0, 4_000_000_000) for _ in range(500)]
    df = spark.createDataFrame([(s,) for s in secs], ["v"])
    cols = time_component_columns(F.col("v"))
    out = df.select("v", *[c.alias(k) for k, c in cols.items()]).collect()
    for r in out:
        got = (r.year, r.month, r.day_of_month, r.day_of_week,
               r.day_of_year, r.days_in_month, r.hour, r.minute)
        assert got == _want(r.v), r.v
