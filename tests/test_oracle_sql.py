"""Every registered oracle must be valid DuckDB SQL against the real
fixture views — a seconds-fast guard that catches oracle typos without
waiting for the full Spark-vs-DuckDB gate."""

import duckdb
import pytest

from prom_etl_db_spark.queries import ORACLES

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    return c


def test_every_oracle_parses_and_binds(con):
    bad = {}
    for name, sql in ORACLES.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad[name] = str(e).splitlines()[0]
    assert not bad, bad
