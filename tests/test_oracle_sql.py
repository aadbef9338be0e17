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


def test_no_oracle_emits_driver_unsafe_types(con):
    """No oracle output column may be HUGEINT/UHUGEINT/DECIMAL.

    The driver fetches oracle results through pandas/arrow, where DuckDB
    HUGEINT (``sum()`` over any INTEGER column!) becomes float64/decimal128
    and value-hashes as ``409.0`` against Spark's BIGINT ``409`` — the exact
    bug that turned doc_sequence_packing and curation_pipeline red in round
    2 despite identical values. Oracles must ``CAST(sum(...) AS BIGINT)``
    (or ``AS DOUBLE`` for fractional outputs) so both fetch paths agree.
    See the canon-safety checklist in README.md.
    """
    banned = ("HUGEINT", "UHUGEINT", "DECIMAL")
    bad = {}
    for name, sql in ORACLES.items():
        rel = con.sql(sql)
        hits = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, [str(t).upper() for t in rel.types])
            if any(b in t for b in banned)
        ]
        if hits:
            bad[name] = hits
    assert not bad, bad
