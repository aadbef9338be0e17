"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
sf dir, compares row count, column names, and an order-insensitive value
hash (values canonicalized to strings, rows sorted). Usage:

    python tools/check_oracles.py [--pandas-canon] [sf_dir] [query ...]

``--pandas-canon`` fetches DuckDB results through pandas (``.df()``) instead
of ``fetchall()``, reproducing the driver's fetch path: DuckDB HUGEINT (the
result type of ``sum()`` over INTEGER columns) canonicalizes as float64
there, so ``409`` hashes as ``409.0`` and mismatches Spark's BIGINT even
when values are identical. Independent of the flag, every oracle's result
types are checked and any HUGEINT/UHUGEINT/DECIMAL output column is a hard
failure — oracles must CAST to BIGINT/DOUBLE so both fetch paths agree.
"""

from __future__ import annotations

import hashlib
import sys
import traceback
from datetime import date, datetime
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prom_etl_db_spark.functions.scratch import release_scratch  # noqa: E402
from prom_etl_db_spark.queries import ORACLES, QUERIES  # noqa: E402
from prom_etl_db_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def fetch_pandas_canon(res) -> list[tuple]:
    """Fetch a DuckDB relation the way the driver does: through pandas.

    ``.df()`` maps HUGEINT to float64 — exactly the canonicalization drift
    the gate must reproduce locally. Benign pandas-isms that the driver's
    two-sided canon absorbs (DATE -> midnight Timestamp, NULL BIGINT ->
    NaN-in-float64) are normalized back using the relation's declared types
    so only genuine type drift (HUGEINT and friends) surfaces.
    """
    types = [str(t).upper() for t in res.types]
    is_date = [t == "DATE" for t in types]
    is_int = [("INT" in t and "HUGEINT" not in t) or t == "BOOLEAN" for t in types]
    pdf = res.df()
    out = []
    for row in pdf.itertuples(index=False, name=None):
        vals = []
        for i, v in enumerate(row):
            if v is not None and type(v).__name__ == "NaTType":
                v = None  # NULL TIMESTAMP surfaces as pandas NaT
            elif hasattr(v, "item"):
                try:
                    v = v.item()
                except ValueError:  # numpy ARRAY (LIST column): size > 1
                    v = v.tolist()
            if v is not None and isinstance(v, float) and is_int[i]:
                # A nullable int column comes back as float64 wholesale:
                # NaN was NULL, integral floats were ints. HUGEINT columns
                # are deliberately NOT mapped back — that drift must fail.
                v = None if v != v else int(v)
            elif is_date[i] and isinstance(v, datetime):
                v = v.date()
            vals.append(v)
        out.append(tuple(vals))
    return out


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--pandas-canon"]
    pandas_canon = "--pandas-canon" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            if pandas_canon:
                # the driver fetches BOTH engines through pandas, where a
                # NULL double becomes NaN in a float64 column — apply the
                # same collapse to the Spark side so NULL-vs-NaN agrees
                from pyspark.sql.types import DoubleType, FloatType

                is_float = [
                    isinstance(f.dataType, (DoubleType, FloatType))
                    for f in sdf.schema.fields
                ]
                srows = [
                    tuple(
                        float("nan") if v is None and is_float[i] else v
                        for i, v in enumerate(r)
                    )
                    for r in srows
                ]
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc()
            failures.append(name)
            continue
        finally:
            # operators register internal persist()s as scratch; free
            # them per query so a 140-query gate run doesn't accumulate
            # session-lifetime cached blocks
            release_scratch()
        if name not in ORACLES:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.sql(ORACLES[name])
            dcols = res.columns
            dtypes = [str(t).upper() for t in res.types]
            drows = fetch_pandas_canon(res) if pandas_canon else res.fetchall()
        except Exception:
            print(f"FAIL  {name}: DUCKDB ERROR")
            traceback.print_exc()
            failures.append(name)
            continue
        problems = []
        bad_types = [
            f"{c}:{t}"
            for c, t in zip(dcols, dtypes)
            if any(b in t for b in _BANNED_ORACLE_TYPES)
        ]
        if bad_types:
            problems.append(
                "oracle emits driver-unsafe types (CAST them): "
                + ", ".join(bad_types)
            )
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {scols} vs {dcols}")
        elif table_hash(scols, srows) != table_hash(dcols, drows):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value hash mismatch" in problems:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ss = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in srows)
                dd = sorted("\x1f".join(canon(r[i]) for i in order_d) for r in drows)
                for a, b in zip(ss, dd):
                    if a != b:
                        print(f"  spark: {a}\n  duck : {b}")
                        break
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
