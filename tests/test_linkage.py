"""Jaro-Winkler record linkage (functions/linkage.py — round 5):
spec vectors, DuckDB bit-equality fuzz, and blocked-aggregate shape."""

import random

import duckdb
import pytest

from prom_etl_db_spark.functions.linkage import blocked_jw_stats, jaro_winkler


def test_winkler_1990_vectors():
    # the canonical published examples
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-4)
    assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-4)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("abc", "") == 0.0
    assert jaro_winkler("", "") == 0.0  # DuckDB's convention, documented
    # window max(2,2)//2-1 = 0: adjacent 2-char swaps DON'T match (spec)
    assert jaro_winkler("ab", "ba") == 0.0
    assert jaro_winkler("abcd", "abdc") > 0.9  # in-window transposition


def test_bit_equality_vs_duckdb_fuzz():
    """The from-spec implementation must be BIT-EQUAL to DuckDB's
    native one — this is the interop claim the oracle hash rests on."""
    con = duckdb.connect()
    random.seed(9)
    pairs = [("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("a", "a")]
    for _ in range(500):
        a = "".join(random.choices("abcdef", k=random.randint(1, 10)))
        b = "".join(random.choices("abcdef", k=random.randint(1, 10)))
        pairs.append((a, b))
    for a, b in pairs:
        got = jaro_winkler(a, b)
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert got == want, (a, b, got, want)


def test_blocked_stats_shape(spark):
    rows = [
        (1, "anderson", "a"),
        (2, "adnerson", "a"),  # transposition: high JW, same block
        (3, "andersonson", "a"),
        (4, "brooks", "b"),    # alone in block: zero pairs -> no row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "name", "block"])
    out = {r.block: r for r in blocked_jw_stats(df).collect()}
    assert set(out) == {"a"}
    a = out["a"]
    assert a.n_pairs == 3
    assert a.n_matches >= 2  # the transposition and the suffix variant
    assert a.jw_max_q6 == int(round(jaro_winkler("anderson", "adnerson") * 1e6))
    expect_mass = sum(
        int(round(jaro_winkler(x, y) * 1e6))
        for x, y in [("anderson", "adnerson"), ("anderson", "andersonson"),
                     ("adnerson", "andersonson")]
    )
    assert a.jw_mass_q6 == expect_mass
