"""Unicode NFC normalization (functions/text.py) — UAX #15 semantics
through the Arrow-batched UDF, checked against unicodedata directly and
against DuckDB's independent utf8proc implementation."""

import unicodedata

import duckdb

from prom_etl_db_spark.functions.text import nfc_normalize_features

CASES = [
    (1, "café"),              # e + combining acute -> é
    (2, "Ångström"),           # ANGSTROM SIGN singleton -> Å
    (3, "ḍ̇ot"),              # reorder: dot-below before dot-above
    (4, "한"),           # Hangul jamo -> 한
    (5, "ﬁne"),                     # fi ligature: NFC-invariant
    (6, "plain ascii"),                  # invariant
    (7, None),                           # NULL passthrough
    (8, ""),                             # empty
]


def _run(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    return {r["doc_id"]: r for r in nfc_normalize_features(df).collect()}


def test_matches_unicodedata_and_duckdb(spark):
    got = _run(spark)
    for doc_id, raw in CASES:
        r = got[doc_id]
        if raw is None:
            assert r["text_nfc"] is None and r["changed"] is None
            continue
        want = unicodedata.normalize("NFC", raw)
        assert r["text_nfc"] == want
        assert r["n_cp_in"] == len(raw)
        assert r["n_cp_nfc"] == len(want)
        assert r["changed"] == (want != raw)
        db = duckdb.sql(
            "SELECT nfc_normalize(?)", params=[raw]
        ).fetchone()[0]
        assert db == want  # independent implementation agrees


def test_changed_splits_both_ways(spark):
    got = _run(spark)
    flags = {r["changed"] for r in got.values() if r["changed"] is not None}
    assert flags == {True, False}


def test_composition_shrinks_reorder_preserves_count(spark):
    got = _run(spark)
    assert got[1]["n_cp_nfc"] == got[1]["n_cp_in"] - 1   # compose
    assert got[4]["n_cp_nfc"] == 1                       # jamo -> syllable
    assert got[3]["n_cp_nfc"] == got[3]["n_cp_in"] - 1   # reorder+compose
    assert got[5]["changed"] is False                    # ligature kept
