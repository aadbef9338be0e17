

def test_readme_registry_counts_are_current():
    """VERDICT r1 #9: counts drift each batch — enforce them in CI instead
    of trusting the prose. Update README.md when this fails."""
    import re
    from pathlib import Path

    from prom_etl_db_spark.queries import ORACLES, QUERIES

    readme = Path(__file__).resolve().parent.parent / "README.md"
    m = re.search(r"(\d+) queries, (\d+) oracle-checked", readme.read_text())
    assert m, "README registry-count line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(QUERIES), len(ORACLES))
