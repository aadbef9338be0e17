"""Prometheus relabel_configs (operators/relabel.py — round 6):
per-action semantics, rule ordering, anchoring, and the hashmod
algebra vs hashlib."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.operators.relabel import RelabelConfig as C
from prom_etl_db_spark.operators.relabel import apply_relabel


def _labels(spark, rows, configs):
    df = spark.createDataFrame(rows, "i int, labels map<string,string>")
    out = apply_relabel(df, configs)
    return {r["i"]: dict(r["labels"]) for r in out.collect()}


def test_replace_only_on_match_and_empty_deletes(spark):
    rows = [(1, {"a": "x-1", "pu": "old"}), (2, {"a": "nope", "pu": "old"})]
    got = _labels(
        spark, rows,
        [C(action="replace", source_labels=("a",), regex="x-(\\d+)",
           target_label="pu", replacement="$1")],
    )
    assert got[1]["pu"] == "1"
    assert got[2]["pu"] == "old"  # no match → no action
    got2 = _labels(
        spark, [(1, {"a": "x-", "pu": "old"})],
        [C(action="replace", source_labels=("a",), regex="x-(\\d*)",
           target_label="pu", replacement="$1")],
    )
    assert "pu" not in got2[1]  # empty expansion DELETES the target


def test_regex_is_fully_anchored(spark):
    got = _labels(
        spark, [(1, {"a": "xx-match-xx"})],
        [C(action="replace", source_labels=("a",), regex="match",
           target_label="t", replacement="hit")],
    )
    assert "t" not in got[1]  # substring match must NOT count


def test_keep_drop_and_missing_source_is_empty(spark):
    rows = [(1, {"job": "api"}), (2, {"job": "db"}), (3, {})]
    kept = _labels(spark, rows, [C(action="keep", source_labels=("job",), regex="api")])
    assert set(kept) == {1}
    dropped = _labels(spark, rows, [C(action="drop", source_labels=("job",), regex="api")])
    assert set(dropped) == {2, 3}
    # missing label concatenates as '' → a '' regex keeps row 3
    empty = _labels(spark, rows, [C(action="keep", source_labels=("job",), regex="")])
    assert set(empty) == {3}


def test_hashmod_matches_reference_algebra(spark):
    vals = ["", "a", "12345", "host-9;api"]
    rows = [(i, {"v": v}) for i, v in enumerate(vals)]
    got = _labels(
        spark, rows,
        [C(action="hashmod", source_labels=("v",), target_label="shard", modulus=7)],
    )
    for i, v in enumerate(vals):
        want = int.from_bytes(hashlib.md5(v.encode()).digest()[8:16], "big") % 7
        assert got[i]["shard"] == str(want), v


def test_labelmap_overwrites_collisions_and_keeps_original(spark):
    got = _labels(
        spark, [(1, {"k_a": "1", "meta_a": "old", "z": "2"})],
        [C(action="labelmap", regex="k_(.*)", replacement="meta_$1")],
    )
    assert got[1] == {"k_a": "1", "meta_a": "1", "z": "2"}


def test_labelmap_duplicate_targets_last_source_wins(spark):
    """Two source labels renaming to the SAME new name must not throw
    under mapKeyDedupPolicy=EXCEPTION; Prometheus applies lb.Set over
    sorted labels so the largest source key wins (ADVICE r6 fix)."""
    got = _labels(
        spark, [(1, {"a_x": "1", "b_x": "2", "z": "9"})],
        [C(action="labelmap", regex="(?:a|b)_(.*)", replacement="m_$1")],
    )
    assert got[1] == {"a_x": "1", "b_x": "2", "z": "9", "m_x": "2"}
    # three-way collision, interleaved with a non-colliding rename
    got2 = _labels(
        spark, [(1, {"c_y": "3", "a_y": "1", "b_y": "2", "a_solo": "s"})],
        [C(action="labelmap", regex="(?:a|b|c)_(.*)", replacement="m_$1")],
    )
    assert got2[1]["m_y"] == "3"  # c_y sorts last
    assert got2[1]["m_solo"] == "s"


def test_labeldrop_labelkeep(spark):
    rows = [(1, {"tmp_a": "1", "job": "x", "tmp_b": "2"})]
    assert _labels(spark, rows, [C(action="labeldrop", regex="tmp_.*")])[1] == {"job": "x"}
    assert _labels(spark, rows, [C(action="labelkeep", regex="tmp_.*")])[1] == {
        "tmp_a": "1", "tmp_b": "2"
    }


def test_rules_apply_in_order(spark):
    # rule 2 matches on the label rule 1 wrote
    got = _labels(
        spark, [(1, {"a": "v"})],
        [
            C(action="replace", source_labels=("a",), regex="(v)",
              target_label="b", replacement="w-$1"),
            C(action="replace", source_labels=("b",), regex="w-(.*)",
              target_label="c", replacement="$1!"),
        ],
    )
    assert got[1] == {"a": "v", "b": "w-v", "c": "v!"}


def test_unknown_action_refused(spark):
    df = spark.createDataFrame([(1, {"a": "b"})], "i int, labels map<string,string>")
    with pytest.raises(ValueError, match="unknown action"):
        apply_relabel(df, [C(action="bogus")])


def test_plan_pure_column(spark):
    df = spark.createDataFrame([(1, {"a": "b"})], "i int, labels map<string,string>")
    out = apply_relabel(df, [
        C(action="replace", source_labels=("a",), regex="(.*)", target_label="t"),
        C(action="labeldrop", regex="x.*"),
    ])
    assert "EvalPython" not in out._jdf.queryExecution().executedPlan().toString()


def test_rendezvous_matches_hashlib_and_minimal_disruption(spark):
    from prom_etl_db_spark.operators.relabel import rendezvous_assign

    df = spark.createDataFrame([(str(i),) for i in range(300)], "k string")
    nodes = ["n0", "n1", "n2", "n3"]
    got = {
        r["k"]: r["a"]
        for r in df.select("k", rendezvous_assign(F.col("k"), nodes).alias("a")).collect()
    }

    def ref(k, ns):
        return max(
            ns,
            key=lambda n: int.from_bytes(
                hashlib.md5(f"hrw-{n}-{k}".encode()).digest()[:8], "big"
            ),
        )

    assert all(got[k] == ref(k, nodes) for k in got)
    # balance: no node starves (weights are uniform hashes)
    counts = {n: sum(1 for v in got.values() if v == n) for n in nodes}
    assert min(counts.values()) > 300 // len(nodes) // 2
    # minimal disruption: removing n3 moves ONLY n3's keys
    got2 = {
        r["k"]: r["a"]
        for r in df.select(
            "k", rendezvous_assign(F.col("k"), nodes[:-1]).alias("a")
        ).collect()
    }
    assert all(got[k] == got2[k] for k in got if got[k] != "n3")
    import pytest as _pt

    with _pt.raises(ValueError, match="empty node list"):
        rendezvous_assign(F.col("k"), [])
