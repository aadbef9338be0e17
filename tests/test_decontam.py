"""Benchmark-decontamination operator (functions/decontam.py)."""

from pyspark.sql import functions as F

from prom_etl_db_spark.functions.decontam import decontaminate, ngram_overlap
from prom_etl_db_spark.plans.explain import explain_str


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlap_counts_and_fractions(spark):
    # eval doc: "a b c d e f" -> 5-grams {a b c d e, b c d e f}
    ev = _docs(spark, [(100, "a b c d e f")])
    train = _docs(
        spark,
        [
            (1, "a b c d e x y z w v"),   # shares "a b c d e" (1 of 6 grams)
            (2, "x y z w v u t s"),       # disjoint
            (3, "a b c d e f"),           # both grams shared (2 of 2)
            (4, "too short"),             # < 5 words -> no grams
        ],
    )
    out = {r["doc_id"]: r for r in ngram_overlap(train, ev, n=5).collect()}
    assert out[1]["n_ngrams"] == 6 and out[1]["n_hits"] == 1
    assert out[1]["hit_frac"] == round(1 / 6, 6) and out[1]["contaminated"]
    assert out[2]["n_hits"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_hits"] == 2 and out[3]["hit_frac"] == 1.0
    assert out[4]["n_ngrams"] == 0 and out[4]["n_hits"] == 0
    assert out[4]["hit_frac"] == 0.0 and not out[4]["contaminated"]


def test_overlap_dedups_grams_and_normalizes_case(spark):
    # repeated + case-shifted gram counts once (word_shingles lowercases
    # and dedups); eval side distinct too
    ev = _docs(spark, [(100, "A B C D E"), (101, "a b c d e")])
    train = _docs(spark, [(1, "a b c d e a b c d e")])
    row = ngram_overlap(train, ev, n=5).collect()[0]
    # grams of train: {a b c d e, b c d e a, c d e a b, d e a b c, e a b c d}
    assert row["n_ngrams"] == 5 and row["n_hits"] == 1


def test_decontaminate_zero_tolerance_and_threshold(spark):
    ev = _docs(spark, [(100, "a b c d e f")])
    train = _docs(
        spark,
        [
            (1, "a b c d e x y z w v"),  # frac 1/6
            (2, "x y z w v u t s"),      # clean
            (3, "too short"),            # clean (no grams)
        ],
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, ev, n=5).collect()
    )
    assert kept == [2, 3]
    # a loose threshold keeps the 1/6-overlap doc
    loose = sorted(
        r["doc_id"]
        for r in decontaminate(train, ev, n=5, max_hit_frac=0.2).collect()
    )
    assert loose == [1, 2, 3]
    # schema passes through untouched
    assert decontaminate(train, ev, n=5).columns == train.columns


def test_eval_side_broadcasts(spark):
    ev = _docs(spark, [(100, "a b c d e f")])
    train = _docs(spark, [(1, "a b c d e x"), (2, "p q r s t u")])
    plan = explain_str(ngram_overlap(train, ev, n=5), "simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_bloom_prefilter_bounds_exact_hits(spark):
    """The Bloom maybe-count must dominate the exact hit count per doc
    (no false negatives), and on the fixture at n_bits=65536 the FP
    margin is zero for almost every doc — the prefilter passes exactly
    the contaminated grams through to the verify stage."""
    from prom_etl_db_spark.queries import QUERIES

    out = QUERIES["decontam_bloom_prefilter"](spark, "/root/testdata/sf0.001").collect()
    assert out, "train split must be non-empty"
    assert all(r["n_maybe"] >= r["n_hits"] for r in out)
    assert all(r["n_grams"] >= r["n_maybe"] for r in out)
    # cross-check exact hits against the ngram_overlap ground truth
    truth = {
        r["doc_id"]: r["n_hits"]
        for r in QUERIES["decontam_ngram_overlap"](spark, "/root/testdata/sf0.001").collect()
    }
    for r in out:
        assert truth[r["doc_id"]] == r["n_hits"]


def test_decontaminate_filters_on_unrounded_hits(spark):
    """Zero-tolerance decontamination keys off n_hits, not the 6-dp
    ROUNDED hit_frac (which collapses one hit in a huge doc to 0.0)."""
    from prom_etl_db_spark.functions.decontam import decontaminate

    shared = " ".join(f"w{i}" for i in range(5))
    train = spark.createDataFrame(
        [(1, shared + " " + " ".join(f"t{i}" for i in range(40))),
         (2, " ".join(f"u{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, shared)], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in decontaminate(train, eval_set, n=5).collect()}
    assert kept == {2}
