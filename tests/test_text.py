"""Text-analysis signals (functions/text.py) — repetition family."""

from pyspark.sql import functions as F

from prom_etl_db_spark.functions.dedup import word_ngrams, word_shingles
from prom_etl_db_spark.functions.text import repetition_features


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return repetition_features(df).collect()[0]


def test_word_ngrams_keeps_duplicates_shingles_dedup(spark):
    df = spark.createDataFrame([("a b a b a",)], "text string")
    row = df.select(
        word_ngrams(F.col("text"), 2).alias("all"),
        word_shingles(F.col("text"), 2).alias("set"),
    ).collect()[0]
    assert row["all"] == ["a b", "b a", "a b", "b a"]  # ordered, with dups
    assert sorted(row["set"]) == ["a b", "b a"]


def test_repetition_counts_on_crafted_doc(spark):
    # "x y x y x z": words 6, distinct 3; bigrams [x y, y x, x y, y x, x z]
    # -> top multiplicity 2; trigrams [x y x, y x y, x y x, y x z] -> 1 dup
    r = _one(spark, "x y x y x z")
    assert (r["n_words"], r["n_distinct_words"]) == (6, 3)
    assert (r["n_bigrams"], r["top_bigram_n"]) == (5, 2)
    assert (r["n_trigrams"], r["n_distinct_trigrams"]) == (4, 3)
    assert r["dup_word_frac"] == 0.5
    assert r["top_bigram_frac"] == 0.4
    assert r["dup_trigram_frac"] == 0.25


def test_repetition_no_repeats_and_blank(spark):
    r = _one(spark, "a b c d")
    assert r["dup_word_frac"] == 0.0 and r["top_bigram_n"] == 1
    assert r["top_bigram_frac"] == round(1 / 3, 6)

    blank = _one(spark, "   ")
    for c in (
        "n_words",
        "n_bigrams",
        "top_bigram_n",
        "n_trigrams",
        "n_lines",
    ):
        assert blank[c] == 0, c
    assert blank["dup_word_frac"] == 0.0 and blank["top_bigram_frac"] == 0.0


def test_repetition_lines(spark):
    r = _one(spark, "hello world\nhello world\n\n  \nbye now")
    # blank/whitespace-only lines are dropped; one duplicated line
    assert (r["n_lines"], r["n_distinct_lines"]) == (3, 2)
    assert r["dup_line_frac"] == round(1 / 3, 6)


def test_repetition_single_word_doc(spark):
    # too short for any bigram/trigram; division guards hold
    r = _one(spark, "word")
    assert (r["n_words"], r["n_bigrams"], r["n_trigrams"]) == (1, 0, 0)
    assert r["top_bigram_frac"] == 0.0 and r["dup_trigram_frac"] == 0.0


def test_repetition_is_pure_column_plan(spark):
    # zero shuffles: the whole feature set must ride the scan
    from prom_etl_db_spark.plans.explain import explain_str

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = explain_str(repetition_features(df), "simple")
    assert "Exchange" not in plan
