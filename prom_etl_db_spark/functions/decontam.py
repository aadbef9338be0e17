"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (standard LLM-pipeline hygiene —
the GPT-3/PaLM papers' 13-gram overlap rule, scaled down to the fixture's
~54-word documents).

Scale shape (the whole point): the eval side of the join is a BENCHMARK —
megabytes against a 100 TB corpus — so its distinct-gram set is
broadcast; the train side explodes its grams once and the overlap check
is a map-side broadcast hash join. The only shuffle is the final per-doc
count aggregation (partial-agg friendly: key is the doc id). Never an
all-pairs comparison, never a shuffle keyed on gram strings.

No reference analog (the reference pipelines metrics, not corpora); this
is part of the training-data extension family alongside
``functions/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from prom_etl_db_spark.functions.dedup import word_shingles

__all__ = ["ngram_overlap", "decontaminate"]


def ngram_overlap(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per training document: how many of its distinct word ``n``-grams
    appear anywhere in ``eval_set``.

    Returns (id, n_ngrams, n_hits, hit_frac, contaminated) — one row per
    train doc, including zero-hit docs (left join) and docs too short to
    have any n-gram (n_ngrams = 0, hit_frac = 0.0).
    """
    ev_grams = (
        eval_set.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr = train.select(
        F.col(id_col),
        F.size(word_shingles(F.col(text_col), n)).alias("n_ngrams"),
        F.explode_outer(word_shingles(F.col(text_col), n)).alias("gram"),
    )
    hits = tr.join(broadcast(ev_grams), "gram", "left")
    out = hits.groupBy(id_col, "n_ngrams").agg(
        F.count("_hit").alias("n_hits")
    )
    frac = F.when(
        F.col("n_ngrams") > 0, F.col("n_hits") / F.col("n_ngrams")
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.col("n_ngrams"),
        F.col("n_hits"),
        F.round(frac, 6).alias("hit_frac"),
        (F.col("n_hits") > 0).alias("contaminated"),
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    n: int = 5,
    max_hit_frac: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop training documents whose eval n-gram overlap exceeds
    ``max_hit_frac`` (0.0 = drop on ANY shared n-gram, the conservative
    default). Left-anti join against the contaminated-id set only — in a
    healthy corpus that set is a sliver of the data, so AQE turns this
    into a broadcast anti-join and the wide text column never shuffles."""
    # filter on the UNROUNDED ratio (the reported hit_frac is rounded to
    # 6 dp for the output contract — a huge doc's single hit rounds to
    # 0.0 and would silently survive a zero-tolerance pass)
    bad = (
        ngram_overlap(train, eval_set, n=n, id_col=id_col, text_col=text_col)
        .where(
            (F.col("n_hits") > 0)
            & (F.col("n_hits") / F.col("n_ngrams") > F.lit(max_hit_frac))
        )
        .select(id_col)
    )
    return train.join(bad, id_col, "left_anti")
