"""Unigram-LM (SentencePiece) tokenizer: seed vocabulary, one hard-EM
round, Viterbi encode (SURVEY.md §2.E E5, tokenizer trio part 3).

Kudo 2018 ("Subword Regularization", §3) trains the third of the three
published subword constructions: where BPE and WordPiece GROW a
vocabulary by fusing pairs, the unigram LM starts from an over-complete
seed of substrings, fits token probabilities with EM, and segments by
Viterbi — every word gets the single most probable decomposition under
the fitted unigram model. This module implements the construction with
one published, deterministic simplification: the EM step is HARD
(Viterbi) EM — each word contributes counts only along its best path —
which keeps every quantity an exact integer count until the final
probability division and therefore makes the whole trainer replayable
as SQL (the DuckDB oracle in registry/extensions.py replays seed
counting, the Viterbi DP, the re-estimation, and the final encode
bit-for-bit; see `unigram_lm_vocab` / `unigram_encoded_token_counts`).

Reference parity: the reference delegates all text handling to MySQL
string functions (internal/database/mysql.go:180-220 truncates and
stores); a tokenizer trainer is an E5 extension, not a port.

Scale architecture (the same skeleton as `text.bpe_train` /
`text.wordpiece_train`):
- the corpus collapses to the DISTINCT-WORD vocabulary first (one hash
  aggregation — the only corpus-sized shuffle); everything after runs
  on a language-sized table (~1e5-1e6 rows for any natural language,
  independent of corpus bytes);
- seed-substring counting is a pure-Column HOF explosion over that
  table (JVM-side, no Python);
- the seed top-K is `orderBy(...).limit(K)` — TakeOrderedAndProject,
  a per-partition partial top-k, never a single-partition window;
- Viterbi is genuinely imperative per word, so it runs as an
  Arrow-batched pandas UDF — but ONLY over distinct words, with the
  (bounded, vocabulary-sized) probability table riding the closure;
- re-estimation is one vocab-bounded explode + hash aggregation;
- per-document accounting joins the per-word result back to the
  exploded word stream through a broadcast-class join (the word table
  is language-sized, the stream is the corpus).

Determinism contract (what lets DuckDB replay the trainer):
- probabilities are ln(count / total) of exact integer counts — one
  IEEE division, one libm ln, identical on both engines;
- the Viterbi DP accumulates left-to-right (dp[pos-k].lp + ln p(t)) so
  the float addition ORDER is part of the definition;
- DP ties break: higher logprob, then FEWER tokens, then the LONGER
  final token (larger k) — total order, no engine-dependent choice;
- the seed top-K ties break (count desc, token asc).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "unigram_seed_vocab",
    "unigram_train",
    "unigram_token_counts",
    "viterbi_segment",
    "UNIGRAM_MAX_TOKEN_LEN",
    "UNIGRAM_TOP_MULTI",
]

# Seed bounds. SentencePiece seeds from the corpus' most frequent
# substrings (via suffix array, seed size ~1e6); here the seed is every
# word-internal substring up to length 4, single characters always kept
# for coverage, plus the TOP_MULTI most frequent multi-character
# substrings. Fixed constants are part of the operator definition (the
# oracle replays them literally).
UNIGRAM_MAX_TOKEN_LEN = 4
UNIGRAM_TOP_MULTI = 40

_NEG_INF = float("-inf")


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, freq) distinct-word collapse — the one corpus-sized shuffle."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def unigram_seed_vocab(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_len: int = UNIGRAM_MAX_TOKEN_LEN,
    top_multi: int = UNIGRAM_TOP_MULTI,
) -> DataFrame:
    """(tok, cnt) seed vocabulary: every single character (coverage
    guarantee — any corpus word stays segmentable) plus the `top_multi`
    most frequent substrings of length 2..`max_len`, counted with word
    frequency weighting over every (start, length) occurrence.

    All JVM-side: the substring explosion is a nested `transform` over
    `sequence`, flattened — one expression, whole-stage codegen, over
    the language-sized distinct-word table."""
    words = _words(docs, text_col)
    subs = (
        words.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(w)), s -> "
                    f"transform(sequence(1, least({max_len}, length(w) - s + 1)), "
                    "k -> substring(w, s, k))))"
                )
            ).alias("tok"),
            "freq",
        )
        .groupBy("tok")
        .agg(F.sum("freq").alias("cnt"))
    )
    chars = subs.where(F.length("tok") == 1)
    multi = (
        subs.where(F.length("tok") > 1)
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(top_multi)
    )
    return chars.unionByName(multi)


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int = UNIGRAM_MAX_TOKEN_LEN
) -> tuple[list[str], float]:
    """Best unigram-LM segmentation of `word`: the token sequence
    maximizing sum of ln p(t). Ties: fewer tokens, then the longer
    final token at each DP cell. Returns ([], -inf) if `word` cannot
    be covered by the vocabulary (never happens for corpus words when
    the vocab retains the corpus alphabet or every pass-1 path token).

    Left-to-right DP, one float addition per step — the addition order
    is the portable definition the SQL oracle replays."""
    n = len(word)
    # dp[pos] = (lp, n_toks, toks) for the best path covering word[:pos]
    dp: list[tuple[float, int, list[str]] | None] = [None] * (n + 1)
    dp[0] = (0.0, 0, [])
    for q in range(1, n + 1):
        best: tuple[float, int, int] | None = None  # (lp, -n_toks, k)
        best_state: tuple[float, int, list[str]] | None = None
        for k in range(1, min(max_len, q) + 1):
            prev = dp[q - k]
            if prev is None:
                continue
            t = word[q - k : q]
            lp_t = logp.get(t)
            if lp_t is None:
                continue
            cand = (prev[0] + lp_t, -(prev[1] + 1), k)
            if best is None or cand > best:
                best = cand
                best_state = (prev[0] + lp_t, prev[1] + 1, prev[2] + [t])
        dp[q] = best_state
    if dp[n] is None:
        return [], _NEG_INF
    lp, _, toks = dp[n]
    return toks, lp


def _logp_rows(rows, total: int) -> dict[str, float]:
    return {r["tok"]: math.log(r["cnt"] / total) for r in rows}


def _viterbi_udf(logp: dict[str, float], max_len: int):
    """Arrow-batched per-distinct-word Viterbi: w -> (toks, n_toks, lp).
    The probability table rides the closure (vocabulary-sized)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _seg(words):
        toks_col, n_col, lp_col = [], [], []
        for w in words:
            toks, lp = viterbi_segment(w, logp, max_len)
            toks_col.append(toks)
            n_col.append(len(toks))
            lp_col.append(lp)
        return pd.DataFrame({"toks": toks_col, "n_toks": n_col, "lp": lp_col})

    # real annotation objects: the module-wide `from __future__ import
    # annotations` would stringify inline hints and the UDF type
    # inference cannot resolve them against this closure
    _seg.__annotations__ = {"words": pd.Series, "return": pd.DataFrame}
    return pandas_udf(_seg, "toks array<string>, n_toks long, lp double")


def unigram_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_len: int = UNIGRAM_MAX_TOKEN_LEN,
    top_multi: int = UNIGRAM_TOP_MULTI,
) -> DataFrame:
    """Fit the unigram LM: seed counts -> p0 -> Viterbi-segment every
    distinct word (frequency-weighted) -> hard-EM re-estimated counts
    -> final vocabulary. Returns (token, seed_count, em_count, logp)
    for every token with em_count > 0 — the vocabulary pass 2 encodes
    with. Coverage holds because each word's pass-1 path survives into
    the retained vocabulary verbatim.

    The two collects are vocabulary-bounded (alphabet + top_multi,
    then the em-surviving subset) — never corpus- or word-table-sized;
    they are the same bounded driver state as k-means centroids or the
    BPE merge list."""
    spark = docs.sparkSession
    seed = unigram_seed_vocab(
        docs, text_col=text_col, max_len=max_len, top_multi=top_multi
    )
    seed_rows = seed.collect()
    total0 = sum(r["cnt"] for r in seed_rows)
    p0 = _logp_rows(seed_rows, total0)

    words = _words(docs, text_col)
    seg = words.select(
        "w", "freq", _viterbi_udf(p0, max_len)(F.col("w")).alias("s")
    )
    em = (
        seg.select(F.explode("s.toks").alias("tok"), "freq")
        .groupBy("tok")
        .agg(F.sum("freq").alias("em_count"))
    )
    seed_df = spark.createDataFrame(
        [(r["tok"], r["cnt"]) for r in seed_rows], "tok string, seed_count long"
    )
    return (
        em.join(F.broadcast(seed_df), "tok")
        .crossJoin(
            F.broadcast(em.agg(F.sum("em_count").alias("em_total")))
        )
        .select(
            F.col("tok").alias("token"),
            "seed_count",
            "em_count",
            F.log(
                F.col("em_count").cast("double")
                / F.col("em_total").cast("double")
            ).alias("logp"),
        )
    )


def unigram_token_counts(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = UNIGRAM_MAX_TOKEN_LEN,
    top_multi: int = UNIGRAM_TOP_MULTI,
) -> DataFrame:
    """Encode the corpus under the trained model: Viterbi-segment every
    DISTINCT word against the hard-EM vocabulary, then join the
    per-word (n_toks, lp) back to the exploded word stream and account
    per document: (doc_id, n_words, n_tokens, neg_logp) where neg_logp
    is the document's total negative log-likelihood under the unigram
    LM — the model's own compression score for the document."""
    trained = unigram_train(
        docs, text_col=text_col, max_len=max_len, top_multi=top_multi
    )
    rows = trained.select(
        F.col("token").alias("tok"), F.col("em_count").alias("cnt")
    ).collect()
    # p1 is NOT count/total via _logp_rows: logp was already computed
    # Column-side; recompute identically (same IEEE ops) for the closure.
    total1 = sum(r["cnt"] for r in rows)
    p1 = _logp_rows(rows, total1)

    words = _words(docs, text_col)
    per_word = words.select(
        "w", _viterbi_udf(p1, max_len)(F.col("w")).alias("s")
    ).select("w", F.col("s.n_toks").alias("n_toks"), F.col("s.lp").alias("lp"))

    stream = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"),
        )
        .where(F.length("w") > 0)
    )
    return (
        stream.join(F.broadcast(per_word), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
            F.round(-F.sum("lp"), 4).alias("neg_logp"),
        )
    )
