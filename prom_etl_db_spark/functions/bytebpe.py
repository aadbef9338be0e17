"""Byte-level BPE — the GPT-2 / tiktoken tokenizer family (Radford et
al. 2019, "Language Models are Unsupervised Multitask Learners", §2.2).

Reference scope: samzong/prom-etl-db has no tokenizer surface; this is
a §2.E training-data-pipeline extension (VERDICT r5 task #4) — the
remaining major tokenizer family after BPE / WordPiece / Unigram-LM,
and the one modern LLM pipelines actually ship: the base alphabet is
the 256 BYTE values of the pre-token's UTF-8 encoding, so encode is
TOTAL (byte fallback — no UNK token can ever be needed), and the
space-marker convention attaches each word's leading space to the word
itself (' the' is one pre-token; its first byte is 0x20).

Architecture (same map-reduce shape as ``text.bpe_train``): the corpus
collapses to the distinct-PRE-TOKEN vocabulary with frequencies — one
hash aggregation — and every training round runs on that vocab only.
Byte symbols are HEX PAIRS of the UTF-8 encoding ('68', '20', 'E0'…)
produced JVM-side by ``hex(encode(w, 'UTF-8'))`` + a fixed-width
regexp split — whole-stage codegen, no Python, and exactly
reproducible in DuckDB (``hex(encode(w))``), which is what makes the
training replay oracle possible (GPT-2's printable-remap table
bytes_to_unicode is a UI nicety, not semantics — hex pairs are the
same alphabet under a different spelling). Merged tokens concatenate
hex pairs, so any learned token IS its byte sequence.

Pre-tokenization: GPT-2's category split — contraction suffixes, then
optional-space + letter run / digit run / other run, then whitespace
runs — with Unicode property classes (``\\p{L}``/``\\p{N}``, supported
by both java.util.regex and RE2). DIVERGENCE (documented in
DIVERGENCES.md): GPT-2's trailing-whitespace rule ``\\s+(?!\\S)`` is a
negative lookahead RE2 cannot express, so runs of MULTIPLE spaces stay
one whitespace pre-token instead of donating their last space to the
next word; single spaces (the overwhelming case) attach exactly as
GPT-2 does. Deterministic and total either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.text import _apply_merge, bpe_pair_frequencies

# Ordered alternation, lookahead-free (see module docstring). The same
# pattern string works in java.util.regex (Spark) and RE2 (DuckDB).
PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def pretokenize(text: Column) -> Column:
    """Array of GPT-2-style pre-tokens (leading space attached)."""
    return F.regexp_extract_all(text, F.lit(PRETOKEN_RE), 0)


def byte_tokens(word: Column) -> Column:
    """A pre-token as its UTF-8 byte sequence, one hex pair per byte —
    the 256-symbol base alphabet. Pure Column: encode → hex → fixed-
    width regexp split, all whole-stage codegen."""
    return F.regexp_extract_all(F.hex(F.encode(word, "UTF-8")), F.lit("[0-9A-F]{2}"), 0)


def bytebpe_word_vocab(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(freq, toks): the distinct-pre-token vocabulary with frequencies,
    each pre-token as hex-pair byte symbols — the one aggregation that
    collapses the corpus before training rounds. Case is PRESERVED
    (byte-level tokenizers don't lowercase; the bytes are the text)."""
    return (
        docs.select(F.explode(pretokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("freq", byte_tokens(F.col("w")).alias("toks"))
    )


def bytebpe_train(
    docs: DataFrame, n_merges: int, *, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` byte-level merge rules over the corpus: per
    round, frequency-weighted adjacent-pair counts over the vocab (hash
    agg), argmax with the (count desc, pair asc) tiebreak (ONE collected
    row), greedy non-overlapping merge application via the pure-Column
    carry-fold shared with ``text.bpe_train``. The driver holds only the
    merge table; rounds are sequential by nature (each merge changes the
    next round's pair counts)."""
    vocab = bytebpe_word_vocab(docs, text_col=text_col).persist()
    vocab.count()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                bpe_pair_frequencies(vocab)
                .orderBy(F.desc("n"), F.asc("left_tok"), F.asc("right_tok"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["left_tok"], top[0]["right_tok"]
            merges.append((a, b))
            new_vocab = vocab.select(
                "freq", _apply_merge(F.col("toks"), a, b).alias("toks")
            ).persist()
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
    return merges


def bytebpe_encode_local(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """From-scratch local reference encoder (tests + driver-side
    samples): one pre-token → hex-pair bytes → merges applied in learned
    order, greedy left-to-right non-overlapping."""
    toks = [f"{b:02X}" for b in word.encode("utf-8")]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def bytebpe_token_counts(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train ``n_merges`` byte-level rules, encode the corpus, return
    per-document (n_pretokens, n_bytes, n_tokens) — the sequence-length
    accounting packing runs on, plus the bytes/token compression ratio
    numerator. Same scale shape as ``text.bpe_token_counts``: the merge
    fold runs on the distinct-pre-token vocab only (language-sized),
    each pre-token's encoded length joins back to the exploded stream
    broadcast-class."""
    merges = bytebpe_train(docs, n_merges, text_col=text_col)
    words = docs.select(
        F.col(id_col), F.explode(pretokenize(F.col(text_col))).alias("w")
    )
    vocab = words.select("w").distinct().select("w", byte_tokens(F.col("w")).alias("toks"))
    for a, b in merges:
        vocab = vocab.select("w", _apply_merge(F.col("toks"), a, b).alias("toks"))
    per_word = vocab.select(
        "w",
        F.size("toks").alias("n_toks"),
        (F.length(F.hex(F.encode(F.col("w"), "UTF-8"))) / 2).cast("bigint").alias("n_bytes"),
    )
    return (
        words.join(F.broadcast(per_word), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_pretokens"),
            F.sum("n_bytes").alias("n_bytes"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
