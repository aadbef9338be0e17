"""Byte-level BPE (functions/bytebpe.py — round 6): pre-tokenizer
category split, hex-pair byte alphabet, trainer vs a from-scratch local
reference, total encode on multibyte input."""

from __future__ import annotations

import unicodedata
from collections import Counter

import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.bytebpe import (
    byte_tokens,
    bytebpe_encode_local,
    bytebpe_token_counts,
    bytebpe_train,
    pretokenize,
)

# stdlib `re` cannot express \p{L}/\p{N} (and its \s is Unicode-wide
# where Java's/RE2's is ASCII), so the local reference is an explicit
# scanner over the same alternation order — alternatives tried at each
# position in regex order, each run maximal (greedy), exactly the
# leftmost-first semantics java.util.regex and RE2 share.
_WS = set("\t\n\x0b\f\r ")
_CONTRACTIONS = ("'ll", "'re", "'ve", "'s", "'t", "'m", "'d")


def _cat(c: str) -> str:
    if c in _WS:
        return "ws"
    g = unicodedata.category(c)[0]
    return "L" if g == "L" else ("N" if g == "N" else "other")


def _local_pretokenize(text: str) -> list[str]:
    out, i, n = [], 0, len(text)
    while i < n:
        hit = next((c for c in _CONTRACTIONS if text.startswith(c, i)), None)
        if hit:
            out.append(hit)
            i += len(hit)
            continue
        matched = False
        for want in ("L", "N", "other"):
            j = i + 1 if text[i] == " " else i
            if j < n and _cat(text[j]) == want:
                k = j
                while k < n and _cat(text[k]) == want:
                    k += 1
                out.append(text[i:k])
                i = k
                matched = True
                break
        if matched:
            continue
        k = i
        while k < n and _cat(text[k]) == "ws":
            k += 1
        out.append(text[i:k])
        i = k
    return out


def _local_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """From-scratch byte-level trainer: pre-token vocab → per-round
    pair-count argmax (count desc, pair asc) → greedy merge."""
    vocab = Counter()
    for t in texts:
        for w in _local_pretokenize(t):
            vocab[w] += 1
    toks = {w: [f"{b:02X}" for b in w.encode("utf-8")] for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, freq in vocab.items():
            tl = toks[w]
            for i in range(len(tl) - 1):
                pairs[(tl[i], tl[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in toks:
            tl, out, i = toks[w], [], 0
            while i < len(tl):
                if i + 1 < len(tl) and tl[i] == a and tl[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(tl[i])
                    i += 1
            toks[w] = out
    return merges


@pytest.mark.parametrize(
    "text,want",
    [
        ("the cat's hat", ["the", " cat", "'s", " hat"]),
        ("I'll go", ["I", "'ll", " go"]),
        ("born 1984!", ["born", " 1984", "!"]),
        # single space attaches to the following word (GPT-2 convention)
        ("a b", ["a", " b"]),
        # DOCUMENTED DIVERGENCE: multi-space runs stay one whitespace
        # pre-token (RE2 has no lookahead for GPT-2's \s+(?!\S))
        ("a  b", ["a", "  ", "b"]),
        ("a\nb", ["a", "\n", "b"]),
        # unicode letters are \p{L}, leading space attaches
        ("le café", ["le", " café"]),
        ("", []),
    ],
)
def test_pretokenize_matches_local(spark, text, want):
    got = (
        spark.createDataFrame([(text,)], "t string")
        .select(pretokenize(F.col("t")).alias("p"))
        .first()["p"]
    )
    assert got == want
    assert _local_pretokenize(text) == want


def test_byte_tokens_hex_pairs(spark):
    got = (
        spark.createDataFrame([(" é",)], "w string")
        .select(byte_tokens(F.col("w")).alias("b"))
        .first()["b"]
    )
    assert got == ["20", "C3", "A9"]  # space marker + 2-byte UTF-8


def test_train_matches_local_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "le café est café",  # multibyte bytes enter the alphabet
        "a  b\tc",  # hostile whitespace
        "I'll don't won't",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bytebpe_train(df, 8)
    assert got == _local_train(texts, 8)


def test_train_deterministic_under_repartition(spark):
    texts = ["abc abd abe", "abc abc xyz", "café abc"] * 4
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = bytebpe_train(df.repartition(7), 6)
    b = bytebpe_train(df.coalesce(1), 6)
    assert a == b


def test_encode_total_no_unk(spark):
    # Every pre-token of arbitrary unicode text encodes to tokens whose
    # concatenation is exactly its UTF-8 hex — byte fallback, no UNK.
    word = " κόσμε✓"
    merges = [("CE", "BA"), ("20", "CEBA")]  # one learned + one chained
    toks = bytebpe_encode_local(word, merges)
    assert "".join(toks) == word.encode("utf-8").hex().upper()


def test_token_counts_accounting(spark):
    texts = ["the cat sat", "the cat's mat", "café au lait"] * 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bytebpe_token_counts(df, 5).collect()}
    assert set(rows) == set(range(len(texts)))
    for i, t in enumerate(texts):
        pre = _local_pretokenize(t)
        r = rows[i]
        assert r["n_pretokens"] == len(pre)
        assert r["n_bytes"] == sum(len(w.encode("utf-8")) for w in pre)
        # merges only ever shrink; at least one per pre-token
        assert len(pre) <= r["n_tokens"] <= r["n_bytes"]


def test_zero_merges_tokens_equal_bytes(spark):
    df = spark.createDataFrame([(0, "hi there")], "doc_id long, text string")
    r = bytebpe_token_counts(df, 0).first()
    assert r["n_tokens"] == r["n_bytes"]
