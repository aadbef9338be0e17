"""Unigram-LM tokenizer (functions/unigram.py): Viterbi optimality vs
exhaustive enumeration, DP tiebreaks, hard-EM coverage, and the
end-to-end Spark pipeline on a hand-checkable corpus."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prom_etl_db_spark.functions import unigram as U


def _brute_best(word, logp, max_len):
    """All segmentations, exhaustively; best (lp, -n) — the global
    objective the DP must match (per-cell k-tiebreaks only pick among
    paths already tied on this key)."""
    def segs(pos):
        if pos == len(word):
            yield []
            return
        for k in range(1, min(max_len, len(word) - pos) + 1):
            t = word[pos : pos + k]
            if t in logp:
                for rest in segs(pos + k):
                    yield [t] + rest

    best = None
    for s in segs(0):
        lp = 0.0
        for t in s:
            lp += logp[t]
        key = (lp, -len(s))
        if best is None or key > best:
            best = key
    return best


class TestViterbi:
    def test_prefers_high_probability_tokens(self):
        logp = {c: math.log(0.01) for c in "abc"}
        logp["abc"] = math.log(0.5)
        toks, lp = U.viterbi_segment("abcabc", logp)
        assert toks == ["abc", "abc"]
        assert lp == pytest.approx(2 * math.log(0.5))

    def test_falls_back_to_characters(self):
        logp = {c: math.log(0.1) for c in "xyz"}
        toks, lp = U.viterbi_segment("zyx", logp)
        assert toks == ["z", "y", "x"]

    def test_uncoverable_word(self):
        toks, lp = U.viterbi_segment("abc", {"a": -1.0, "c": -1.0})
        assert toks == [] and lp == float("-inf")
        # ...including when only an intermediate position is stuck
        toks, _ = U.viterbi_segment("axc", {"a": -1.0, "c": -1.0, "xc": -2.0})
        assert toks == ["a", "xc"]

    def test_tie_prefers_fewer_tokens(self):
        # "ab"+"c" and "a"+"bc" tie on logp; "abc" would too but wins on
        # count. Exact float ties via equal probabilities.
        lp = math.log(0.25)
        logp = {"a": lp, "b": lp, "c": lp, "ab": lp, "bc": lp}
        toks, _ = U.viterbi_segment("abc", logp)
        assert len(toks) == 2
        # equal-length tie ('ab'+'c' vs 'a'+'bc') -> longer FINAL token
        assert toks == ["a", "bc"]

    @settings(max_examples=200, deadline=None)
    @given(
        word=st.text(alphabet="abcd", min_size=1, max_size=12),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_matches_exhaustive_enumeration(self, word, seed):
        import random

        rng = random.Random(seed)
        vocab = set("abcd")
        for _ in range(8):
            i = rng.randrange(0, 4)
            j = rng.randrange(2, 5)
            vocab.add(("abcdabcdabcd")[i : i + j])
        logp = {t: math.log(rng.uniform(0.01, 0.5)) for t in vocab}
        toks, lp = U.viterbi_segment(word, logp)
        best = _brute_best(word, logp, U.UNIGRAM_MAX_TOKEN_LEN)
        assert best is not None
        assert lp == pytest.approx(best[0], abs=1e-9)
        assert len(toks) == -best[1]
        # the reported path reproduces the reported score exactly
        acc = 0.0
        for t in toks:
            acc += logp[t]
        assert acc == lp
        assert "".join(toks) == word


class TestTrainAndEncode:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [(i, "the cat the cat hat") for i in range(4)] + [
            (4, "the hat"),
            (5, "cat cat cat"),
        ]
        return spark.createDataFrame(rows, "doc_id int, text string")

    def test_seed_counts(self, corpus):
        seed = {
            r["tok"]: r["cnt"]
            for r in U.unigram_seed_vocab(corpus).collect()
        }
        # 'the' appears 9 times, 'cat' 11, 'hat' 5 across the corpus;
        # substring 'at' occurs once inside each 'cat'/'hat' occurrence
        assert seed["the"] == 9
        assert seed["cat"] == 11
        assert seed["at"] == 16
        # one 't' inside each of 'the'/'cat'/'hat' -> 9 + 11 + 5
        assert seed["t"] == 25

    def test_em_retains_only_used_tokens(self, corpus):
        trained = U.unigram_train(corpus).collect()
        toks = {r["token"] for r in trained}
        # every word is segmentable from the retained vocabulary
        for r in trained:
            assert r["em_count"] > 0
        for w in ["the", "cat", "hat"]:
            seg, lp = U.viterbi_segment(
                w,
                {
                    r["token"]: r["logp"]
                    for r in trained
                },
            )
            assert "".join(seg) == w
        # whole words dominate this tiny corpus: the 3-char tokens are
        # in the top-40 seed and win every Viterbi pass
        assert {"the", "cat", "hat"} <= toks

    def test_token_counts_accounting(self, corpus):
        rows = {
            r["doc_id"]: r for r in U.unigram_token_counts(corpus).collect()
        }
        assert rows[5]["n_words"] == 3
        # 'cat cat cat' under a vocab containing 'cat' -> 3 tokens
        assert rows[5]["n_tokens"] == 3
        assert rows[4]["n_words"] == 2
        # every doc's neg_logp is positive and finite
        for r in rows.values():
            assert r["neg_logp"] > 0

    def test_logp_is_mle_of_em_counts(self, corpus):
        trained = U.unigram_train(corpus).collect()
        total = sum(r["em_count"] for r in trained)
        for r in trained:
            assert r["logp"] == pytest.approx(
                math.log(r["em_count"] / total), abs=1e-12
            )
