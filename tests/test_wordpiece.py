"""WordPiece (functions/text.py r5): likelihood-scored merge training
(Schuster & Nakajima 2012 / BERT) against a from-scratch local
reference, the greedy longest-match runtime encoder's hand vectors
(including [UNK] and the '##' continuation discipline), and the
distributed token-count accounting."""

from __future__ import annotations

from collections import Counter

from prom_etl_db_spark.functions.text import (
    _wp_merged_name,
    wordpiece_encode,
    wordpiece_token_counts,
    wordpiece_train,
    wordpiece_vocabulary,
)


def _local_wp_reference(texts: list[str], n_merges: int):
    """From-scratch WordPiece trainer: score = n(ab)/(n(a)·n(b)), argmax
    with (score desc, pair asc) tiebreak, left-to-right non-overlapping
    merge application."""
    wf = Counter(
        w for t in texts for w in t.lower().split() if w
    )
    toks = {w: [w[0]] + ["##" + c for c in w[1:]] for w in wf}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        tf: Counter = Counter()
        for w, f in wf.items():
            ts = toks[w]
            for t in ts:
                tf[t] += f
            for i in range(len(ts) - 1):
                pairs[(ts[i], ts[i + 1])] += f
        if not pairs:
            break
        best = min(
            pairs.items(),
            key=lambda kv: (-(kv[1] / (tf[kv[0][0]] * tf[kv[0][1]])), kv[0]),
        )[0]
        merges.append(best)
        a, b = best
        m = _wp_merged_name(a, b)
        for w in toks:
            ts = toks[w]
            out, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == a and ts[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(ts[i])
                    i += 1
            toks[w] = out
    return merges


def test_wordpiece_merged_name_strips_continuation_marker():
    assert _wp_merged_name("t", "##h") == "th"
    assert _wp_merged_name("##h", "##e") == "##he"
    assert _wp_merged_name("a", "b") == "ab"  # defensive: unmarked right


def test_wordpiece_train_matches_local_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new news",
        "the the the the quick brown fox",
        "aaaa aaa aa a",  # self-merge runs: the merge-scan edge case
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = wordpiece_train(docs, 10)
    want = _local_wp_reference(texts, 10)
    assert got == want


def test_wordpiece_differs_from_bpe_on_a_designed_corpus(spark):
    """The likelihood objective must pick the rarer-but-exclusive pair
    over the most frequent one: 'xq' appears only together (score 1)
    while 'th' is frequent but both letters are common elsewhere."""
    texts = ["the that this then tho " * 4 + " xq xq xq"]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    wp = wordpiece_train(docs, 1)
    assert wp == [("x", "##q")]


def test_wordpiece_train_deterministic_under_repartition(spark):
    texts = ["sphinx of black quartz judge my vow " * 3, "pack my box " * 5]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert wordpiece_train(docs, 6) == wordpiece_train(docs.repartition(13), 6)


def test_wordpiece_encode_hand_vectors():
    vocab = {"un", "##aff", "##able", "##ffable", "a", "##b", "hug", "##s"}
    # longest-match-first: 'un' + '##ffable' beats 'un' + '##aff' + '##able'
    assert wordpiece_encode("unffable", vocab) == ["un", "##ffable"]
    assert wordpiece_encode("hugs", vocab) == ["hug", "##s"]
    # any unmatchable position collapses the WHOLE word to [UNK]
    assert wordpiece_encode("hugz", vocab) == ["[UNK]"]
    assert wordpiece_encode("zzz", vocab) == ["[UNK]"]
    # first piece must be a non-'##' token: '##b' alone cannot start a word
    assert wordpiece_encode("b", vocab) == ["[UNK]"]
    assert wordpiece_encode("ab", vocab) == ["a", "##b"]


def test_wordpiece_vocabulary_is_alphabet_plus_merges(spark):
    docs = spark.createDataFrame([(0, "ab ab ba")], "doc_id long, text string")
    v = wordpiece_vocabulary(docs, 1)
    assert "a" in v and "b" in v and "##a" in v and "##b" in v
    assert len([t for t in v if len(t.lstrip('#')) > 1 or t in ("ab", "ba")]) >= 1


def test_wordpiece_token_counts_matches_local_encoder(spark):
    texts = ["the cat sat", "the hat", "that cat", "thin mat the the"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab = set(wordpiece_vocabulary(docs, 6))
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_unk"])
        for r in wordpiece_token_counts(docs, 6).collect()
    }
    for i, t in enumerate(texts):
        words = t.lower().split()
        toks = [wordpiece_encode(w, vocab) for w in words]
        want = (
            len(words),
            sum(len(x) for x in toks),
            sum(1 for x in toks if x == ["[UNK]"]),
        )
        assert got[i] == want, (i, got[i], want)
