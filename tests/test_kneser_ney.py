"""Interpolated Kneser-Ney trigram LM (functions/text.py) — checked
against an INDEPENDENT dict-based reference implementation (plain
Python, no Spark), plus edge/backoff behavior."""

import math

from pyspark.sql import functions as F

from prom_etl_db_spark.functions.text import kneser_ney_trigram_perplexity

D = 0.75


def _ref_model(train_texts):
    """Reference estimator — nested dicts, written straight from the
    Chen & Goodman formulas, structurally unlike the DataFrame code."""
    c3 = {}
    vocab = set()
    for t in train_texts:
        tk = [w for w in t.lower().split() if w]
        vocab.update(tk)
        for i in range(len(tk) - 2):
            key = (tk[i], tk[i + 1], tk[i + 2])
            c3[key] = c3.get(key, 0) + 1
    h2 = {}
    cb = {}
    for (u, v, w), n in c3.items():
        tot, ty = h2.get((u, v), (0, 0))
        h2[(u, v)] = (tot + n, ty + 1)
        cb[(v, w)] = cb.get((v, w), 0) + 1  # distinct-u count
    n1v = {}
    p1t = {}
    for (v, w), n in cb.items():
        tot, ty = n1v.get(v, (0, 0))
        n1v[v] = (tot + n, ty + 1)
        p1t[w] = p1t.get(w, 0) + 1
    btypes = len(cb)
    wtypes = len({w for (_, w) in cb})
    vsz = len(vocab)
    return c3, h2, cb, n1v, p1t, btypes, wtypes, vsz


def _ref_logp(model, u, v, w):
    c3, h2, cb, n1v, p1t, btypes, wtypes, vsz = model
    p1 = (max(p1t.get(w, 0) - D, 0.0) + D * wtypes / (vsz + 1.0)) / btypes
    if v in n1v:
        cvtot, cvty = n1v[v]
        p2 = (max(cb.get((v, w), 0) - D, 0.0) + D * cvty * p1) / cvtot
    else:
        p2 = p1
    if (u, v) in h2:
        c2h, n3h = h2[(u, v)]
        p3 = (max(c3.get((u, v, w), 0) - D, 0.0) + D * n3h * p2) / c2h
    else:
        p3 = p2
    return math.log(p3)


def _ref_doc(model, text):
    tk = [w for w in text.lower().split() if w]
    lps = [
        _ref_logp(model, tk[i], tk[i + 1], tk[i + 2])
        for i in range(len(tk) - 2)
    ]
    if not lps:
        return None
    avg = sum(lps) / len(lps)
    return len(lps), round(avg, 6), round(math.exp(-avg), 4)


DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the cat sat on the hat", "en"),
    (3, "a dog sat on the mat", "en"),
    (4, "the cat ate the fish", "en"),
    # non-train docs: scored but never counted
    (5, "the cat sat on the mat", "de"),  # all-seen trigrams
    (6, "el gato duerme mucho hoy", "de"),  # fully unseen tokens
    (7, "zz the cat sat", "de"),  # unseen history -> bigram backoff
    (8, "too short", "de"),  # <3 tokens: omitted
    (9, "", "de"),  # blank: omitted
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    rows = kneser_ney_trigram_perplexity(df).collect()
    return {r["doc_id"]: r for r in rows}


def test_matches_independent_reference(spark):
    model = _ref_model([t for _, t, lg in DOCS if lg == "en"])
    got = _run(spark)
    expected_ids = set()
    for doc_id, text, _ in DOCS:
        exp = _ref_doc(model, text)
        if exp is None:
            continue
        expected_ids.add(doc_id)
        n, avg, ppl = exp
        r = got[doc_id]
        assert r["n_trigrams"] == n
        assert abs(r["avg_logp"] - avg) <= 1e-6, (doc_id, r["avg_logp"], avg)
        assert abs(r["ppl"] - ppl) <= 1e-3 * max(ppl, 1.0), (doc_id, r["ppl"], ppl)
    assert set(got) == expected_ids  # short/blank docs omitted, no extras


def test_seen_text_scores_better_than_unseen(spark):
    got = _run(spark)
    # doc 5 repeats a training sentence verbatim; doc 6 is fully OOV.
    assert got[5]["ppl"] < got[6]["ppl"]
    # every probability is finite and positive (ppl well-defined)
    for r in got.values():
        assert math.isfinite(r["avg_logp"]) and r["ppl"] > 0


def test_unseen_history_backs_off_not_zero(spark):
    got = _run(spark)
    # "zz the cat" has an unseen (zz, the) history: trigram level must
    # back off to the bigram estimate, not produce -inf or NaN.
    assert math.isfinite(got[7]["avg_logp"])


def test_probability_sums_to_at_most_one_over_vocab(spark):
    """Sanity: for a SEEN history, summing p3 over the training vocab
    plus one OOV slot stays <= 1 + eps (the uniform leak is the only
    unnormalized mass, bounded by D*W/(V+1)/btypes per word)."""
    model = _ref_model([t for _, t, lg in DOCS if lg == "en"])
    _, _, _, _, _, btypes, wtypes, vsz = model
    vocab = {w for t in (t for _, t, lg in DOCS if lg == "en") for w in t.split()}
    total = sum(math.exp(_ref_logp(model, "the", "cat", w)) for w in vocab)
    oov = math.exp(_ref_logp(model, "the", "cat", "<oov>"))
    assert total + oov <= 1.0 + 1e-9 + oov * (vsz + 1)
    assert total <= 1.0 + 1e-9
