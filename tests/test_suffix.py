"""Distributed suffix array + LCP (functions/suffix.py — round 5): the
arbitrary-length repeated-substring upgrade of the fixed-L span-hash
approximation. Ground truth is a from-scratch brute force (sort all
suffix tuples, scan common prefixes) — the same definition the DuckDB
oracle of `doc_suffix_array_repeats` encodes."""

from prom_etl_db_spark.functions.suffix import (
    SENTINEL,
    suffix_array_with_lcp,
    token_stream,
)


def _brute(corpora: dict[int, str]):
    stream = []
    for d in sorted(corpora):
        toks = (corpora[d] or "").lower().split()
        for p, t in enumerate(toks):
            stream.append((d, p, t))
        stream.append((d, len(toks), SENTINEL + str(d)))
    n = len(stream)
    sufs = sorted(
        (tuple(t for _, _, t in stream[i:]), i) for i in range(n)
    )
    out = []
    for r, (suf, gpos) in enumerate(sufs):
        prev = sufs[r - 1][0] if r else ()
        k = 0
        while k < len(prev) and k < len(suf) and prev[k] == suf[k]:
            k += 1
        d, p, _ = stream[gpos]
        out.append((r, gpos, d, p, k if r else 0))
    return out


def _run(spark, corpora):
    docs = spark.createDataFrame(
        list(corpora.items()), "doc_id long, text string"
    )
    rows = suffix_array_with_lcp(docs).orderBy("sa_rank").collect()
    return [
        (r["sa_rank"], r["gpos"], r["doc_id"], r["pos"], r["lcp_prev"])
        for r in rows
    ]


def test_suffix_array_matches_brute_force_multi_doc(spark):
    """Cross-document repeats found at their exact length; sentinels
    fence document boundaries (the repeat 'the cat sat' spans docs 0/2
    but never crosses into a neighbor)."""
    corpora = {
        0: "the cat sat on the cat mat",
        1: "a b a b a b",
        2: "the cat sat quietly",
    }
    got = _run(spark, corpora)
    exp = _brute(corpora)
    assert got == exp
    assert max(l for *_, l in got) == 4  # 'a b a b' self-overlap in doc 1


def test_suffix_array_overlapping_run_and_degenerates(spark):
    """The pathological all-same-token run (overlapping repeats at
    every offset — the case fixed-L span hashing blurs) plus NULL and
    empty documents (contribute only their sentinel)."""
    corpora = {3: "x x x x x x", 7: None, 9: "", 11: "y x x y"}
    got = _run(spark, corpora)
    exp = _brute(corpora)
    assert got == exp
    # the x-run: SA-adjacent suffixes x^5 / x^6 share 5 real tokens
    assert max(l for *_, l in got) == 5


def test_suffix_array_lcp_never_crosses_documents(spark):
    """Identical documents: every repeat is cross-doc; the LCP equals
    the full doc length (5 tokens) and never extends through the
    sentinel into the neighbor text."""
    corpora = {1: "one two three four five", 2: "one two three four five"}
    got = _run(spark, corpora)
    exp = _brute(corpora)
    assert got == exp
    assert max(l for *_, l in got) == 5  # exactly the doc length, not more


def test_token_stream_offsets_are_dense_and_ordered(spark):
    corpora = {5: "a b c", 6: "d e"}
    docs = spark.createDataFrame(
        list(corpora.items()), "doc_id long, text string"
    )
    rows = token_stream(docs).orderBy("gpos").collect()
    assert [r["gpos"] for r in rows] == list(range(7))  # 3+1 + 2+1
    assert [r["token"] for r in rows] == [
        "a", "b", "c", SENTINEL + "5", "d", "e", SENTINEL + "6",
    ]


def test_substring_dedup_rewrite_matches_brute_force(spark):
    """The removal rule replayed from scratch: mark [gpos, gpos+lcp)
    for every SA row with lcp_prev >= L, keep unmarked tokens in
    position order. Checks the kept TEXT, not just counts; an
    all-unique doc survives byte-identical."""
    from prom_etl_db_spark.functions.suffix import substring_dedup_rewrite

    corpora = {
        0: "the cat sat on the mat and the cat sat by the door",
        1: "unique words only here",
        2: "the cat sat quietly",
    }
    L = 2
    # brute force
    stream, sufs = [], []
    for d in sorted(corpora):
        toks = corpora[d].lower().split()
        for p, t in enumerate(toks):
            stream.append((d, p, t))
        stream.append((d, len(toks), SENTINEL + str(d)))
    n = len(stream)
    sufs = sorted(
        (tuple(t for _, _, t in stream[i:]), i) for i in range(n)
    )
    marked = set()
    for r in range(1, n):
        prev, suf = sufs[r - 1][0], sufs[r][0]
        k = 0
        while k < len(prev) and k < len(suf) and prev[k] == suf[k]:
            k += 1
        if k >= L:
            marked.update(range(sufs[r][1], sufs[r][1] + k))
    exp = {}
    for d in corpora:
        toks = [
            t
            for g, (dd, p, t) in enumerate(stream)
            if dd == d and not t.startswith(SENTINEL) and g not in marked
        ]
        total = len(corpora[d].split())
        exp[d] = (total, total - len(toks), " ".join(toks))

    docs = spark.createDataFrame(
        list(corpora.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["kept_text"])
        for r in substring_dedup_rewrite(docs, min_len=L).collect()
    }
    assert got == exp
    assert got[1] == (4, 0, "unique words only here")  # untouched
    assert got[0][1] > 0 and got[2][1] > 0  # repeats actually removed
