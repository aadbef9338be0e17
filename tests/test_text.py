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


# -- tf-idf / BM25 ranking -------------------------------------------------


def _ranking_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark query"),
            (2, "spark stream"),
            (3, "query plan cost"),
            (4, "sort merge join"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_topk_hand_computed(spark):
    import math

    from prom_etl_db_spark.functions.text import tfidf_topk_terms

    out = tfidf_topk_terms(_ranking_corpus(spark), 2)
    rows = {
        (r["doc_id"], r["rank"]): (r["term"], r["score"])
        for r in out.collect()
    }
    # doc 1: tf(spark)=2, df(spark)=2, n=4 -> 2*ln(2); tf(query)=1,
    # df(query)=2 -> ln(2). spark outranks query.
    assert rows[(1, 1)] == ("spark", round(2 * math.log(2), 6))
    assert rows[(1, 2)] == ("query", round(math.log(2), 6))
    # doc 4: all three terms unique (df=1, score=ln 4); ties break term-asc
    assert rows[(4, 1)][0] == "join" and rows[(4, 2)][0] == "merge"
    assert all(r[1] <= 2 for r in rows if r[0] == 4)


def test_bm25_scores_hand_computed(spark):
    import math

    from prom_etl_db_spark.functions.text import bm25_scores

    out = bm25_scores(_ranking_corpus(spark), ["spark"], k1=1.2, b=0.75)
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    # Only docs 1, 2 contain 'spark'; df=2, n=4; avgdl=(3+2+3+3)/4=2.75
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)

    def s(tf, dl):
        return round(idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 2.75)), 6)

    assert set(got) == {1, 2}
    assert got[1] == s(2, 3) and got[2] == s(1, 2)


def test_bm25_empty_query_match_is_empty(spark):
    from prom_etl_db_spark.functions.text import bm25_scores

    out = bm25_scores(_ranking_corpus(spark), ["nonexistent"])
    assert out.count() == 0


# -- chunking ---------------------------------------------------------------


def test_chunk_documents_layout_and_overlap(spark):
    from prom_etl_db_spark.functions.text import chunk_documents

    doc = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, doc), (2, ""), (3, "solo")],
                               "doc_id long, text string")
    out = chunk_documents(df, 4, overlap_tokens=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: stride 3, starts 0,3,6,9; start 9 chunks only w9 (1 new token
    # = start+overlap=10 >= n -> kept? 9+1 < 10 false -> dropped)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_start"] for r in c1] == [0, 3, 6]
    assert c1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert c1[1]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    assert c1[2]["chunk_text"] == "w6 w7 w8 w9"
    assert all(r["n_chunk_tokens"] == 4 for r in c1)
    # empty doc -> no chunks; short doc -> one short chunk
    assert 2 not in by_doc
    assert by_doc[3][0]["chunk_text"] == "solo"
    assert by_doc[3][0]["n_chunk_tokens"] == 1


def test_chunk_documents_rejects_bad_params(spark):
    import pytest as _pytest

    from prom_etl_db_spark.functions.text import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, 0)
    with _pytest.raises(ValueError):
        chunk_documents(df, 4, overlap_tokens=4)


def test_hashed_bow_score_hand_computed_and_custom_weights(spark):
    import hashlib

    from prom_etl_db_spark.functions.text import hashed_bow_score

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", hashed_bow_score(F.col("text")).alias("s")
        ).collect()
    }

    def w(tok):
        h = int(hashlib.md5((tok + "bow").encode()).hexdigest()[:8], 16)
        return ((h % 1024) % 7 - 3) / 10.0

    assert out[1] == round(2 * w("alpha") + w("beta"), 6)
    # blank text -> empty token stream -> score 0 (the "" token the split
    # produces is filtered, matching the oracle's t <> '' filter)
    assert out[2] == 0.0

    # custom weight_fn: constant 1.0 turns the score into a token count
    ones = df.select(
        "doc_id",
        hashed_bow_score(F.col("text"), weight_fn=lambda b: F.lit(1.0)).alias("s"),
    ).collect()
    assert {r["doc_id"]: r["s"] for r in ones}[1] == 3.0


def test_chunk_documents_reconstruction_property(spark):
    """Dropping each chunk's leading overlap and concatenating must
    reproduce the exact token stream — for a grid of (n_tokens, chunk,
    overlap) shapes including ragged tails."""
    from prom_etl_db_spark.functions.text import chunk_documents

    cases = [
        (1, 4, 0), (4, 4, 0), (5, 4, 0), (12, 5, 2), (13, 5, 2),
        (7, 3, 1), (9, 3, 2), (10, 10, 9),
    ]
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)))
        for i, (n, _, _) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for i, (n, chunk, overlap) in enumerate(cases):
        out = sorted(
            (
                r["chunk_id"],
                r["chunk_start"],
                r["chunk_text"],
            )
            for r in chunk_documents(
                df.where(F.col("doc_id") == i), chunk, overlap_tokens=overlap
            ).collect()
        )
        rebuilt = []
        for cid, start, text_piece in out:
            toks = text_piece.split()
            rebuilt.extend(toks if cid == 0 else toks[overlap:])
        assert rebuilt == [f"t{i}x{j}" for j in range(n)], (n, chunk, overlap, out)


# --- BPE training ---------------------------------------------------------


def _local_bpe_reference(texts, n_merges):
    """From-scratch reference (Sennrich alg. 1): word-freq vocab, pair
    counts weighted by freq, argmax with (count desc, pair asc) tiebreak,
    left-to-right non-overlapping merge application."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[w] += 1
    toks = {w: list(w) + ["</w>"] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, f in vocab.items():
            ts = toks[w]
            for i in range(len(ts) - 1):
                pairs[(ts[i], ts[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in toks:
            ts = toks[w]
            out, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == a and ts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(ts[i])
                    i += 1
            toks[w] = out
    return merges


def test_bpe_train_matches_local_reference(spark):
    from prom_etl_db_spark.functions.text import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new news",
        "wide wider widest",
        "the the the the quick brown fox",
        "aaaa aaa aa a",  # self-merge runs: the merge-scan edge case
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, 12)
    want = _local_bpe_reference(texts, 12)
    assert got == want


def test_bpe_train_deterministic_under_repartition(spark):
    from prom_etl_db_spark.functions.text import bpe_train

    texts = ["sphinx of black quartz judge my vow " * 3, "pack my box " * 5]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert bpe_train(docs, 6) == bpe_train(docs.repartition(13), 6)


def test_bpe_encode_applies_merges_in_order():
    from prom_etl_db_spark.functions.text import bpe_encode

    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]
    assert bpe_encode("low", merges) == ["low", "</w>"]
    assert bpe_encode("lower", merges) == ["lower", "</w>"]
    assert bpe_encode("slow", merges) == ["s", "low", "</w>"]


def test_quality_features_blank_doc_and_unicode_punct(spark):
    """Blank text has 0 tokens (split('') yields ['']), and non-ASCII
    LETTERS are not punctuation — \\w is ASCII-only in Java regex/RE2,
    which inflated punct_ratio on every non-English doc."""
    import pytest

    from prom_etl_db_spark.functions.text import quality_features

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "für, 中文!"), (4, "plain ascii.")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_features(docs).collect()}
    assert got[1]["n_tokens"] == 0 and got[2]["n_tokens"] == 0
    # 'für, 中文!': 8 chars, only ',' and '!' are punctuation
    assert got[3]["punct_ratio"] == pytest.approx(2 / 8)
    assert got[4]["punct_ratio"] == round(1 / 12, 6)  # output is 6-dp rounded


def test_language_id_detects_unspaced_chinese(spark):
    """Real Chinese has no spaces — zh must score by character
    occurrences, not whitespace tokens (which never equal one hanzi)."""
    from prom_etl_db_spark.functions.text import language_id

    docs = spark.createDataFrame(
        [(1, "这是一个中文的句子我不知道"), (2, "the cat and the dog"),
         (3, "qqq zzz xxx")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select("doc_id", language_id(F.col("text")).alias("lang")).collect()
    }
    assert got == {1: "zh", 2: "en", 3: "und"}


def test_bpe_token_counts_matches_local_reference_encoder(spark):
    """r4: the distributed encode (distinct-vocab fold + broadcast
    join-back) must equal the from-scratch local reference applied per
    word — including merge interactions (learned rules chaining into
    longer subwords) and repeated words counted per occurrence."""
    from prom_etl_db_spark.functions.text import (
        bpe_encode,
        bpe_token_counts,
        bpe_train,
    )

    rows = [
        (1, "low lower lowest low"),
        (2, "new newer newest lower"),
        (3, "low low low new"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(docs, 6)
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_counts(docs, 6).collect()
    }
    for doc_id, text in rows:
        words = [w for w in text.lower().split() if w]
        want = sum(len(bpe_encode(w, merges)) for w in words)
        assert out[doc_id] == (len(words), want)


def test_gopher_rules_split_english_like_pages_both_ways(spark):
    """r4: each Gopher rule must be able to fail a page on its own, and
    a clean page passes. Fixtures built to trip exactly one rule each."""
    from prom_etl_db_spark.functions.text import gopher_quality_flags

    good_words = ("the quick brown words flow and that have with of be to "
                  "sentence keeps marching onward steadily ") * 5  # 90 words
    rows = [
        (1, good_words),                                   # passes all
        (2, "the of and that"),                            # too few words
        (3, good_words + " ####" * 12),                    # symbol ratio
        (4, "zz qq ww ee rr " * 20),                       # no stopwords
        (5, "\n".join(["- " + good_words[:40]] * 10)),     # all bullets
        (6, good_words + " 12 34 56 " * 40),               # alpha fraction
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["gopher_pass"] is False and out[2]["n_words"] < 50
    assert out[3]["gopher_pass"] is False and out[3]["symbol_ratio"] > 0.1
    assert out[4]["gopher_pass"] is False and out[4]["stop_hits"] < 2
    assert out[5]["gopher_pass"] is False and out[5]["bullet_frac"] > 0.9
    assert out[6]["gopher_pass"] is False and out[6]["alpha_frac"] < 0.8


def test_c4_line_filter_each_rule_fires(spark):
    from prom_etl_db_spark.functions.text import c4_line_filter

    keep = "this line has at least five words."
    rows = [
        (1, "\n".join([keep] * 4)),                     # kept page
        (2, "\n".join([keep] * 2)),                     # <3 kept lines
        (3, "\n".join([keep] * 4) + "\nlorem IPSUM x"),  # lorem page drop
        (4, "\n".join([keep] * 4) + "\nvar x = {")      # brace page drop
    ]
    rows.append((5, "\n".join([
        keep,                              # kept
        "no terminal punctuation here",    # dropped: no punct
        "too short.",                      # dropped: <5 words
        "enable JavaScript to view this.",  # dropped: javascript
        keep, keep,
    ])))
    docs = spark.createDataFrame(rows, "doc_id long, page string")
    out = {r["doc_id"]: r for r in c4_line_filter(docs).collect()}
    assert out[1]["page_kept"] is True and out[1]["n_lines_kept"] == 4
    assert out[2]["page_kept"] is False
    assert out[3]["page_kept"] is False  # lorem ipsum (case-insensitive)
    assert out[4]["page_kept"] is False  # curly brace
    assert out[5]["page_kept"] is True and out[5]["n_lines_kept"] == 3
    assert out[5]["kept_text"] == "\n".join([keep] * 3)


def test_bigram_lm_perplexity_semantics(spark):
    """r4: train-slice text must be less perplexing than off-model text
    under the add-1 bigram LM; hand-check one tiny model exactly."""
    import math

    from prom_etl_db_spark.functions.text import bigram_lm_perplexity

    rows = [
        (1, "a b a b a b", "en"),
        (2, "a b a b", "xx"),      # pure train-distribution bigrams
        (3, "q r s t", "xx"),      # all-unseen bigrams and histories
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in bigram_lm_perplexity(docs).collect()}
    # train stats from doc 1 only: c(a,b)=3, c(b,a)=2, c1(a)=3, c1(b)=2, V=2
    p_ab = (3 + 1) / (3 + 2)
    p_ba = (2 + 1) / (2 + 2)
    want_avg = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert out[2]["n_bigrams"] == 3
    assert abs(out[2]["avg_logp"] - round(want_avg, 6)) < 1e-9
    assert abs(out[2]["ppl"] - round(math.exp(-want_avg), 4)) < 1e-6
    # unseen everything: p = 1/V per bigram -> ppl = V = 2... with add-1:
    # (0+1)/(0+2) = 0.5 -> ppl 2.0
    assert out[3]["ppl"] == 2.0
    assert out[2]["ppl"] < out[3]["ppl"]


def test_curation_ops_survive_degenerate_documents(spark):
    """r5 adversarial pass: a 100 TB crawl contains NULL, empty and
    whitespace-only documents. gopher_quality_flags must not raise
    DIVIDE_BY_ZERO under ANSI mode (it did — zero-word pages divided by
    n_words): degenerate pages now emit NULL per-word ratios and a
    non-NULL gopher_pass = false. c4_line_filter must give a false (not
    NULL) verdict for NULL pages. bigram_lm_perplexity and
    dsir_logweights omit evidence-free documents by documented
    contract — pinned here so the omission stays deliberate."""
    from pyspark.sql import functions as F

    from prom_etl_db_spark.functions.sampling import dsir_logweights
    from prom_etl_db_spark.functions.text import (
        bigram_lm_perplexity,
        c4_line_filter,
        gopher_quality_flags,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   \n  \t "), (5, "\n\n\n"), (7, "a"),
         (9, "the cat and the dog have been to that house with care. " * 5)],
        "doc_id long, text string",
    )
    g = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert len(g) == 6  # nothing dropped, nothing raised
    for d in (1, 2, 3, 5):
        assert g[d]["n_words"] == 0
        assert g[d]["mean_word_len"] is None
        assert g[d]["gopher_pass"] is False  # false, never NULL
    assert g[7]["gopher_pass"] is False and g[7]["n_words"] == 1
    assert g[9]["n_words"] == 60 and g[9]["stop_hits"] >= 2

    c = {r["doc_id"]: r for r in
         c4_line_filter(docs.withColumnRenamed("text", "page")).collect()}
    assert c[1]["page_kept"] is False and c[1]["n_lines"] == 1
    assert c[5]["n_lines"] == 4 and c[5]["page_kept"] is False

    train = F.col("doc_id") == 9
    b = bigram_lm_perplexity(docs, train=train)
    assert {r["doc_id"] for r in b.collect()} == {9}  # documented omission
    d = dsir_logweights(docs, target=train)
    assert {r["doc_id"] for r in d.collect()} == {7, 9}


# -- HTML extraction (round 5) -----------------------------------------------


def test_html_extract_strata(spark):
    from prom_etl_db_spark.functions.text import html_extract_text

    cases = [
        # (html, expected clean_text)
        ("<p>a</p><p>b</p>", "a\n\nb"),
        ("<script>if (a<b) alert('</scriptx>');</script>rest", "rest"),
        ("<style>p { x: y; }</style>keep", "keep"),
        ("<head><title>T</title><style>s</style></head><body>B</body>", "B"),
        ("<!-- <b>hidden</b> -->shown", "shown"),
        ("Tom &amp; Jerry &lt;3 &#39;s &nbsp;x", "Tom & Jerry <3 's x"),
        ("double &amp;lt; stays", "double &lt; stays"),
        ("<div>a<br/>b</div>", "a\nb"),  # br is a single break
        ("<a href='u'>inline</a> <b>bold</b>", "inline bold"),
        ("a \t  b\n\n\n\nc", "a b\n\nc"),
        ("plain text unchanged", "plain text unchanged"),
        ("<ul><li>x</li><li>y</li></ul>", "x\n\ny"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], ["doc_id", "html"]
    )
    got = {r.doc_id: r for r in html_extract_text(df).collect()}
    for i, (h, want) in enumerate(cases):
        assert got[i].clean_text == want, (h, got[i].clean_text)
        assert got[i].n_chars == len(want)
        assert got[i].n_lines == want.count("\n") + 1


def test_html_extract_oracle_exprs_parity_on_edge_strings():
    """The DuckDB mirror produces the same text as Spark's passes on a
    torture page — two regex engines, one answer (the unit-level twin
    of the driver hash)."""
    import duckdb

    from prom_etl_db_spark.functions.text import html_extract_oracle_exprs

    page = (
        "<head><script>a<b</script></head>"
        "<P CLASS='x'>Mixed &amp; CASE</p><BR>t &amp;amp; u"
        "<!-- c --><table><tr><td>c1</td></tr></table>"
    )
    con = duckdb.connect()
    expr = html_extract_oracle_exprs()
    got = con.execute(
        f"SELECT {expr} FROM (SELECT ? AS html)", [page]
    ).fetchone()[0]
    assert got == "Mixed & CASE\n\nt &amp; u\n\nc1"


# -- mojibake repair (round 5) -------------------------------------------------


def test_fix_mojibake_vectors():
    from prom_etl_db_spark.functions.text import fix_mojibake

    moji = lambda s: s.encode("utf-8").decode("cp1252")  # noqa: E731
    # single, double, smart quotes, emoji; clean inputs untouched
    assert fix_mojibake(moji("café é")) == "café é"
    assert fix_mojibake(moji(moji("déjà vu"))) == "déjà vu"
    assert fix_mojibake(moji("’tis — fine…")) == "’tis — fine…"
    assert fix_mojibake(moji("🎉")) == "🎉"
    assert fix_mojibake("plain ascii") == "plain ascii"
    # a REAL 'é' alone is not valid UTF-8 after cp1252 re-encoding: refuse
    assert fix_mojibake("real é stays") == "real é stays"
    # marker bait: 'Ã' followed by space is not a double encoding
    assert fix_mojibake("x Ã x") == "x Ã x"
    # latin-1 fallback: text containing a cp1252-unmappable char (0x81
    # class) that is still a valid double encoding via latin-1
    s = "ü".encode("utf-8").decode("latin-1")  # 'Ã¼'
    assert fix_mojibake(s) == "ü"
    # idempotence on repaired output
    assert fix_mojibake(fix_mojibake(moji("café"))) == "café"


def test_mojibake_features_flags(spark):
    from prom_etl_db_spark.functions.text import mojibake_features

    moji = lambda s: s.encode("utf-8").decode("cp1252")  # noqa: E731
    rows = [
        (0, "ok " + moji("née")),
        (1, "clean text"),
        (2, "bait Ã here"),
    ]
    got = {
        r.doc_id: r
        for r in mojibake_features(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert got[0].text_fixed == "ok née" and got[0].repaired and got[0].suspected
    assert got[1].text_fixed == "clean text" and not got[1].suspected
    assert got[2].text_fixed == "bait Ã here" and got[2].suspected and not got[2].repaired
    assert got[0].n_chars_fixed == len("ok née")


def test_fold_accents_vectors():
    from prom_etl_db_spark.functions.text import fold_accents

    assert fold_accents("Café Déjà") == "cafe deja"
    assert fold_accents("NAÏVE Über Å") == "naive uber a"
    # non-accent letters survive: stripping would be transliteration
    assert fold_accents("Łódź") == "łodz"
    assert fold_accents("øre ß") == "øre ß"
    assert fold_accents("Ωμέγα") == "ωμεγα"
    assert fold_accents("İstanbul") == "istanbul"  # dot-above strips
    assert fold_accents("ascii") == "ascii"
    assert fold_accents("") == ""
    # idempotent
    assert fold_accents(fold_accents("Tiếng Việt")) == "tieng viet"


def test_char_entropy_known_values(spark):
    import math

    from prom_etl_db_spark.functions.text import char_entropy_features

    rows = [
        (0, "aaaa"),          # one symbol: H = 0
        (1, "abab"),          # two equiprobable: H = 1 bit
        (2, "abcd"),          # four equiprobable: H = 2 bits
        (3, ""),              # blank: zeros
        (4, "aab"),           # H = 2/3*log2(3/2) + 1/3*log2(3)
    ]
    got = {
        r.doc_id: r
        for r in char_entropy_features(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert (got[0].n_chars, got[0].n_distinct, got[0].max_run) == (4, 1, 4)
    assert got[0].entropy_q6 == 0
    assert got[1].entropy_q6 == 1_000_000
    assert got[2].entropy_q6 == 2_000_000
    assert (got[3].n_chars, got[3].entropy_q6) == (0, 0)
    want4 = round(1e6 * (2 / 3) * math.log2(3 / 2)) + round(1e6 * (1 / 3) * math.log2(3))
    assert got[4].entropy_q6 == want4
    assert got[4].max_run == 2 and got[4].n_distinct == 2
