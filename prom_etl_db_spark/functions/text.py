"""Text analysis operators (SURVEY.md §2.E E5).

Language-ID, quality scoring, token counting, and document fingerprinting —
all as pure Column expressions (JVM-side, whole-stage codegen) so the hot
path has zero Python. Deterministic by construction: integer arithmetic for
the fingerprint, fixed stopword lists for language-ID.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_like_tokens",
    "bpe_like_token_count",
    "quality_features",
    "repetition_features",
    "redact_pii",
    "PII_PATTERNS",
    "language_id",
    "term_frequencies",
    "document_frequencies",
    "tfidf_topk_terms",
    "bm25_scores",
    "chunk_documents",
    "hashed_bow_score",
    "fingerprint",
    "zipf_token_stats",
    "kneser_ney_trigram_perplexity",
    "nfc_normalize_col",
    "nfc_normalize_features",
    "html_extract_text",
    "html_extract_oracle_exprs",
    "fix_mojibake",
    "mojibake_features",
    "STOPWORDS",
    "BPE_SPLIT_RE",
]

# Tiny per-language function-word lists — the classic n-gram/stopword
# heuristic. Order matters: ties resolve to the first language listed.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "für"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "de", "un", "una", "por", "con"],
    "zh": ["的", "是", "在", "和", "了", "有", "我", "不", "这", "中"],
}

_WORD_SEP = r"\s+"
_FP_MOD = 1_000_000_007  # h*31+c stays < 2^35 — exact in int64 everywhere


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.trim(F.lower(text)), _WORD_SEP)


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.trim(text) == "", 0).otherwise(F.size(tokens(text)))


# GPT-2-style pre-tokenizer split: contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs, residual whitespace. Restricted
# to syntax BOTH Java regex (Spark) and RE2 (DuckDB) accept — i.e. no
# lookahead — so the count is oracle-checkable; that one `\s+(?!\S)` branch
# of the original GPT-2 pattern only changes how trailing spaces attach.
BPE_SPLIT_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_like_tokens(text: Column) -> Column:
    """Pre-tokenizer pieces under ``BPE_SPLIT_RE`` — the unit a byte-pair
    vocabulary would merge within. Proper BPE needs the merges table; the
    piece count is the standard cheap proxy for budgeting/packing."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), F.lit(0))


def bpe_like_token_count(text: Column) -> Column:
    """Piece count under the BPE-ish split; 0 for empty/blank text."""
    return F.when(F.trim(text) == "", 0).otherwise(F.size(bpe_like_tokens(text)))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality signals per document (the standard pre-training filters)."""
    t = F.col(text_col)
    toks = tokens(t)
    # blank guard: split('') yields [''] (size 1) — a blank doc has 0
    # tokens, same rule as token_count()
    n_toks = F.when(F.trim(t) == "", 0).otherwise(F.size(toks))
    n_chars = F.length(t)
    # \w is ASCII-only in both Java regex and RE2 — it would count every
    # non-ASCII LETTER (umlauts, CJK) as punctuation and a multilingual
    # punct-ratio filter would discard all non-English text; the Unicode
    # categories count only true symbols/punctuation
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\p{L}\p{N}_\s]", ""))
    en_stop = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(en_stop, w)))
    return docs.withColumns(
        {
            "n_tokens": n_toks,
            "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
            "stopword_ratio": F.round(n_stop / F.greatest(n_toks, F.lit(1)), 6),
            "mean_word_len": F.round(
                (F.length(F.regexp_replace(t, _WORD_SEP, ""))) / F.greatest(n_toks, F.lit(1)),
                6,
            ),
        }
    )


# PII patterns, restricted (like BPE_SPLIT_RE) to syntax BOTH Java regex
# and RE2 accept — no lookarounds, no backrefs — so redaction is
# oracle-checkable. Order matters and is the dict order: emails first
# (their local parts contain digits a later pass must not see), then
# ipv4, then phones.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d[\d\s().-]{6,}\d", "<PHONE>"),
}


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone numbers, adding per-category match
    counts and the redacted text. Counts are taken BEFORE any replacement
    (on the original text) so categories don't see each other's tokens;
    replacements are then applied in PII_PATTERNS order. Pure codegen'd
    expressions — no UDF, no shuffle; at 100 TB this is a map over the
    scan like any other projection."""
    t = F.col(text_col)
    counts = {
        f"n_{name}": F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for name, (pat, _) in PII_PATTERNS.items()
    }
    red = t
    for pat, token in PII_PATTERNS.values():
        red = F.regexp_replace(red, pat, token)
    return docs.withColumns({**counts, f"{text_col}_redacted": red})


def _max_multiplicity(arr: Column) -> Column:
    """Largest number of times any single element repeats in ``arr``,
    computed per row as a sorted-run fold — array_sort + one O(n) pass,
    entirely inside the row, so the signal costs ZERO shuffles at any
    corpus size (the explode→groupBy alternative shuffles every gram).
    0 for an empty array."""
    run_of = lambda a, x: (  # noqa: E731 — shared by run and best below
        F.when(a["prev"].eqNullSafe(x), a["run"] + 1).otherwise(F.lit(1))
    )
    acc = F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            run_of(a, x).alias("run"),
            F.greatest(a["best"], run_of(a, x)).alias("best"),
        ),
    )
    return acc["best"]


def repetition_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, as adopted
    by Dolma/RedPajama-style pipelines): duplicate-word, duplicate-line,
    top-bigram and duplicate-trigram statistics per document.

    Every signal is a pure Column expression over in-row arrays — no
    shuffle, no UDF; the whole feature set rides the scan. Exact integer
    counts come first (engine-portable, hash-stable); the conventional
    fractions are derived from them, rounded to 6 places for human use —
    oracle comparisons should hash the counts, not the rounded ratios
    (rounding-tie boundaries differ across engines).
    """
    from prom_etl_db_spark.functions.dedup import word_ngrams

    t = F.col(text_col)
    blank = F.trim(t) == ""
    words = tokens(t)
    bi = word_ngrams(t, 2)
    tri = word_ngrams(t, 3)
    lines = F.filter(F.split(t, r"\n"), lambda ln: F.trim(ln) != "")

    def guard(c: Column) -> Column:
        return F.when(blank, F.lit(0)).otherwise(c)

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
        )

    n_words = guard(F.size(words))
    n_distinct_words = guard(F.size(F.array_distinct(words)))
    n_bigrams = guard(F.size(bi))
    top_bigram_n = guard(_max_multiplicity(bi))
    n_trigrams = guard(F.size(tri))
    n_distinct_trigrams = guard(F.size(F.array_distinct(tri)))
    n_lines = guard(F.size(lines))
    n_distinct_lines = guard(F.size(F.array_distinct(lines)))
    return docs.withColumns(
        {
            "n_words": n_words,
            "n_distinct_words": n_distinct_words,
            "n_bigrams": n_bigrams,
            "top_bigram_n": top_bigram_n,
            "n_trigrams": n_trigrams,
            "n_distinct_trigrams": n_distinct_trigrams,
            "n_lines": n_lines,
            "n_distinct_lines": n_distinct_lines,
            "dup_word_frac": frac(n_words - n_distinct_words, n_words),
            "top_bigram_frac": frac(top_bigram_n, n_bigrams),
            "dup_trigram_frac": frac(n_trigrams - n_distinct_trigrams, n_trigrams),
            "dup_line_frac": frac(n_lines - n_distinct_lines, n_lines),
        }
    )


def language_id(text: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits per language;
    ties → first language in STOPWORDS order; no hits → 'und'.

    zh scores by CHARACTER occurrences (each zh stopword is one hanzi,
    counted as a substring): real Chinese text has no spaces, so
    whitespace tokens never equal a single-character stopword and
    token-level matching would leave zh permanently undetectable."""
    toks = tokens(text)
    lowered = F.lower(text)

    def hit_count(words: list[str]) -> Column:
        arr = F.array([F.lit(x) for x in words])
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    def char_count(words: list[str]) -> Column:
        c = None
        for w in words:
            d = F.length(lowered) - F.length(F.replace(lowered, F.lit(w), F.lit("")))
            c = d if c is None else c + d
        return c

    scores = [
        F.struct(
            (char_count(words) if lang == "zh" else hit_count(words)).alias(
                "score"
            ),
            F.lit(len(STOPWORDS) - i).alias("prio"),  # earlier lang wins ties
            F.lit(lang).alias("lang"),
        )
        for i, (lang, words) in enumerate(STOPWORDS.items())
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def term_frequencies(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document term frequencies: (id, term, tf, dl).

    ``dl`` (document length in whitespace tokens) rides the groupBy key —
    it is functionally determined by the id, so carrying it costs nothing
    and saves a later join against the documents table.

    Scale: explode is narrow; the one shuffle is the (id, term) hash
    aggregation with map-side partial counts. No window, no join.
    """
    tok = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("dl"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    return tok.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def document_frequencies(tf: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """(term, df) from a ``term_frequencies`` output — one hash agg on
    term (each (id, term) row counts once, so count(*) IS the doc freq)."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_topk_terms(
    docs: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf (smooth
    idf = ln(n_docs / df); ties by term asc) — the standard keyword /
    topic-proxy extraction over a corpus.

    Scale: two hash aggs (tf, df) + one shuffle join on term (vocabulary
    is corpus-sized at 100 TB — NOT broadcastable; AQE picks the
    strategy) + a per-document window for the top-k. The window
    partitions by document id, so state is one doc's vocabulary, never
    global. n_docs is a 1-row aggregate crossJoined in (broadcast-class).
    """
    tf = term_frequencies(docs, id_col=id_col, text_col=text_col)
    dfreq = document_frequencies(tf, id_col=id_col)
    n = docs.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df")), 6
            ).alias("score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed query-term set:
    Σ_q idf(q) · tf/(tf + k1·(1 − b + b·dl/avgdl)), with the
    probabilistic idf = ln((N − df + 0.5)/(df + 0.5) + 1).

    Output: (id, score) for documents matching ≥1 query term.

    Scale: the query-term filter lands BEFORE both aggregations (isin is
    a pushable predicate on the exploded stream), so the (id, term)
    shuffle carries only matching terms. The per-term df table is ≤ |Q|
    rows → broadcast join. N and avgdl are a 1-row aggregate. The only
    data-proportional shuffle is the final per-document sum.
    """
    qset = [t.lower() for t in query_terms]
    tok = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("dl"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term").isin(qset))
    tf = tok.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.select(
        F.count(F.lit(1)).alias("__n"),
        F.avg(token_count(F.col(text_col))).alias("__avgdl"),
    )
    idf = F.log(
        (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("__avgdl")
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), (idf * F.col("tf") / denom).alias("__s"))
    )
    return per_term.groupBy(id_col).agg(
        F.round(F.sum("__s"), 6).alias("score")
    )


def hashed_bow_score(
    text: Column,
    *,
    dim: int = 1024,
    salt: str = "bow",
    weight_fn=None,
) -> Column:
    """Linear-model score over the hashed bag-of-words — the fastText-
    style quality-classifier scoring shape: each token hashes into one of
    ``dim`` buckets and contributes that bucket's weight; the document
    score is the sum. This is exactly how learned filter models (CCNet /
    DCLM-style quality classifiers) apply at corpus scale — the weights
    come from offline training; HERE the weight function is an injected
    Column expression over the bucket id.

    Default weights are the closed form (bucket % 7 − 3)/10 — a fixed
    pseudo-model that exercises the full scoring path and keeps the
    operator DuckDB-oracle-checkable; real deployments pass
    ``weight_fn``, a ``bucket Column → weight Column`` mapping (e.g.
    ``lambda b: F.element_at(weights_array, b + 1)`` over a broadcast
    array literal of trained weights).

    Pure Column expression (md5 → bucket → weight → sum fold): no UDF, no
    shuffle — scoring rides the scan like any projection.
    """
    toks = tokens(text)

    def bucket_of(tok: Column) -> Column:
        # 8 hex chars = unsigned 32-bit, so the % dim is never negative
        h = F.conv(
            F.substring(F.md5(F.concat(tok, F.lit(salt))), 1, 8), 16, 10
        ).cast("long")
        return h % F.lit(dim)

    if weight_fn is None:
        weight_fn = lambda b: ((b % 7) - 3).cast("double") / 10.0  # noqa: E731

    total = F.aggregate(
        F.filter(toks, lambda t: t != ""),  # blank text → [""] → score 0
        F.lit(0.0),
        lambda acc, tok: acc + weight_fn(bucket_of(tok)),
    )
    # + 0.0 normalizes the negative zero a ±w cancellation can leave
    # (repr(-0.0) != repr(0.0) breaks cross-engine value hashing)
    return F.round(total, 6) + F.lit(0.0)


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    *,
    overlap_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding token-window chunking — the context-window prep step every
    embedding/RAG pipeline runs before encoding: each document becomes
    ⌈(n − overlap)/(chunk − overlap)⌉ chunks of ``chunk_tokens``
    whitespace tokens, consecutive chunks sharing ``overlap_tokens``.

    Output: (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text) —
    chunk_id counts from 0 per document, chunk_start is the 0-based token
    offset (= chunk_id·stride), and the final chunk may run short rather
    than re-reading earlier tokens (deterministic layout: a document's
    chunking never depends on partitioning).

    Scale: tokenize once, generate starts with ``sequence`` and explode —
    a narrow per-row expansion (output rows ≈ input tokens / stride), no
    shuffle at all; chunk text is a ``slice`` + ``array_join`` over the
    carried token array.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = tokens(F.col(text_col))
    n = token_count(F.col(text_col))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    # drop a trailing start that would chunk ONLY overlap tokens already
    # seen (possible when overlap > 0 and n % stride <= overlap)
    exploded = exploded.where(
        (F.col("chunk_start") == 0)
        | (F.col("chunk_start") + F.lit(overlap_tokens) < F.size("__toks"))
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_start") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def fingerprint(text: Column) -> Column:
    """Deterministic rolling polynomial hash over the UTF-8 code points:
    h ← (h·31 + ascii(char)) mod 1e9+7. A strict left fold in index order —
    exact int64 arithmetic, reproducible across engines."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, c: (h * F.lit(31) + F.ascii(c)) % F.lit(_FP_MOD),
    )


def zipf_token_stats(docs: DataFrame, top: int = 20, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary head: the ``top`` most frequent tokens with
    their frequency rank — the Zipf-curve head every corpus health check
    plots (rank × freq ≈ const for natural text; a flat head flags
    boilerplate, a missing tail flags truncation).

    Scale: one explode + one hash aggregation over tokens; the global
    ordering is TakeOrderedAndProject (per-partition partial top-N,
    driver merges N rows) — the rank window then runs on ``top`` rows,
    not the vocabulary. Ties break lexicographically.

    Output: (token, rank, cnt).
    """
    counts = (
        docs.select(
            F.explode(
                F.filter(tokens(F.col(text_col)), lambda t: t != "")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return counts.select(
        "token", F.row_number().over(w).cast("bigint").alias("rank"), "cnt"
    )


# -- BPE tokenizer training (Sennrich, Haddow, Birch — "Neural Machine
# Translation of Rare Words with Subword Units", ACL 2016) -------------------


def _apply_merge(
    toks: Column, left: str, right: str, merged: str | None = None
) -> Column:
    """Apply one BPE merge to a token array: fuse every left-to-right
    non-overlapping (left, right) adjacency — the reference merge_word
    scan — as a pure-Column ``aggregate`` fold (state = (result, carry)),
    JVM-side, no UDF. ``merged`` names the fused token (default: plain
    concatenation; WordPiece passes ``left + right-without-'##'``)."""
    if merged is None:
        merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(state, tok):
        hit = state["carry"].eqNullSafe(F.lit(left)) & (tok == F.lit(right))
        return F.struct(
            F.when(hit, F.concat(state["acc"], F.array(F.lit(merged))))
            .when(
                state["carry"].isNull(), state["acc"]
            )
            .otherwise(F.concat(state["acc"], F.array(state["carry"])))
            .alias("acc"),
            F.when(hit, F.lit(None).cast("string")).otherwise(tok).alias("carry"),
        )

    def finish(state):
        return F.when(
            state["carry"].isNull(), state["acc"]
        ).otherwise(F.concat(state["acc"], F.array(state["carry"])))

    return F.aggregate(toks, init, step, finish)


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Distributed BPE training: learn ``n_merges`` merge rules over the
    corpus — the standard subword-tokenizer construction for LLM
    pipelines.

    Scale architecture (the map-reduce BPE): the corpus first collapses
    to the DISTINCT-WORD vocabulary with frequencies — one hash
    aggregation that shrinks 100 TB of text to a language-vocab-sized
    table — and every subsequent round runs on that vocab only:
    pair counts = explode(zip(toks, toks[1:])) + a freq-weighted hash
    agg; the winner is ONE collected row (count desc, then lexicographic
    (left, right) — a deterministic tiebreak); the merge application is
    the pure-Column fold in ``_apply_merge``. The driver holds only the
    merge table. Rounds are sequential by nature (each merge changes the
    next round's pair counts) — production batches thousands of merges by
    re-persisting the vocab every few rounds; here the vocab is
    persist()ed once and the tokenization column evolves lazily.

    Words are whitespace-split, lowercased, and end-marked with '</w>'
    (the Sennrich convention, so word-final subwords are distinct).
    Returns the learned merges in order: [(left, right), ...].

    No SQL oracle: the per-round argmax over evolving global state makes
    the computation iterative like IVF index build; verification is the
    exact-equality unit test against a from-scratch local reference
    implementation (tests/test_text.py), plus determinism under
    repartitioning.
    """
    vocab = bpe_word_vocab(docs, text_col=text_col).persist()
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


def bpe_word_vocab(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(freq, toks): the distinct-word vocabulary with frequencies, each
    word tokenized to chars + '</w>' — the one aggregation that collapses
    the corpus before BPE rounds. Shared by ``bpe_train`` and its
    registry oracle twin so the verified pair-count core can never drift
    from the trainer."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.concat(
                F.expr("filter(split(w, ''), x -> x != '')"),
                F.array(F.lit("</w>")),
            ).alias("toks"),
        )
    )


def bpe_pair_frequencies(vocab: DataFrame) -> DataFrame:
    """(left_tok, right_tok, n): frequency-weighted adjacent-pair counts
    over a (freq, toks) vocab — the per-round argmax input."""
    return (
        vocab.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(toks, 1, size(toks) - 1)"),
                    F.expr("slice(toks, 2, size(toks) - 1)"),
                )
            ).alias("p"),
        )
        .select(
            F.col("p.0").alias("left_tok"),
            F.col("p.1").alias("right_tok"),
            "freq",
        )
        .groupBy("left_tok", "right_tok")
        .agg(F.sum("freq").alias("n"))
    )


def bpe_encode(toks_text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Local reference encoder: apply the learned merges in order to one
    word (chars + '</w>'). Used by tests and by callers tokenizing
    driver-side samples; the distributed encode is ``_apply_merge``
    chained over a vocab column."""
    toks = list(toks_text) + ["</w>"]
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


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a freshly-trained BPE (r4): learn
    ``n_merges`` rules with :func:`bpe_train`, apply them, and return
    per-document (n_words, n_tokens) — the sequence-length accounting
    every training-data pipeline runs before packing.

    Scale architecture: the merge fold runs on the DISTINCT-WORD
    vocabulary only (language-sized), never per occurrence — each word's
    encoded length is computed once and joined back to the exploded
    word stream (a broadcast-class join: the vocab is a few hundred
    thousand rows for any natural language, regardless of corpus
    bytes). The merge application is the same pure-Column
    ``_apply_merge`` fold the trainer uses, so encode can never drift
    from training."""
    merges = bpe_train(docs, n_merges, text_col=text_col)
    words = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"),
        )
        .where(F.length("w") > 0)
    )
    vocab = words.select("w").distinct().select(
        "w",
        F.concat(
            F.expr("filter(split(w, ''), x -> x != '')"),
            F.array(F.lit("</w>")),
        ).alias("toks"),
    )
    for a, b in merges:
        vocab = vocab.select("w", _apply_merge(F.col("toks"), a, b).alias("toks"))
    per_word = vocab.select("w", F.size("toks").alias("n_toks"))
    return (
        words.join(F.broadcast(per_word), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )


def wordpiece_word_vocab(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(freq, toks) distinct-word vocabulary in the WordPiece convention
    (Schuster & Nakajima 2012; BERT, Devlin et al. 2019): first character
    plain, every later character '##'-prefixed — the continuation marker
    that keeps word-initial and word-internal subwords distinct (the role
    '</w>' plays for BPE). Same corpus→vocab collapse as
    :func:`bpe_word_vocab`: one hash aggregation, everything after runs
    on a language-vocab-sized table."""
    chars = F.expr(f"filter(split(lower({text_col}_w), ''), x -> x != '')")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                f"{text_col}_w"
            )
        )
        .where(F.length(f"{text_col}_w") > 0)
        .groupBy(f"{text_col}_w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.concat(
                F.slice(chars, 1, 1),
                F.transform(
                    F.slice(chars, 2, F.size(chars) - 1),
                    lambda c: F.concat(F.lit("##"), c),
                ),
            ).alias("toks"),
        )
    )


def _wp_merged_name(a: str, b: str) -> str:
    """The fused token keeps the LEFT token's continuation prefix; the
    right token's '##' disappears into the join ('t'+'##h'→'th',
    '##h'+'##e'→'##he')."""
    return a + (b[2:] if b.startswith("##") else b)


def wordpiece_train(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Distributed WordPiece training: like :func:`bpe_train` but the
    per-round argmax maximizes the LIKELIHOOD score
    ``count(ab) / (count(a)·count(b))`` (Schuster & Nakajima 2012) — the
    pair whose fusion most increases a unigram LM's corpus likelihood —
    instead of raw pair count. The published difference in one line:
    BPE merges the most frequent pair, WordPiece the most *surprising*
    one (frequent together relative to apart).

    Scale architecture is inherited unchanged from the BPE trainer:
    distinct-word collapse first, every round = pair counts + token
    counts (two vocab-bounded hash aggs) + a broadcast-joined score +
    a 1-row argmax collect; merges apply via the pure-Column
    ``_apply_merge`` fold. The score divides exact integer counts as
    doubles on both engines (the oracle replays the same IEEE ops), and
    ties break (left, right) lexicographic, so training is fully
    deterministic. Returns [(left, right), ...] in learned order."""
    vocab = wordpiece_word_vocab(docs, text_col=text_col).persist()
    vocab.count()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            pairs = bpe_pair_frequencies(vocab)
            tokfreq = (
                vocab.select(F.explode("toks").alias("t"), "freq")
                .groupBy("t")
                .agg(F.sum("freq").alias("tf"))
            )
            top = (
                pairs.join(
                    F.broadcast(
                        tokfreq.select(
                            F.col("t").alias("left_tok"), F.col("tf").alias("lf")
                        )
                    ),
                    "left_tok",
                )
                .join(
                    F.broadcast(
                        tokfreq.select(
                            F.col("t").alias("right_tok"), F.col("tf").alias("rf")
                        )
                    ),
                    "right_tok",
                )
                .select(
                    "left_tok",
                    "right_tok",
                    (
                        F.col("n").cast("double")
                        / (F.col("lf").cast("double") * F.col("rf").cast("double"))
                    ).alias("score"),
                )
                .orderBy(
                    F.desc("score"), F.asc("left_tok"), F.asc("right_tok")
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["left_tok"], top[0]["right_tok"]
            merges.append((a, b))
            new_vocab = vocab.select(
                "freq",
                _apply_merge(F.col("toks"), a, b, _wp_merged_name(a, b)).alias(
                    "toks"
                ),
            ).persist()
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
    return merges


def wordpiece_vocabulary(
    docs: DataFrame, n_merges: int, *, text_col: str = "text"
) -> list[str]:
    """The runtime token vocabulary a WordPiece training run ships: the
    corpus alphabet (every seen character, plain and '##'-marked) plus
    the ``n_merges`` learned fusions. This is what the greedy encoder
    matches against — merges themselves are NOT shipped (unlike BPE),
    which is why WordPiece encode is longest-match, not merge-replay."""
    alphabet = [
        r["t"]
        for r in wordpiece_word_vocab(docs, text_col=text_col)
        .select(F.explode("toks").alias("t"))
        .distinct()
        .collect()
    ]
    merged = [
        _wp_merged_name(a, b)
        for a, b in wordpiece_train(docs, n_merges, text_col=text_col)
    ]
    return sorted(set(alphabet) | set(merged))


def wordpiece_encode(word: str, vocab: set[str], unk: str = "[UNK]") -> list[str]:
    """Local reference encoder — BERT's runtime algorithm verbatim
    (greedy longest-prefix match; any unmatchable word becomes one
    [UNK]): at each position take the LONGEST vocab token matching the
    remaining text ('##'-prefixed after the first piece); if none
    matches, the whole word is [UNK]."""
    word = word.lower()
    out: list[str] = []
    pos = 0
    while pos < len(word):
        prefix = "##" if pos > 0 else ""
        end = len(word)
        piece = None
        while end > pos:
            cand = prefix + word[pos:end]
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        pos = end
    return out


def wordpiece_token_counts(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a freshly-trained WordPiece: train
    ``n_merges`` fusions, greedy-encode every DISTINCT word against the
    resulting vocabulary, and return per-document (n_words, n_tokens,
    n_unk).

    Scale architecture mirrors :func:`bpe_token_counts`: the greedy
    matcher runs once per distinct word (an Arrow-batched pandas UDF —
    per-character longest-match is genuinely imperative, but it touches
    only the language-vocab-sized word table, never the corpus), and the
    per-word token counts broadcast-join back to the exploded word
    stream. The vocabulary rides the UDF closure as a broadcast-sized
    frozenset."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    vocab = frozenset(wordpiece_vocabulary(docs, n_merges, text_col=text_col))

    def _enc(words):
        counts, unks = [], []
        for w in words:
            toks = wordpiece_encode(w, vocab)
            unk = 1 if toks == ["[UNK]"] else 0
            counts.append(len(toks))
            unks.append(unk)
        return pd.DataFrame({"n_toks": counts, "is_unk": unks})

    # real annotation objects: the module-wide `from __future__ import
    # annotations` would stringify inline hints and the UDF type inference
    # cannot resolve them against this closure
    _enc.__annotations__ = {"words": pd.Series, "return": pd.DataFrame}
    enc = pandas_udf(_enc, "n_toks long, is_unk int")

    words = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"),
        )
        .where(F.length("w") > 0)
    )
    per_word = (
        words.select("w").distinct().select("w", enc(F.col("w")).alias("e"))
    )
    return (
        words.join(F.broadcast(per_word), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("e.n_toks").alias("n_tokens"),
            F.sum("e.is_unk").cast("long").alias("n_unk"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, appendix A1.1 —
    the published heuristics MassiveWeb applied before training): word
    count bounds, mean word length bounds, symbol-to-word ratio,
    bullet/ellipsis line fractions, alphabetic-word fraction, and the
    ≥2-English-stopword requirement. Emits every metric plus the
    combined pass flag so a pipeline can audit WHICH rule dropped a
    page. Pure Column algebra — no UDF, one narrow projection.

    Degenerate pages (r5 adversarial fix): a 100 TB crawl contains
    NULL and empty documents, and under ANSI mode (Spark 4 default) a
    bare ratio raises DIVIDE_BY_ZERO and kills the whole job. NULL
    text is treated as empty; zero-word pages emit NULL for the
    per-word ratios and gopher_pass = false (the word-count rule
    already fails, and false AND NULL is false), never an error."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    lines = F.split(text, r"\n")
    n_lines = F.size(lines)

    def per_word(col: Column) -> Column:
        return F.when(n_words > 0, col / n_words)

    def per_line(col: Column) -> Column:
        return F.when(n_lines > 0, col / n_lines)

    def substr_count(col: Column, s: str) -> Column:
        return (
            (F.length(col) - F.length(F.replace(col, F.lit(s), F.lit(""))))
            / len(s)
        ).cast("long")

    mean_wl = per_word(
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
    )
    symbol_ratio = per_word(substr_count(text, "#") + substr_count(text, "..."))
    bullet_frac = per_line(
        F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]")))
    )
    ellipsis_frac = per_line(
        F.size(F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"\.\.\.$")))
    )
    alpha_frac = per_word(
        F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_frac, 4).alias("bullet_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_frac"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    passed = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_frac") <= 0.9)
        & (F.col("ellipsis_frac") <= 0.3)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return out.withColumn("gopher_pass", passed)


def c4_line_filter(docs: DataFrame, *, text_col: str = "page") -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2 — the published
    line-level heuristics behind the C4 corpus): keep only lines ending
    in terminal punctuation with ≥5 words and no 'javascript'; drop
    whole pages containing '{' or 'lorem ipsum' or with <3 retained
    lines. Returns per page the retained text (kept lines rejoined),
    the line accounting, and the page verdict. Pure Column algebra over
    a split-lines array — no UDF, no shuffle beyond the scan. NULL
    pages are treated as empty (r5): one empty line, nothing kept,
    page_kept = false — never a NULL verdict."""
    page = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(page, r"\n")
    kept = F.filter(
        lines,
        lambda ln: F.rtrim(ln).rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(ln, r"\s+"), lambda x: x != "")) >= 5)
        & ~F.lower(ln).contains("javascript"),
    )
    lower = F.lower(page)
    page_ok = (
        (F.size(kept) >= 3)
        & ~lower.contains("lorem ipsum")
        & ~page.contains("{")
    )
    return docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        page_ok.alias("page_kept"),
        F.when(page_ok, F.concat_ws("\n", kept)).otherwise(F.lit(""))
        .alias("kept_text"),
    )


def bigram_lm_perplexity(
    docs: DataFrame,
    *,
    train: Column | None = None,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under an add-α bigram language model
    trained on a slice of the corpus — the CCNet-style LM quality
    signal (Wenzek et al. 2020) computed with an HONEST in-corpus LM
    instead of the hashed-BoW proxy the `doc_ccnet_perplexity_buckets`
    query documents as a divergence: p(w|prev) = (c(prev,w) + α) /
    (c(prev) + α·V) with V the training vocabulary size; unseen
    histories back off to the uniform 1/V.

    Scale: training counts are two hash aggregations over the train
    slice (bigram table bounded by observed-bigram count, not corpus
    bytes); scoring is ONE equi-join of the corpus bigram stream
    against those counts plus a 1-row broadcast of (V). Returns
    (doc_id, n_bigrams, avg_logp, ppl); single-word documents carry no
    bigram evidence and are omitted (the caller's routing concern,
    like empty groups in the sketches)."""
    if train is None:
        train = F.col("lang") == "en"
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("w")),
    )
    pairs = docs.select(
        F.col(id_col), train.alias("is_train"), F.explode(bigrams).alias("bg")
    ).select(id_col, "is_train", F.col("bg.prev").alias("prev"),
             F.col("bg.w").alias("w"))
    train_pairs = pairs.where("is_train")
    c2 = train_pairs.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c2"))
    c1 = train_pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("c1"))
    # V = training vocabulary (distinct tokens incl. final positions)
    vocab = (
        docs.where(train)
        .select(F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda x: x != "")).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    scored = (
        pairs.join(c2, ["prev", "w"], "left")
        .join(c1, ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + alpha)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + alpha * F.col("v"))
                )
            ).alias("logp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("logp").alias("avg_logp"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round("avg_logp", 6).alias("avg_logp"),
            F.round(F.exp(-F.col("avg_logp")), 4).alias("ppl"),
        )
    )


def kneser_ney_trigram_perplexity(
    docs: DataFrame,
    *,
    train: Column | None = None,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under an INTERPOLATED KNESER-NEY trigram
    language model (Chen & Goodman 1999, the smoothing KenLM ships and
    CCNet's selection LM uses) trained on a slice of the corpus — the
    published upgrade over `bigram_lm_perplexity`'s add-α MLE. All
    counts derive from the within-document trigram stream (no
    sentence padding; documents shorter than 3 tokens carry no trigram
    evidence and are omitted, the established routing stance):

      p3(w|u,v) = (max(c(uvw)−D, 0) + D·N1+(uv·)·p2(w|v)) / c(uv·)
      p2(w|v)   = (max(N1+(·vw)−D, 0) + D·N1+(v··)·p1(w)) / N1+(·v·)
      p1(w)     = (max(N1+(·w)−D, 0) + D·W/(V+1)) / N1+(··)

    with D the single fixed discount, N1+ the Kneser-Ney CONTINUATION
    counts (distinct left-extensions, derived from the trigram type
    table), W the number of distinct continuation words, V the training
    vocabulary, and the D·W/(V+1) term the uniform leak that keeps
    fully-unseen tokens at positive probability (the OOV convention —
    one extra uniform slot — stated here because published KN leaves
    OOV handling to the implementation). Unseen histories back off one
    level exactly (c(uv·)=0 → p2; N1+(·v·)=0 → p1), the textbook rule.

    Scale: training collapses to the trigram TYPE table (bounded by
    distinct trigrams, not corpus bytes) and four hash re-aggregations
    of it; scoring is five equi-joins of the corpus trigram stream
    against those model tables plus one 1-row totals broadcast (the
    shape-proven BNLJ compose). No windows, no driver iteration.
    Returns (id, n_trigrams, avg_logp, ppl); avg_logp rounds at 6 and
    ppl at 4 AFTER per-document aggregation (sum-order ulp drift)."""
    if train is None:
        train = F.col("lang") == "en"
    D = F.lit(float(discount))
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = docs.select(
        F.col(id_col), train.alias("is_train"), toks.alias("tk")
    )
    tk = F.col("tk")
    tri = (
        base.where(F.size("tk") >= 3)
        .select(
            id_col,
            "is_train",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 2),
                    lambda i: F.struct(
                        F.element_at(tk, i).alias("u"),
                        F.element_at(tk, i + 1).alias("v"),
                        F.element_at(tk, i + 2).alias("w"),
                    ),
                )
            ).alias("t"),
        )
        .select(id_col, "is_train", "t.u", "t.v", "t.w")
    )
    c3 = tri.where("is_train").groupBy("u", "v", "w").agg(
        F.count(F.lit(1)).alias("c3")
    )
    h2 = c3.groupBy("u", "v").agg(
        F.sum("c3").alias("c2h"), F.count(F.lit(1)).alias("n3h")
    )
    cb = c3.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cb"))
    n1v = cb.groupBy("v").agg(
        F.sum("cb").alias("cvtot"), F.count(F.lit(1)).alias("cvty")
    )
    p1t = cb.groupBy("w").agg(F.count(F.lit(1)).alias("n1c"))
    tot = cb.agg(
        F.count(F.lit(1)).alias("btypes"),
        F.count_distinct("w").alias("wtypes"),
    )
    voc = (
        docs.where(train)
        .select(F.explode(toks).alias("w"))
        .agg(F.count_distinct("w").alias("vsz"))
    )
    p1 = (
        F.greatest(F.coalesce(F.col("n1c"), F.lit(0)) - D, F.lit(0.0))
        + D * F.col("wtypes") / (F.col("vsz") + F.lit(1.0))
    ) / F.col("btypes")
    p2 = F.when(F.col("cvtot").isNull(), p1).otherwise(
        (
            F.greatest(F.coalesce(F.col("cb"), F.lit(0)) - D, F.lit(0.0))
            + D * F.col("cvty") * p1
        )
        / F.col("cvtot")
    )
    p3 = F.when(F.col("c2h").isNull(), p2).otherwise(
        (
            F.greatest(F.coalesce(F.col("c3"), F.lit(0)) - D, F.lit(0.0))
            + D * F.col("n3h") * p2
        )
        / F.col("c2h")
    )
    scored = (
        tri.join(c3, ["u", "v", "w"], "left")
        .join(h2, ["u", "v"], "left")
        .join(cb, ["v", "w"], "left")
        .join(n1v, ["v"], "left")
        .join(p1t, ["w"], "left")
        .crossJoin(F.broadcast(tot.crossJoin(voc)))
        .select(id_col, F.log(p3).alias("logp"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.avg("logp").alias("avg_logp"),
        )
        .select(
            id_col,
            "n_trigrams",
            F.round("avg_logp", 6).alias("avg_logp"),
            F.round(F.exp(-F.col("avg_logp")), 4).alias("ppl"),
        )
    )


def nfc_normalize_col(col: Column) -> Column:
    """Unicode NFC normalization (UAX #15) of a string column, as an
    Arrow-batched pandas UDF over stdlib ``unicodedata`` — the
    canonical-composition pass every serious text pipeline runs before
    tokenization/dedup (decomposed `e`+COMBINING ACUTE and precomposed
    `é` must hash identically or every downstream dedup silently treats
    them as different documents). Python's unicodedata and DuckDB's
    utf8proc are INDEPENDENT implementations of the same UCD tables, so
    the oracle comparison is genuine interop evidence, not self-
    consistency. NULL passes through."""
    import pandas as _pd  # noqa: F401 — pandas_udf needs the runtime dep
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda t: None if t is None else unicodedata.normalize("NFC", t)
        )

    return _nfc(col)


def nfc_normalize_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document NFC accounting: the normalized text itself plus
    codepoint lengths before/after and a changed flag. Pure map over
    the scan (one Arrow batch exchange), zero shuffle at any corpus
    size. Codepoint semantics: Spark's length() counts codepoints on
    UTF8String exactly like DuckDB's length() — BMP and astral alike —
    so the columns hash portably."""
    inp = F.col(text_col)
    # materialize the UDF column once (a repeated UDF expression is not
    # guaranteed to dedup in the ArrowEvalPython extraction), then
    # derive the accounting from plain Columns
    once = docs.select(
        F.col(id_col), inp.alias("_in"), nfc_normalize_col(inp).alias("text_nfc")
    )
    return once.select(
        id_col,
        F.length("_in").cast("int").alias("n_cp_in"),
        F.length("text_nfc").cast("int").alias("n_cp_nfc"),
        (F.col("text_nfc") != F.col("_in")).alias("changed"),
        "text_nfc",
    )


# -- HTML text extraction (round 5) -----------------------------------------

# Tag/entity passes shared by html_extract_text and its oracle builder.
# Patterns are written in the RE2-compatible subset (inline (?is) flags,
# non-greedy, ASCII \b and character classes, no lookaround/backrefs) so
# Java regex (Spark, whole-stage codegen) and RE2 (DuckDB) agree — the
# driver hash over the full extracted text IS the interop check.
HTML_BLOCK_TAGS = "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|section|article"
HTML_STRIP_PASSES = (
    (r"(?is)<head\b[^>]*>.*?</head\s*>", " "),
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (rf"(?is)</?({HTML_BLOCK_TAGS})\b[^>]*/?>", "\n"),
    (r"(?s)<[^>]*>", " "),
)
# decode order matters: &amp; LAST so "&amp;lt;" yields "&lt;" not "<"
HTML_ENTITY_PASSES = (
    ("&nbsp;", " "),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&quot;", '"'),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
)
HTML_WS_PASSES = (
    (r"[ \t\r\f]+", " "),
    (r" *\n *", "\n"),
    (r"\n{3,}", "\n\n"),
)


def html_extract_text(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """HTML → clean text, the step C4/CCNet run on every crawled page
    before any quality scoring or dedup: drop script/style/comment
    subtrees, turn block-level tags into line breaks, strip remaining
    tags, decode the common entities, and normalize whitespace.

    Spark-first: the WHOLE pass is a chain of built-in regexp_replace /
    replace Columns — it runs inside whole-stage codegen with zero
    Python in the hot path, trivially parallel over pages (narrow plan,
    no shuffle). The oracle replays the identical RE2-safe patterns in
    DuckDB, so the driver hash over the full cleaned text cross-checks
    two independent regex engines (Java util.regex vs RE2)."""
    c = F.col(html_col)
    for pat, repl in HTML_STRIP_PASSES:
        c = F.regexp_replace(c, pat, repl)
    for lit, repl in HTML_ENTITY_PASSES:
        c = F.replace(c, F.lit(lit), F.lit(repl))
    for pat, repl in HTML_WS_PASSES:
        c = F.regexp_replace(c, pat, repl)
    # btrim with an explicit charset: Java's `$` matches before a final
    # newline while RE2's doesn't, so anchored-regex trimming would be a
    # dialect trap — char-set trim is identical in both engines
    c = F.btrim(c, F.lit(" \n"))
    return docs.select(
        "doc_id",
        c.alias("clean_text"),
        F.length(c).cast("int").alias("n_chars"),
        (F.size(F.split(c, "\n", -1))).cast("int").alias("n_lines"),
    )


def html_extract_oracle_exprs() -> str:
    """The DuckDB expression mirroring html_extract_text for a column
    named ``html`` — kept next to the passes so adding a pass updates
    both engines together."""
    expr = "html"
    for pat, repl in HTML_STRIP_PASSES:
        sq = repl.replace("\n", "' || chr(10) || '")
        expr = f"regexp_replace({expr}, '{pat}', '{sq}', 'g')"
    for lit, repl in HTML_ENTITY_PASSES:
        lit_sql = lit.replace("'", "''")
        repl_sql = repl.replace("'", "''")
        expr = f"replace({expr}, '{lit_sql}', '{repl_sql}')"
    for pat, repl in HTML_WS_PASSES:
        sq = repl.replace("\n", "' || chr(10) || '")
        expr = f"regexp_replace({expr}, '{pat}', '{sq}', 'g')"
    return f"trim({expr}, ' ' || chr(10))"


# -- mojibake repair (round 5) -----------------------------------------------


def fix_mojibake(s: str, max_passes: int = 3) -> str:
    """Repair UTF-8-read-as-Latin-1/CP1252 double encoding (the ftfy
    core move, reimplemented from the encoding algebra): if the text
    round-trips through cp1252/latin-1 BACK into valid UTF-8, it was
    mojibake — apply, repeat up to ``max_passes`` (triple-encoded text
    exists in real crawls). The repair is refused unless the reverse
    trip is exact, so clean text that merely LOOKS suspicious (a real
    'Ã©' in a linguistics article about mojibake) is only rewritten
    when it genuinely decodes; pure-ASCII text can never change."""
    for _ in range(max_passes):
        if s.isascii():
            return s
        try:
            # cp1252 first (the web's "latin-1"): its 0x80-0x9F block is
            # where â€™-class smart-quote mojibake lives; fall back to
            # latin-1 for the 5 unmapped cp1252 bytes
            try:
                raw = s.encode("cp1252")
            except UnicodeEncodeError:
                raw = s.encode("latin-1")
            fixed = raw.decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s
        if fixed == s:
            return s
        s = fixed
    return s


MOJIBAKE_MARKERS = ("Ã", "Â", "â€", "ðŸ")


def mojibake_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fixed text, marker/repair flags): suspected = any
    classic double-encoding marker present; repaired = the reverse
    round-trip actually changed the text. Arrow-batched pandas UDF over
    a narrow projection — no shuffle."""
    from pyspark.sql.types import StringType

    _fix = F.pandas_udf(
        lambda s: s.map(lambda t: fix_mojibake(t) if t is not None else None),
        returnType=StringType(),
    )
    fixed = _fix(F.col(text_col))
    suspected = F.lit(False)
    for m in MOJIBAKE_MARKERS:
        suspected = suspected | F.col(text_col).contains(m)
    return docs.select(
        "doc_id",
        fixed.alias("text_fixed"),
        suspected.alias("suspected"),
        (fixed != F.col(text_col)).alias("repaired"),
        F.length(fixed).cast("int").alias("n_chars_fixed"),
    )


# -- accent folding (round 5) --------------------------------------------------


def fold_accents(s: str) -> str:
    """Search-normalization fold: NFD-decompose, drop combining marks
    (category Mn), lowercase — 'Café' and 'cafe' collide, the index/
    dedup normalization every search stack applies. Letters that are
    NOT accents survive (ł, ø, ß: stripping them would be lossy
    transliteration, a different operation)."""
    import unicodedata

    nfd = unicodedata.normalize("NFD", s)
    return "".join(c for c in nfd if unicodedata.category(c) != "Mn").lower()


def accent_fold_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, folded text, changed flag, codepoint delta) via one
    Arrow batch; DuckDB's utf8proc lower(strip_accents()) is the
    independent oracle implementation."""
    from pyspark.sql.types import StringType

    _fold = F.pandas_udf(
        lambda s: s.map(lambda t: fold_accents(t) if t is not None else None),
        returnType=StringType(),
    )
    folded = _fold(F.col(text_col))
    return docs.select(
        "doc_id",
        folded.alias("text_folded"),
        (folded != F.col(text_col)).alias("changed"),
        (F.length(F.col(text_col)) - F.length(folded)).cast("int").alias("cp_delta"),
    )


# -- character entropy (round 5) -----------------------------------------------


def char_entropy_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-0 Shannon character entropy per document — the classic
    "is this text or noise/binary/boilerplate" quality signal (low
    entropy ⇒ repeated boilerplate, high ⇒ random bytes; natural prose
    sits ~4 bits/char).

    Computed ENTIRELY in-row with zero shuffle: the char array is
    sorted and folded once to accumulate run lengths (the
    _max_multiplicity technique), emitting per-run quantized terms
    round(1e6·(c/n)·log2(n/c)) that SUM to the entropy — integer sums
    are order-free exact, so the only cross-engine hazard is a 1-ulp
    log2 difference landing within 5e-7 of a rounding boundary
    (~1e-10 per term). Also emits n_chars, n_distinct, and the max
    run (most-common-char count)."""
    t = F.col(text_col)
    chars = F.array_sort(F.split(t, ""))
    n = F.size(chars)

    def step(a, x):
        run = F.when(a["prev"].eqNullSafe(x), a["run"] + 1).otherwise(F.lit(1))
        # on run CLOSE (new char differs from prev), bank the finished
        # run's entropy term and distinct-count increment
        closing = (~a["prev"].eqNullSafe(x)) & (a["run"] > 0)
        term = F.round(
            F.lit(1_000_000)
            * (a["run"].cast("double") / n)
            * F.log2(n.cast("double") / a["run"]),
            0,
        ).cast("long")
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(closing, a["ent_q6"] + term).otherwise(a["ent_q6"]).alias("ent_q6"),
            F.when(closing, a["n_distinct"] + 1).otherwise(a["n_distinct"]).alias("n_distinct"),
            F.greatest(a["best"], run).alias("best"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("long").alias("ent_q6"),
        F.lit(0).cast("int").alias("n_distinct"),
        F.lit(0).cast("int").alias("best"),
    )

    def fin(a):
        # bank the final open run
        term = F.round(
            F.lit(1_000_000)
            * (a["run"].cast("double") / n)
            * F.log2(n.cast("double") / a["run"]),
            0,
        ).cast("long")
        has = a["run"] > 0
        return F.struct(
            F.when(has, a["ent_q6"] + term).otherwise(a["ent_q6"]).alias("ent_q6"),
            F.when(has, a["n_distinct"] + 1).otherwise(a["n_distinct"]).alias("n_distinct"),
            a["best"].alias("best"),
        )

    acc = F.aggregate(chars, init, step, fin)
    empty = F.trim(t) == ""
    return docs.select(
        "doc_id",
        F.when(empty, F.lit(0)).otherwise(n).cast("int").alias("n_chars"),
        F.when(empty, F.lit(0)).otherwise(acc["n_distinct"]).cast("int").alias("n_distinct"),
        F.when(empty, F.lit(0)).otherwise(acc["best"]).cast("int").alias("max_run"),
        F.when(empty, F.lit(0)).otherwise(acc["ent_q6"]).cast("long").alias("entropy_q6"),
    )


# --- main-content extraction (r6) ------------------------------------------

#: block-boundary tags (opening or closing): the segmentation jusText/
#: Kohlschütter-class boilerplate removal works on.
HTML_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|section|article|main|body|html|h[1-6]|li|ul|ol"
    r"|table|tr|td|nav|footer|header|aside|br)[^>]*>"
)
_INLINE_TAG_RE = r"(?is)<[^>]*>"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def html_main_content(
    docs: DataFrame,
    html_col: str = "html",
    *,
    min_chars: int = 20,
    max_link_density_pct: int = 50,
) -> DataFrame:
    """Boilerplate removal by the classic block/link-density heuristic
    (the deterministic core of jusText / Kohlschütter et al.'s
    boilerplate detection, both published): segment the page at
    block-level tags, keep blocks whose visible text is ≥ ``min_chars``
    AND whose anchor-text share is ≤ ``max_link_density_pct`` % —
    navigation, footers and link farms are short and link-dense, body
    prose is long and link-sparse. Density compares in INTEGER percent
    (100·link_chars ≤ pct·chars) so both engines decide identically
    with zero float hazard.

    Documented subset (DIVERGENCES.md): no DOM, no classifier features
    beyond (length, link density) — the two features the published
    heuristics agree carry most of the signal; entity decoding is the
    caller's composition with html_extract_text.

    Spark shape: pure Column end to end — one regexp block split, then
    higher-order filter/transform/aggregate over the block array; zero
    Python, zero shuffle, narrow plan."""
    sent = "\x01"
    blocks = F.split(
        F.regexp_replace(F.col(html_col), HTML_BLOCK_TAG_RE, sent), sent, -1
    )

    def btext(b: Column) -> Column:
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(b, _INLINE_TAG_RE, " "), r"\s+", " "
            )
        )

    def link_len(b: Column) -> Column:
        return F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR_RE), F.lit(1)),
            F.lit(0),
            lambda acc, x: acc + F.length(btext(x)),
        )

    kept = F.filter(
        blocks,
        lambda b: (F.length(btext(b)) >= min_chars)
        & (
            link_len(b) * 100
            <= F.length(btext(b)) * max_link_density_pct
        ),
    )
    main = F.array_join(F.transform(kept, btext), "\n")
    return docs.select(
        "doc_id",
        main.alias("main_text"),
        F.size(kept).cast("int").alias("n_blocks_kept"),
        F.size(blocks).cast("int").alias("n_blocks_total"),
    )
