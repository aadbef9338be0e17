"""SURVEY.md §2.E — byte-level BPE (GPT-2 / tiktoken family, round 6).

The recursive-CTE training-replay oracle pattern from
``bpe_learned_merges`` (registry/extensions.py), adapted to the
byte-level convention: pre-tokens from the GPT-2 category split (leading
space attached — the space-marker convention), base alphabet = UTF-8
bytes as hex pairs (``hex(encode(w))`` on both engines), merges = hex
concatenation. See functions/bytebpe.py for the documented
pre-tokenizer divergence (RE2 has no lookahead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from prom_etl_db_spark.functions import bytebpe
from prom_etl_db_spark.registry.core import _t, register

# The module's PRETOKEN_RE as a DuckDB string literal (apostrophe
# doubled; backslashes survive verbatim in a non-escaped literal).
_RE_SQL = "'''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'"

_BYTEBPE_STEPS_CTES = rf"""
words AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_extract_all(text, {_RE_SQL})) AS w FROM documents)
  GROUP BY w
), vocab0 AS (
  -- Each pre-token as ' b1  b2 ... bn ' over hex-pair byte symbols
  -- (single-space wrap, double-space separators). Hex pairs can never
  -- contain whitespace, so the encoding is unambiguous and replace()'s
  -- left-to-right non-overlapping substitution IS the trainer's greedy
  -- carry-fold (the bpe_learned_merges replay technique).
  SELECT list(struct_pack(w := w, freq := freq,
    s := ' ' || array_to_string(
           regexp_extract_all(hex(encode(w)), '[0-9A-F]{{2}}'), '  ') || ' ')) AS vocab
  FROM words
), steps AS (
  SELECT 0 AS i, CAST(NULL AS STRUCT(a VARCHAR, b VARCHAR)) AS m, vocab FROM vocab0
  UNION ALL
  SELECT i + 1, win,
    list_transform(vocab, v -> struct_pack(w := v.w, freq := v.freq,
      s := replace(v.s, ' ' || win.a || '  ' || win.b || ' ',
                        ' ' || win.a || win.b || ' ')))
  FROM (
    SELECT i, vocab,
      (SELECT struct_pack(a := l, b := r)
       FROM (
         SELECT tk[x] AS l, tk[x+1] AS r, sum(freq) AS n
         FROM (SELECT u.freq AS freq,
                      string_split(trim(u.s, ' '), '  ') AS tk
               FROM unnest(vocab) AS t(u)),
              unnest(range(1, len(tk))) AS g(x)
         GROUP BY 1, 2)
       ORDER BY n DESC, l, r LIMIT 1) AS win
    FROM steps WHERE i < 10
  )
)"""


@register(
    "bytebpe_learned_merges",
    oracle=f"""
WITH RECURSIVE {_BYTEBPE_STEPS_CTES}
SELECT CAST(i AS BIGINT) AS rank, m.a AS left_tok, m.b AS right_tok,
       m.a || m.b AS merged
FROM steps WHERE i >= 1 ORDER BY rank
""",
)
def bytebpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE training (functions/bytebpe.py, GPT-2 §2.2): 10
    learned merge rules over the documents corpus — pre-tokens keep
    their leading space, the base alphabet is UTF-8 bytes as hex pairs,
    so encode is total (no UNK). The oracle replays the trainer exactly
    as a DuckDB recursive CTE: each step recomputes frequency-weighted
    pair counts over the collapsed pre-token vocab, takes the (count
    desc, pair asc) argmax, and applies the merge by space-delimited
    string replace. Also exact-equality unit-tested against a
    from-scratch local encoder on multibyte (non-ASCII) input."""
    docs = _t(spark, sf_dir, "documents")
    merges = bytebpe.bytebpe_train(docs, 10)
    return spark.createDataFrame(
        [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank long, left_tok string, right_tok string, merged string",
    )


@register(
    "bytebpe_encoded_token_counts",
    oracle=f"""
WITH RECURSIVE {_BYTEBPE_STEPS_CTES},
wtoks AS (
  SELECT u.w AS w,
         len(string_split(trim(u.s, ' '), '  ')) AS n_toks,
         octet_length(encode(u.w)) AS n_bytes
  FROM (SELECT vocab FROM steps WHERE i = 10), unnest(vocab) AS t(u)
), docwords AS (
  SELECT doc_id, unnest(regexp_extract_all(text, {_RE_SQL})) AS w
  FROM documents
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_pretokens,
       CAST(sum(wt.n_bytes) AS BIGINT) AS n_bytes,
       CAST(sum(wt.n_toks) AS BIGINT) AS n_tokens
FROM docwords d JOIN wtoks wt USING (w)
GROUP BY d.doc_id
""",
)
def bytebpe_encoded_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE ENCODE end to end (the trainer's dual): train 10
    merges, encode every pre-token with the same pure-Column carry-fold,
    and return per-document (n_pretokens, n_bytes, n_tokens) — the
    sequence-length accounting packing runs on, with bytes alongside so
    bytes/token compression falls out downstream. The oracle replays
    training via the recursive CTE (carrying each pre-token through the
    merge steps) and joins the final per-pre-token counts back to the
    exploded corpus — one hash checks the argmax loop, the greedy
    merge application, and the join-back accounting together. Scale:
    the fold runs on the distinct-pre-token vocab only; the join back
    is broadcast-class."""
    docs = _t(spark, sf_dir, "documents")
    return bytebpe.bytebpe_token_counts(docs, 10)
