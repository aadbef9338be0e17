"""Round-6 adversarial review pass over the r5-continuation surface
(VERDICT r5 task #5): spectral edge clips, urlnorm hostile encodings,
linkage beyond-BMP unicode, phash geometry guards, suffix-array hostile
corpora. Each test either pins a FIX made this round or pins an edge
behavior as deliberate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.urlnorm import normalize_url


# --- urlnorm ------------------------------------------------------------


def test_host_percent_decode_is_case_folded_and_idempotent():
    # r6 FIX: %41 in the HOST decodes to 'A' which must case-fold —
    # before the fix normalize_url('http://h%41/') returned 'http://hA/'
    # (not idempotent; host is case-insensitive per RFC 3986 §6.2.2.1).
    assert normalize_url("http://h%41/") == "http://ha/"
    assert normalize_url("http://h%41:80/x") == "http://ha/x"
    # non-unreserved / non-ASCII triplets in the host stay encoded,
    # hex uppercased
    assert normalize_url("http://h%c3%a9.com/") == "http://h%C3%A9.com/"
    # userinfo stays case-SENSITIVE: decoded %41 remains 'A'
    assert normalize_url("http://%41@h/") == "http://A@h/"
    for u in ("http://h%41/", "http://h%c3%a9.com/", "http://%41@h/"):
        once = normalize_url(u)
        assert normalize_url(once) == once


def test_astral_plane_percent_triplets_preserved():
    # 4-byte UTF-8 (emoji) percent sequences: never decoded, hex upper
    assert normalize_url("http://h/%f0%9f%98%80") == "http://h/%F0%9F%98%80"
    assert normalize_url(normalize_url("http://h/%f0%9f%98%80")) == "http://h/%F0%9F%98%80"


def test_ipv6_authority_canonicalizes():
    # r6 FIX: bracketed IP literals split at the colon AFTER ']' (the
    # old partition-on-first-colon left everything past the first colon
    # un-folded); hex lowercases per RFC 5952, default ports strip
    for u in ("http://[::1]/x", "http://[::1]:8080/x", "http://[2001:db8::a]/"):
        out = normalize_url(u)
        assert normalize_url(out) == out
    assert normalize_url("http://[::1]:8080/x") == "http://[::1]:8080/x"
    assert normalize_url("http://[2001:DB8::A]/") == "http://[2001:db8::a]/"
    assert normalize_url("HTTP://[::1]:80/x") == "http://[::1]/x"
    assert normalize_url("http://u@[::1]:8080/") == "http://u@[::1]:8080/"


def test_dot_segment_overflow_and_empty_authority():
    assert normalize_url("http://h/../../..") == "http://h/"
    assert normalize_url("http:///path") == "http:///path"
    assert normalize_url(normalize_url("http:///path")) == "http:///path"


# --- linkage ------------------------------------------------------------


def test_jw_codepoint_bijection_equivalence():
    # JW depends only on the equality pattern of symbols and lengths, so
    # any codepoint bijection preserves the score exactly. The ASCII
    # image is what the DuckDB fuzz verifies; this extends the guarantee
    # beyond BMP without a second Unicode implementation.
    from prom_etl_db_spark.functions.linkage import jaro_winkler

    cases = [
        ("καλημέρα", "καλησπέρα"),
        ("日本語処理", "日本語所理"),
        ("a😀b😀", "😀ab😀"),
    ]
    for s1, s2 in cases:
        alphabet = sorted(set(s1 + s2))
        m = {c: chr(ord("a") + i) for i, c in enumerate(alphabet)}
        t1 = "".join(m[c] for c in s1)
        t2 = "".join(m[c] for c in s2)
        assert jaro_winkler(s1, s2) == pytest.approx(jaro_winkler(t1, t2), abs=0)


def test_jw_prefix_boost_caps_at_four():
    from prom_etl_db_spark.functions.linkage import jaro_winkler

    # 10-char shared prefix must boost exactly as a 4-char one
    a, b = "abcdefghijX", "abcdefghijY"
    j = (10 / 11 + 10 / 11 + 1.0) / 3
    assert jaro_winkler(a, b) == pytest.approx(j + 4 * 0.1 * (1 - j), abs=1e-12)


# --- spectral -----------------------------------------------------------


def test_spectrogram_short_and_empty_clips_yield_no_frames(spark):
    from prom_etl_db_spark.functions.spectral import N_FFT, spectrogram_power

    def tiny_synth(mid):
        # mid 0 → empty clip; mid 1 → shorter than one frame
        return np.zeros(0 if mid == 0 else N_FFT - 1, dtype=np.int64)

    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")
    out = spectrogram_power(docs, synth=tiny_synth)
    assert out.count() == 0  # no frames, no crash


def test_vad_all_silence_clip_absent(spark):
    from prom_etl_db_spark.functions import spectral

    # threshold above every frame's energy (tone frames peak ~1.8e17) →
    # zero active frames → the clip is absent from the segment output
    # (documented: no speech)
    docs = spark.createDataFrame([(3,)], "doc_id long")
    out = spectral.vad_segments(docs, threshold=10**18)
    assert out.count() == 0


def test_vad_island_edges_exact(spark):
    from prom_etl_db_spark.functions import spectral

    # the planted fixture alternates tone/noise; islands must be maximal
    # runs: every segment's frames are consecutive and disjoint
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    rows = spectral.vad_segments(docs).collect()
    assert rows, "fixture must produce at least one voiced segment"
    by_clip: dict[int, list] = {}
    for r in rows:
        assert r["end_frame"] - r["start_frame"] + 1 == r["n_frames"]
        by_clip.setdefault(r["media_id"], []).append(r)
    for segs in by_clip.values():
        segs.sort(key=lambda r: r["start_frame"])
        for p, q in zip(segs, segs[1:]):
            # maximality: a gap of at least one silent frame between
            # consecutive islands, else they would be one island
            assert q["start_frame"] > p["end_frame"] + 1


# --- phash --------------------------------------------------------------


def test_dhash_rejects_non_fixture_geometry_loudly():
    from prom_etl_db_spark.functions.phash import dhash_bands

    with pytest.raises(ValueError):
        dhash_bands(np.zeros((1, 37), dtype=np.uint8))  # 1×N: loud, not wrong


def test_phash_neardup_rejects_incomplete_banding():
    from prom_etl_db_spark.functions.phash import phash_neardup_pairs

    with pytest.raises(ValueError):
        phash_neardup_pairs(None, max_ham=8)


# --- suffix array -------------------------------------------------------


def test_suffix_all_identical_corpus(spark):
    from prom_etl_db_spark.functions.suffix import substring_dedup_rewrite

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(4)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in substring_dedup_rewrite(docs, min_len=3).collect()}
    assert set(rows) == {0, 1, 2, 3}
    # exactly the kept occurrences survive: total removed = 3 full docs'
    # worth of tokens (one occurrence of the 5-token span kept corpus-wide)
    assert sum(r["n_removed"] for r in rows.values()) == 15
    survivors = [r for r in rows.values() if r["n_removed"] == 0]
    assert len(survivors) == 1 and survivors[0]["kept_text"] == "alpha beta gamma delta epsilon"


def test_suffix_single_token_docs(spark):
    from prom_etl_db_spark.functions.suffix import suffix_array_with_lcp

    docs = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, "y")], "doc_id long, text string"
    )
    sa = suffix_array_with_lcp(docs).collect()
    # 3 tokens + 3 sentinels = 6 suffixes, ranks a permutation of 0..5
    assert sorted(r["sa_rank"] for r in sa) == list(range(6))
    # single shared tokens repeat at length 1 only; no lcp can exceed 1
    # followed by distinct sentinels
    assert max(r["lcp_prev"] for r in sa) <= 1


def test_suffix_sentinel_char_in_text_is_scrubbed(spark):
    from prom_etl_db_spark.functions.suffix import substring_dedup_rewrite

    # r6 FIX: a real token spelled '\x02<digits>' used to collide with
    # another document's sentinel (phantom cross-doc fence break) and be
    # dropped from the rewrite. Now \x02 is scrubbed to whitespace.
    docs = spark.createDataFrame(
        [(0, "safe \x021 token safe2"), (1, "plain text here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in substring_dedup_rewrite(docs, min_len=50).collect()}
    # '\x021' becomes a standalone token '1' after scrubbing
    assert rows[0]["kept_text"] == "safe 1 token safe2"
    assert rows[0]["n_removed"] == 0


def test_suffix_empty_doc_absent_from_rewrite(spark):
    from prom_etl_db_spark.functions.suffix import substring_dedup_rewrite

    docs = spark.createDataFrame(
        [(0, "some real text"), (1, "   "), (2, "")],
        "doc_id long, text string",
    )
    out = substring_dedup_rewrite(docs, min_len=50)
    assert [r["doc_id"] for r in out.collect()] == [0]  # documented edge


# --- graph: integer PageRank --------------------------------------------


def test_pagerank_integer_matches_hand_computation(spark):
    from prom_etl_db_spark.functions.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2), (0, 1)],  # duplicate edge collapses
        "src long, dst long",
    )
    got = sorted(
        (r["node"], r["pr_q9"]) for r in pagerank_integer(edges, n_iter=3).collect()
    )
    r = {0: 333333333, 1: 333333333, 2: 333333333}
    deg = {0: 2, 1: 1, 2: 1}
    for _ in range(3):
        inc = {0: 0, 1: 0, 2: 0}
        for s, d in [(0, 1), (1, 2), (2, 0), (0, 2)]:
            inc[d] += (17 * r[s]) // (20 * deg[s])
        r = {n: 50000000 + inc[n] for n in r}
    assert got == sorted(r.items())


def test_pagerank_sink_node_and_source_only_node(spark):
    from prom_etl_db_spark.functions.graph import pagerank_integer

    # 0 -> 1 (1 is dangling: mass leaks, stays at base + incoming);
    # 2 -> 1 (2 has no in-links: settles at teleport base)
    edges = spark.createDataFrame([(0, 1), (2, 1)], "src long, dst long")
    got = {r["node"]: r["pr_q9"] for r in pagerank_integer(edges, n_iter=2).collect()}
    base = (3 * 10**9) // (20 * 3)
    r0 = 10**9 // 3
    # iter1: 1 gets base + floor(17*r0/20) from 0 and from 2; 0 and 2 get base
    it1 = {0: base, 2: base, 1: base + 2 * ((17 * r0) // 20)}
    it2 = {0: base, 2: base, 1: base + 2 * ((17 * it1[0]) // 20)}
    assert got == it2


# --- graph: truncated integer harmonic centrality -------------------------


def test_harmonic_matches_hand_bfs(spark):
    from prom_etl_db_spark.functions.graph import harmonic_centrality_integer

    # path 0→1→2→3 plus shortcut 0→2: d(0,2)=1 (shortcut wins), d(0,3)=2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], "src long, dst long"
    )
    got = {
        r["node"]: r["harmonic_q6"]
        for r in harmonic_centrality_integer(edges, radius=8).collect()
    }
    M = 1_000_000
    assert got == {
        0: 0,                       # no in-links
        1: M,                       # from 0 at d=1
        2: M + M,                   # from 0 at d=1 (shortcut), from 1 at d=1
        3: M + M // 2 + M // 2,     # from 2 d=1, from 1 d=2, from 0 d=2
    }


def test_harmonic_radius_truncation_and_cycle(spark):
    from prom_etl_db_spark.functions.graph import harmonic_centrality_integer

    # 5-cycle: within radius 2 each node sees exactly d=1 and d=2
    edges = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    got = {
        r["node"]: r["harmonic_q6"]
        for r in harmonic_centrality_integer(edges, radius=2).collect()
    }
    assert got == {i: 1_000_000 + 500_000 for i in range(5)}
    # full radius: d=1..4 → 1 + 1/2 + 1/3 + 1/4 floored per term
    got4 = {
        r["node"]: r["harmonic_q6"]
        for r in harmonic_centrality_integer(edges, radius=8).collect()
    }
    want = 1_000_000 + 500_000 + 333_333 + 250_000
    assert got4 == {i: want for i in range(5)}


def test_harmonic_early_exit_on_empty_frontier(spark):
    from prom_etl_db_spark.functions.graph import harmonic_centrality_integer

    # single edge: the frontier empties after round 1; radius 8 must not
    # schedule seven empty rounds of work that change the answer
    edges = spark.createDataFrame([(7, 9)], "src long, dst long")
    got = {
        r["node"]: r["harmonic_q6"]
        for r in harmonic_centrality_integer(edges, radius=8).collect()
    }
    assert got == {7: 0, 9: 1_000_000}
