"""The engine's query registry — the correctness-gated surface.

One entry per implemented operator from SURVEY.md §2 (A/B/C rows, T1, and
the §2.E extensions). Each registered query is a ``(spark, sf_dir) →
DataFrame`` callable plus (where SQL-expressible) an equivalent ANSI-SQL
oracle that DuckDB runs over the same parquet tables; the driver hash-
compares the two (row count + schema + order-insensitive value hash).

Conventions keeping the hash comparison honest:

- every computed column is aliased identically in Spark and SQL;
- double aggregates are ``round(x, 4)`` (ratios: 6) on BOTH sides —
  engines sum partitions in different orders, so raw doubles can differ in
  the last ulp;
- all orderings that feed a LIMIT carry an explicit unique tiebreaker;
- "now" is FROZEN (the fixture is static; and the reference's mutable-now
  design is precisely what froze its production ingestion —
  /root/reference/REPAIR.md:5).
"""


from __future__ import annotations

# Registry assembly: importing each section module registers its queries
# (the @register decorator appends to the shared dicts in registry.core).
# IMPORT ORDER IS LOAD-BEARING: definition order is the gate-window tail
# order after _GATE_PRIORITY is applied. The public surface of this
# module is unchanged by the round-5 split: QUERIES, ORACLES (and the
# helpers, re-exported for any external user).
from prom_etl_db_spark.registry.core import (  # noqa: F401
    FLAGSHIP_DAY,
    NOW,
    ORACLES,
    QUERIES,
    _event_samples,
    _events,
    _t,
    register,
)
from prom_etl_db_spark.registry import (  # noqa: F401,E402  (order matters)
    flagship,
    promql_b,
    pipeline_a,
    sql_c,
    star_sql,
    llm_e,
    llm_media,
    llm_promql,
    llm_curation,
    extensions,
    ext_text,
    ext_media,
    ext_audio_web,
    web,
    tokenizers,
)


# ---------------------------------------------------------------------------
# Gate-window rotation.
#
# The external correctness gate samples the FIRST 50 registry entries per
# round. Definition order above stays grouped by subsystem for readers;
# this list is the only place gate order is decided.
#
# Round-5 window composition: the new-query block grew to ~24 entries as
# the r5 continuation added operators (every one locally green at sf0.001
# AND sf0.01 under --pandas-canon before registration), so ~26 slots
# remain for the stale rotation below — fewer than VERDICT r4's ≥40-slot
# ask, a deliberate trade: never-driver-checked queries outrank
# r2-stale-but-once-green ones. Round-6 rotation should lead with (a) the
# r2-stale entries below that fell past slot 50 this round, then (b) the
# remaining r2-stale set listed in the r4-era comment history, then (c)
# r3/r4-green blocks in definition order.
# ---------------------------------------------------------------------------

_GATE_PRIORITY = [
    # --- Round-6 window -------------------------------------------------
    # Composition (VERDICT r5 task #1): first the 26 queries that have
    # NEVER held a driver correctness row in any CORRECTNESS_r01..r05
    # window (the r5 TPC-H deck, tokenizer-training families, perceptual
    # hashes, Y4M, NFC, skew joins), then the round-6 new-query block,
    # then the oldest stale rotation (newest driver row = r2, registry
    # order, excluding rows-only-by-design `cardinality_sketches`).
    # The 18 r2-stale entries that do not fit this window, then the
    # 48-entry r3 block, lead the r7 rotation.
    # --- Never-driver-gated (26) ---------------------------------------
    "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q13_order_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_variety",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q20_promo_suppliers",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_dormant_customers",
    "events_salted_type_join",
    "events_skew_split_join",
    "wordpiece_learned_merges",
    "wordpiece_encoded_token_counts",
    "unigram_lm_vocab",
    "unigram_encoded_token_counts",
    "doc_kneser_ney_perplexity",
    "image_dhash_codes",
    "image_phash_neardup_pairs",
    "video_y4m_bt601_decode",
    "doc_nfc_normalize",
    # --- Round-6 new-query block (inserted as implemented) --------------
    # url_dedup: NEW — canonicalize → exact URL dedup + registered
    # domain (closes the r5 url_canonicalize loop, VERDICT task #3).
    "url_dedup",
    # url_host_neardup_pairs: NEW — per-host blocked 3-gram Jaccard
    # near-dup (df-cap per host; blocked shingle join replayed in SQL).
    "url_host_neardup_pairs",
    # bytebpe_learned_merges / bytebpe_encoded_token_counts: NEW — the
    # GPT-2/tiktoken byte-level BPE family (hex-pair byte alphabet,
    # space-marker pre-tokens), recursive-CTE training-replay oracles
    # (VERDICT r5 task #4).
    "bytebpe_learned_merges",
    "bytebpe_encoded_token_counts",
    # host_graph_pagerank: NEW — integer-arithmetic damped power
    # iteration, bit-for-bit recursive-CTE replay.
    "host_graph_pagerank",
    # robots_gate: NEW — RFC 9309 robots.txt evaluation (pure-Column
    # parse + LIKE-translated match); DuckDB replays the whole parser.
    "robots_gate",
    # mime_sniff_route: NEW — WHATWG MIME sniffing as one pure-Column
    # CASE over the hex projection; java.util.regex vs RE2 cross-check.
    "mime_sniff_route",
    # warc_record_parse: NEW — ISO 28500 Content-Length record walk
    # (embedded WARC/1.0 trap); closed-form header/md5/status oracle.
    "warc_record_parse",
    # cdx_surt_keys: NEW — web-archive SURT/CDX key transform; DuckDB
    # replays host/path/query regexes + label reversal with list ops.
    "cdx_surt_keys",
    # host_graph_harmonic: NEW — truncated integer harmonic centrality;
    # recursive-CTE BFS oracle replays every floored 1/d term.
    "host_graph_harmonic",
    # crawl_pipeline_v1: NEW — the composed crawl-admission flagship
    # (WARC → status → MIME → robots → canonicalize → SURT), one
    # closed-form admission-algebra oracle.
    "crawl_pipeline_v1",
    # html_link_graph: NEW — href harvest + RFC 3986 §5.2 reference
    # resolution (every branch); §5.4 spec tables pin the resolver.
    "html_link_graph",
    # sitemap_parse / crawl_frontier_schedule: NEW — sitemaps.org
    # discovery input (RE2/java.util.regex dual) + the politeness
    # window schedule.
    "sitemap_parse",
    "crawl_frontier_schedule",
    # events_zorder_skipping: NEW — Morton-curve layout; the oracle
    # replays the bit interleave, the unit test proves the pruning.
    "events_zorder_skipping",
    # doc_main_content: NEW — jusText/Kohlschütter link-density
    # boilerplate removal; DuckDB lambdas replay the block algebra.
    "doc_main_content",
    # wet_generate_roundtrip: NEW — WET writer + reader roundtrip with
    # the embedded WARC/1.0 trap; html_extract chain replayed in RE2.
    "wet_generate_roundtrip",
    # remote_write_decode: NEW — Prometheus remote-write push path:
    # from-scratch snappy block + proto wire decode, bit-exact doubles.
    "remote_write_decode",
    # relabel_pipeline: NEW — Prometheus relabel_configs (5 actions);
    # hashmod's Go algebra reproduced bit-for-bit in both engines.
    "relabel_pipeline",
    # sessions_incident_overlap / events_scd2_intervals: NEW — binned
    # interval-overlap join (max-starts chunk dedup) + SCD2 runs.
    "sessions_incident_overlap",
    "events_scd2_intervals",
    # metrics_pipeline_v2: NEW — the composed PUSH flagship
    # (remote-write wire decode → relabel → sharded rollup).
    "metrics_pipeline_v2",
    # wat_link_metadata / robots_sitemap_directives: NEW — the WAT
    # member of the CC triple (resolved-outlink JSON records) and the
    # robots→sitemap discovery hand-off.
    "wat_link_metadata",
    "robots_sitemap_directives",
    # scrape_target_rendezvous: NEW — HRW consistent sharding; DuckDB
    # list_max replays the weight argmax exactly.
    "scrape_target_rendezvous",
    # crawl_paced_schedule: NEW — Crawl-delay-paced frontier (delay
    # group selection + slot×delay fetch times).
    "crawl_paced_schedule",
    # image_netpbm_decode: NEW — all six Netpbm magics incl. 16-bit
    # raw; exact integer channel sums replay the roundtrip.
    "image_netpbm_decode",
    # doc_pack_firstfit: NEW — greedy first-fit whole-document packing
    # (complements concat-and-chunk doc_sequence_packing);
    # recursive-CTE row-by-row replay.
    "doc_pack_firstfit",
    # payload_lz4_roundtrip: NEW — LZ4 block codec, decode-derived
    # features hash-check the roundtrip.
    "payload_lz4_roundtrip",
    # image_tiff_decode: NEW — baseline TIFF IFD walk, both endians,
    # multi-page + strips; exact channel-sum replay.
    "image_tiff_decode",
    # --- Stale rotation: newest driver row = r2, registry order ---------
    "multimodal_wav_samples",
    "embedding_kmeans_assign",
    "semantic_neardup_pairs",
    "promql_count_values",
    "promql_over_time_stats",
    "promql_rate_range",
    "promql_mad_over_time",
    "promql_label_replace",
    "promql_label_join",
    "promql_offset",
    "promql_delta",
    "promql_deriv",
    "promql_predict_linear",
    "promql_histogram_quantile",
    "promql_clamp",
    "doc_hash_split_counts",
    "doc_stratified_sample",
    "corpus_mix_by_lang",
    "doc_deterministic_topn",
    # (window cutoff at 50: with the 31-query r6 new block (25 fit the window) the window
    # is 26 never-gated + 24 new; the last six new entries (scrape_target_rendezvous, crawl_paced_schedule, image_netpbm_decode, doc_pack_firstfit, payload_lz4_roundtrip, image_tiff_decode — each individually sf0.001+sf0.01 green) plus all r2-stale entries sit just past the cutoff; the 19 r2-stale entries
    # past the cutoff — multimodal_wav_samples … doc_deterministic_topn
    # above — plus doc_cap_per_source, doc_weighted_sample,
    # neardup_clusters, neardup_keep_canonical, text_bpe_token_counts
    # lead the r7 stale rotation. Policy as in r5/r6: never-driver-
    # gated queries outrank once-green stale ones.)
]

# The retired round-5 window, kept for the rotation history the r7
# window will need (these 50 all hold green r5 driver rows):
_R5_WINDOW_HISTORY = [
    # --- Round-5 new/changed block ------------------------------------
    # doc_gopher_split: NEW — the gopher_pass both-ways split under the
    # driver oracle (VERDICT r4 task #3).
    "doc_gopher_split",
    # bpe_pair_counts: plan rewritten this round (TakeOrderedAndProject
    # partial top-k + sort_array/posexplode rank instead of a full-table
    # single-partition window, VERDICT task #2) — value-identical by
    # construction, re-gated anyway.
    "bpe_pair_counts",
    # audio_mpeg_decode: NEW — MPEG-1 Layer I bitstream decode with a
    # closed-form requantization oracle (VERDICT task #5).
    "audio_mpeg_decode",
    # doc_suffix_array_repeats: NEW — distributed suffix array + LCP
    # (prefix doubling / binary lifting) vs a direct suffix-sort oracle.
    "doc_suffix_array_repeats",
    # doc_substring_dedup_rewrite: NEW — Lee-et-al repeat REMOVAL on
    # the SA; oracle replays the marking rule and hashes rewritten text.
    "doc_substring_dedup_rewrite",
    # audio_flac_decode: NEW — from-scratch lossless FLAC codec; the
    # closed-form oracle pins the predictor+Rice path bit-for-bit.
    "audio_flac_decode",
    # neardup_edit_verified: NEW — banding candidates + integer-exact
    # Levenshtein verification (order-sensitive near-dup).
    "neardup_edit_verified",
    # audio_au_aiff_decode: NEW — AU + AIFF containers (80-bit extended
    # float sample rate), decode-derived exact-integer oracle.
    "audio_au_aiff_decode",
    # curation_pipeline_v2: NEW — the composed r5 flagship (substring
    # dedup rewrite -> gopher audit -> DSIR), one chained oracle.
    "curation_pipeline_v2",
    # audio_spectrogram_{power,frames}: NEW — Q15 fixed-point short-time
    # DFT over a real WAV roundtrip, exact-int64 oracle (twiddle table
    # inlined as SQL literals on both sides).
    "audio_spectrogram_power",
    "audio_spectrogram_frames",
    # audio_vad_segments: NEW — energy-threshold voice-activity islands
    # composed on the Q15 spectrogram (exact-int threshold, no float
    # boundary), gaps-and-islands oracle.
    "audio_vad_segments",
    # metrics_lttb_downsample: NEW — LTTB dashboard downsampler,
    # recursive-CTE oracle replaying the sequential argmax chain.
    "metrics_lttb_downsample",
    # doc_html_extract: NEW — HTML→text cleaning as a pure
    # regexp_replace chain; the hash cross-checks java.util.regex vs
    # RE2 on the full cleaned text.
    "doc_html_extract",
    # tsdb_gorilla_compress: NEW — Gorilla dod+XOR bitstream codec with
    # asserted bit-exact roundtrip; recursive-CTE control-window oracle.
    "tsdb_gorilla_compress",
    # promql_time_components: NEW — PromQL calendar family + sgn,
    # TZ-free civil-from-days vs DuckDB's calendar library.
    "promql_time_components",
    # hybrid_rrf_search: NEW — BM25 + dense-cosine Reciprocal-Rank
    # Fusion; integer-rank arithmetic, bounded top-k windows.
    "hybrid_rrf_search",
    # url_canonicalize: NEW — RFC 3986 normalization, 7 strata with a
    # closed-form expected-value oracle; changed splits both ways.
    "url_canonicalize",
    # audio_fingerprint_neardup: NEW — chromaprint-style dominant-bin
    # fingerprints equi-joined into acoustic dup pairs.
    "audio_fingerprint_neardup",
    # doc_mojibake_repair: NEW — ftfy-style double-encoding repair with
    # real encoding-algebra fixtures; suspected/repaired split both ways.
    "doc_mojibake_repair",
    # linkage_jaro_winkler_blocks: NEW — blocked record linkage, from-
    # spec JW vs DuckDB's native implementation, quantized-int mass.
    "linkage_jaro_winkler_blocks",
    # image_rotate_flip: NEW — rot90/flip on real decoded BMP arrays,
    # position-weighted sums pin the coordinate algebra.
    "image_rotate_flip",
    # audio_resample_q15: NEW — Q15 fixed-point linear-interp rate
    # conversion (320/441 ratio), exact-int oracle.
    "audio_resample_q15",
    # doc_fold_accents: NEW — NFD accent folding, stdlib unicodedata vs
    # DuckDB utf8proc strip_accents (two UCD implementations).
    "doc_fold_accents",
    # doc_char_entropy: NEW — order-0 Shannon entropy via an in-row
    # sorted-run fold (zero shuffle); quantized-term integer sums.
    "doc_char_entropy",
    # speech_pipeline_v1: NEW — the composed audio flagship (spectrogram
    # -> VAD islands -> per-segment peak descriptors, one chained oracle).
    "speech_pipeline_v1",
    # --- Stale rotation (VERDICT r4 task #4) ---------------------------
    # Every registry query's newest driver row, unioned over
    # CORRECTNESS_r01..r04.json. 65 queries had no row since r2 after the
    # r4 gate; this window leads with the OLDEST (newest row = r1, all 18
    # that carry oracles — minhash_lsh_pairs and embedding_neardup_lsh
    # are rows-only by design and must stay past slot 50), then fills the
    # remainder with the r2-stale set in registry order. The 20 r2-stale
    # queries that do not fit this window lead the r6 rotation.
    # newest driver row = r1 (18):
    "promql_quantile_by",
    "promql_avg_over_time",
    "promql_sliding_sum",
    "promql_vector_ratio",
    "label_extract",
    "label_filter_slice",
    "substring_prefix",
    "time_window_scan",
    "per_key_stats",
    "top_customers",
    "order_priority_count",
    "regional_revenue",
    "text_token_stats",
    "text_quality",
    "text_language_id",
    "doc_fingerprint",
    "multimodal_decode",
    "media_frame_counts",
    # newest driver row = r2 (fills the window; cardinality_sketches is
    # rows-only by design and excluded):
    "text_repetition_signals",
    "pii_redaction",
    "decontam_ngram_overlap",
    "decontam_clean_corpus",
    "multimodal_bmp_pixels",
    "multimodal_resize_roundtrip",
    "multimodal_wav_samples",
    "embedding_kmeans_assign",
    "semantic_neardup_pairs",
    "promql_count_values",
    "promql_over_time_stats",
    "promql_rate_range",
    "promql_mad_over_time",
    "promql_label_replace",
    "promql_label_join",
    "promql_offset",
    "promql_delta",
    "promql_deriv",
    "promql_predict_linear",
    "promql_histogram_quantile",
    "promql_clamp",
    "doc_hash_split_counts",
    "doc_stratified_sample",
    "corpus_mix_by_lang",
    "doc_deterministic_topn",
    "doc_cap_per_source",
    "doc_weighted_sample",
    "neardup_clusters",
    "neardup_keep_canonical",
    "text_bpe_token_counts",
    "tfidf_top_terms",
    "bm25_query_scores",
    "interval_click_attribution",
    "promql_parsed_flagship",
    "promql_parsed_selector_agg",
    "config_executed_range",
    "promql_changes_resets",
    "promql_raw_over_time",
    "promql_irate_idelta",
    "promql_smoothing",
    "tpch_q3_shipping_priority",
    "doc_classifier_scores",
    "doc_chunking",
    "tpch_q5_local_revenue",
    # (window cutoff is at 50 — entries past it keep the rotation order
    # documented for r6: the r3-green block, then r4-green, definition
    # order after this list.)
]


def _apply_gate_priority() -> None:
    missing = [n for n in _GATE_PRIORITY if n not in QUERIES]
    if missing:  # a rename above must be reflected here, loudly
        raise KeyError(f"_GATE_PRIORITY names not registered: {missing}")
    ordered = _GATE_PRIORITY + [n for n in QUERIES if n not in set(_GATE_PRIORITY)]
    # The driver gate samples the FIRST 50 entries; a no-oracle query in
    # that window records an `err: no_oracle` row (the one r3 blemish).
    # Keep rows-only-by-design entries (their oracle-checked twins ARE in
    # the window) strictly past slot 50, and fail loudly if reordering or
    # new registrations ever let one drift in.
    bad = [n for n in ordered[:50] if n not in ORACLES]
    if bad:
        raise AssertionError(f"no-oracle queries inside the gate window: {bad}")
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in ordered})


_apply_gate_priority()
