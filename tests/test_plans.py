"""Physical-plan quality gates (SURVEY.md §4.2; the brief's scale
checklist). These assert — not eyeball — that Catalyst produced the plan
we want: filters pushed into the parquet scan, columns pruned, small dims
broadcast, aggregations hash-based (no map-typed ``first()`` buffers
forcing SortAggregate), and no accidental cartesian products."""

from __future__ import annotations

import re

import pytest

from prom_etl_db_spark.plans.explain import explain_str, pushed_filters, scan_columns
from prom_etl_db_spark.queries import QUERIES


def _ops(df) -> set[str]:
    s = explain_str(df, "simple")
    return set(
        re.findall(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct"
            r"|BroadcastNestedLoopJoin|HashAggregate|SortAggregate"
            r"|ObjectHashAggregate)\b",
            s,
        )
    )


def test_flagship_pushdown_and_hash_agg(spark, sf_dir):
    df = QUERIES["flagship_gpu_utilization"](spark, sf_dir)
    # metric-name equality reaches the scan
    assert any("event_type" in f and "purchase" in f for f in pushed_filters(df))
    # every aggregation is hash-based — the entries-array series key keeps
    # map regrouping out of SortAggregate territory
    ops = _ops(df)
    assert "HashAggregate" in ops
    assert "SortAggregate" not in ops
    assert "CartesianProduct" not in ops


def test_flagship_column_pruning(spark, sf_dir):
    df = QUERIES["flagship_gpu_utilization"](spark, sf_dir)
    (cols,) = scan_columns(df)
    # event_id is never referenced — a scan reading it isn't pruned
    assert "event_id" not in cols
    assert set(cols) <= {"ts", "user_id", "event_type", "value", "props"}


def test_dim_joins_broadcast(spark, sf_dir):
    # region/nation/customer dims must broadcast — a shuffle join of a
    # 5-row dim against lineitem is the classic 100 TB mistake
    for name in ("regional_revenue", "top_customers"):
        ops = _ops(QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in ops, name
        assert "SortMergeJoin" not in ops, name
        assert "CartesianProduct" not in ops, name


def test_selector_filter_pushdown(spark, sf_dir):
    df = QUERIES["time_window_scan"](spark, sf_dir)
    # at least one scan filter pushed (timestamp bound or type equality)
    assert any(f.strip() for f in pushed_filters(df))


def test_dedup_no_cartesian(spark, sf_dir):
    # candidate generation must never degrade to an all-pairs product
    for name in ("ngram_jaccard_pairs", "minhash_lsh_pairs", "embedding_neardup_lsh"):
        ops = _ops(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in ops, name
        assert "BroadcastNestedLoopJoin" not in ops, name


def test_promql_regrouping_stays_hash(spark, sf_dir):
    for name in ("promql_sum_by", "promql_max_without", "promql_sum_over_time"):
        ops = _ops(QUERIES[name](spark, sf_dir))
        assert "SortAggregate" not in ops, name
        assert "HashAggregate" in ops, name


def test_gauge_regression_single_hash_agg_no_window(spark, sf_dir):
    # delta/deriv/predict_linear are one-pass moment aggregations — a
    # window (per-series sort) or SortAggregate here would be a regression
    for name in ("promql_delta", "promql_deriv", "promql_predict_linear"):
        df = QUERIES[name](spark, sf_dir)
        ops = _ops(df)
        assert "HashAggregate" in ops, name
        assert "SortAggregate" not in ops, name
        assert "Window" not in explain_str(df, "simple"), name
        # the frame predicate reaches the scan
        assert any("ts" in f for f in pushed_filters(df)), name


def test_histogram_quantile_exchange_budget(spark, sf_dir):
    # one shuffle for the bucket agg + one for the (shared) windows
    df = QUERIES["promql_histogram_quantile"](spark, sf_dir)
    s = explain_str(df, "formatted")
    assert s.count("Exchange") <= 4  # 2 logical, each listed ≤2× in formatted refs
    assert "SortAggregate" not in s


def test_sampling_is_pure_projection(spark, sf_dir):
    # split/sample assignment must not shuffle before the counting agg —
    # and the stratified filter's md5 comparison stays out of the scan
    # pushdown (not a scan-able predicate) but the plan has no join/sort
    for name in ("doc_hash_split_counts", "doc_stratified_sample"):
        s = explain_str(QUERIES[name](spark, sf_dir), "simple")
        assert "Join" not in s, name
        assert "SortAggregate" not in s, name
    # deterministic_topn compiles to TakeOrderedAndProject, not a global Sort
    s = explain_str(QUERIES["doc_deterministic_topn"](spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in s


def test_sequence_packing_single_bucket_window(spark, sf_dir):
    # one hash-partition exchange on the bucket + one Window — a global
    # Sort (single-stream packing) would serialize the whole corpus
    s = explain_str(QUERIES["doc_sequence_packing"](spark, sf_dir), "simple")
    assert s.count("Window") == 1
    assert "hashpartitioning" in s
    assert "rangepartitioning" not in s


def test_time_joins_never_nested_loop(spark, sf_dir):
    # the whole point of both operators: inequality semantics WITHOUT the
    # BroadcastNestedLoopJoin Catalyst gives a naive range predicate
    for name in ("asof_click_before_purchase", "interval_click_attribution"):
        ops = _ops(QUERIES[name](spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in ops, name
        assert "CartesianProduct" not in ops, name


def test_tpch_q3_broadcast_and_pushdown(spark, sf_dir):
    df = QUERIES["tpch_q3_shipping_priority"](spark, sf_dir)
    ops = _ops(df)
    assert "BroadcastHashJoin" in ops  # customer dim broadcasts
    assert "CartesianProduct" not in ops
    # both date predicates reach the scans
    assert any("orderdate" in f.lower() for f in pushed_filters(df))
    assert any("shipdate" in f.lower() for f in pushed_filters(df))


def test_curation_pipeline_composition_plan(spark, sf_dir):
    """The composed pipeline must not degrade stage shapes: no cartesian,
    no nested loop, and the only sort-based aggregation is the dedup
    min_by (string-valued min_by has an immutable buffer — Spark can't
    hash-aggregate it; one partial + one final SortAggregate pair is the
    expected plan for that single stage, everything else stays hash)."""
    df = QUERIES["curation_pipeline"](spark, sf_dir)
    ops = _ops(df)
    assert "CartesianProduct" not in ops
    assert "BroadcastNestedLoopJoin" not in ops
    assert "HashAggregate" in ops
    s = explain_str(df, "simple")
    # the dedup subtree appears TWICE (the decontam anti-join derives both
    # its probe and build sides from it, with different column pruning, so
    # the exchanges can't be reused) -> 2 logical stages x partial+final.
    # A cluster deployment persists the dedup output; the registry query
    # keeps the pure-DAG form the oracle can mirror.
    assert s.count("SortAggregate") <= 4, s
    # the decontam eval side must be the broadcast build side
    assert "BroadcastHashJoin" in ops


def test_tfidf_and_bm25_plan_shapes(spark, sf_dir):
    # The ONLY nested-loop join allowed is the deliberate crossJoin of
    # the broadcast 1-ROW stats aggregate (the scalar-subquery plan);
    # a second one would mean a real join degraded.
    tf = QUERIES["tfidf_top_terms"](spark, sf_dir)
    s = explain_str(tf, "simple")
    assert "CartesianProduct" not in s
    assert s.count("BroadcastNestedLoopJoin") <= 1
    # bm25: the fixed-query df side is broadcast; the term filter reaches
    # the exploded stream BEFORE the first aggregation
    bm = QUERIES["bm25_query_scores"](spark, sf_dir)
    ops = _ops(bm)
    assert "BroadcastHashJoin" in ops
    assert "CartesianProduct" not in ops
    assert explain_str(bm, "simple").count("BroadcastNestedLoopJoin") <= 1


def test_weighted_sample_takeordered_no_global_sort(spark, sf_dir):
    from prom_etl_db_spark.plans.explain import explain_str

    df = QUERIES["doc_weighted_sample"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in s
    # a global Sort node outside TakeOrdered would mean the limit didn't
    # fuse with the ordering
    assert "Exchange rangepartitioning" not in s


def test_kmeans_assign_is_narrow_after_init(spark, sf_dir):
    """The assignment pass must be a pure projection over the vectors —
    one ArrowEvalPython/mapInPandas stage, no join, no shuffle of the
    corpus (the centroid matrix rides the closure, not an Exchange)."""
    from prom_etl_db_spark.functions import clustering
    from prom_etl_db_spark.plans.explain import explain_str
    from prom_etl_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    C = clustering.kmeans_init(emb, 8)
    assigned = clustering.assign_clusters(emb, C)
    s = explain_str(assigned, "simple")
    for bad in ("Join", "Exchange hashpartitioning", "CartesianProduct"):
        assert bad not in s, s


def test_tpch_q5_broadcast_dims_single_fact_shuffle(spark, sf_dir):
    df = QUERIES["tpch_q5_local_revenue"](spark, sf_dir)
    s = explain_str(df, "simple")
    # all four dims broadcast; the only shuffle join is orders-lineitem
    assert s.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
    # the one-year slice reaches the orders scan
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_rate_range_no_cartesian_pushdown(spark, sf_dir):
    df = QUERIES["promql_rate_range"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
    # the lookback clip reaches the scan
    assert any("ts" in f for f in pushed_filters(df))


def test_rate_range_wide_uses_event_path_not_grid_explode(spark, sf_dir):
    """At frame/step = 288 the plan must be the difference-array shape:
    TWO ordered Window phases (global pair lag; per-series running sum)
    and the Generate (explode) sitting ABOVE both — filling output
    segments — never below a per-(series, step) window, which would mean
    the 288x per-sample grid explode feeds the shuffle."""
    df = QUERIES["promql_rate_range_wide"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert s.count("Window") >= 2  # pair-lag window + running-sum window
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
    assert any("ts" in f for f in pushed_filters(df))
    # the explode path's signature operator order: Generate BELOW the first
    # Window (explode -> window). In the events plan every Generate comes
    # after (above) a Window in the tree, i.e. the text dump shows a Window
    # deeper than every Generate.
    lines = s.splitlines()
    gen_depths = [i for i, ln in enumerate(lines) if "Generate" in ln]
    win_depths = [i for i, ln in enumerate(lines) if "Window" in ln]
    # simple-mode dump is top-down: a child prints after its parent, so
    # "window feeds generate" = some Window line BELOW every Generate line
    assert gen_depths and win_depths
    assert max(win_depths) > min(gen_depths)


def test_sketch_family_plans(spark, sf_dir):
    """Sketch queries must stay pure hash-aggregation pipelines: no
    sorts, no cartesian products; the Bloom position-set join must
    broadcast (the filter is sized to broadcast BY construction — if it
    ever sort-merge-joins, someone broke the n_bits bound)."""
    for name in ("hll_cardinality", "quantile_histogram_sketch"):
        ops = _ops(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in ops, name
        assert "BroadcastNestedLoopJoin" not in ops, name
        assert "HashAggregate" in ops, name
    bloom = _ops(QUERIES["bloom_purchaser_membership"](spark, sf_dir))
    assert "BroadcastHashJoin" in bloom
    assert "CartesianProduct" not in bloom
    cm = _ops(QUERIES["countmin_user_counts"](spark, sf_dir))
    assert "CartesianProduct" not in cm
    assert "HashAggregate" in cm


def test_signlsh_codes_no_shuffle(spark, sf_dir):
    """Sign-LSH codes are one narrow projection — ANY exchange in the
    plan means the fold leaked into a shuffle."""
    df = QUERIES["embedding_signlsh_codes"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert "Exchange" not in s
    assert "Join" not in s


def test_tpch_q18_semi_join_and_broadcast_customer(spark, sf_dir):
    df = QUERIES["tpch_q18_large_orders"](spark, sf_dir)
    s = explain_str(df, "simple")
    # the big-order filter is a semi join (orderkeys only in the shuffle)
    assert "LeftSemi" in s
    # the customer dim never shuffles the fact stream
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


def test_cohort_retention_two_hash_aggs_no_window(spark, sf_dir):
    df = QUERIES["events_cohort_retention"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert "HashAggregate" in s and "SortAggregate" not in s
    # no window: min-per-user and distinct-user-days are both
    # partial-aggregable; a window here would force a per-user sort
    assert "Window" not in s
    assert "CartesianProduct" not in s


def test_pq_adc_scan_is_pure_column_fold(spark, sf_dir):
    """ADC scoring must stay JVM-side: exactly ONE Arrow python stage (the
    code encoder) and NO join — the query tables enter as an exploded
    literal, not a join side; the only shuffle is the per-query rank
    window."""
    df = QUERIES["similarity_topk_pq"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert s.count("ArrowEvalPython") == 1
    for op in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
               "BroadcastNestedLoopJoin"):
        assert op not in s
    assert "Window" in s


def test_cube_rollup_single_expand_aggregate(spark, sf_dir):
    """All four granularities must ride ONE Expand + HashAggregate
    pipeline (a single shuffle) — not a union of four scans."""
    df = QUERIES["events_rollup_cube"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert "Expand" in s and "HashAggregate" in s
    assert "Union" not in s
    assert s.count("Exchange") <= 2  # partial->final agg exchange (+AQE read)


def test_cdc_latest_partial_agg_no_window(spark, sf_dir):
    """CDC compaction must be one max_by aggregation WITH map-side
    partial combine (shuffle carries one candidate per partition-key),
    never a row_number window (shuffles every change) or a self-join."""
    df = QUERIES["events_cdc_latest"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert "partial_max_by" in s  # map-side combine before the exchange
    assert "Window" not in s
    assert "Join" not in s


def test_ivfpq_broadcast_probe_no_shuffle_join(spark, sf_dir):
    """The probed-list candidate join must be a BROADCAST of the tiny
    (query, centroid, table) frame onto the codes scan — a shuffle join
    there would move the whole corpus for 40 probe rows."""
    df = QUERIES["similarity_topk_ivfpq"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert "BroadcastHashJoin" in s
    for op in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
               "BroadcastNestedLoopJoin"):
        assert op not in s
    assert "Window" in s


def test_tpch_q4_semi_join_and_q14_broadcast(spark, sf_dir):
    # Q4: the EXISTS must plan as a LEFT SEMI equi-join (orderkey as the
    # key, the date inequality as join-side filter) — never a cartesian,
    # never an inner join that fans orders out per lineitem
    ops = _ops(QUERIES["tpch_q4_late_orders"](spark, sf_dir))
    assert "CartesianProduct" not in ops
    plan = QUERIES["tpch_q4_late_orders"](spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "LeftSemi" in plan
    # Q14: part is a dim — broadcast, not shuffled
    ops14 = _ops(QUERIES["tpch_q14_promo_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in ops14 and "SortMergeJoin" not in ops14


def test_scan_columns_handles_decimal_and_truncation_markers():
    from prom_etl_db_spark.plans.explain import _split_top_level

    # decimal(10,2) must not split into a phantom '2)' column
    assert _split_top_level("price:decimal(10,2),qty:bigint") == [
        "price:decimal(10,2)",
        "qty:bigint",
    ]
    # nested struct/array commas are not field boundaries
    assert _split_top_level("a:struct<x:int,y:int>,b:array<int>") == [
        "a:struct<x:int,y:int>",
        "b:array<int>",
    ]


def test_load_table_restores_nanos_conf(spark, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from prom_etl_db_spark.sources.tables import load_table

    t = pa.table({
        "ts": pa.array(
            [dt.datetime(2024, 1, 1, 0, 0, i) for i in range(5)],
            type=pa.timestamp("ns"),
        ),
        "v": pa.array([float(i) for i in range(5)]),
    })
    pq.write_table(t, str(tmp_path / "evt.parquet"))
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    df = load_table(spark, str(tmp_path), "evt")
    # the conversion is pinned into the analyzed plan...
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    assert df.count() == 5
    # ...and the session-wide flag is back to its prior state, so a later
    # unrelated nanos read doesn't silently yield raw longs
    assert spark.conf.get(key, None) == before


def test_bpe_pair_counts_partial_topk_no_full_table_window(spark, sf_dir):
    """r5 VERDICT task #2: the top-20 must be a per-partition partial
    top-k (TakeOrderedAndProject) over the corpus-scale pair table —
    never a WindowExec over the whole table on one partition (a
    multilingual 100 TB corpus has a ~10^7-row pair table). The rank is
    sort_array+posexplode over the 20 survivors, so NO Window node (and
    no 'No Partition Defined' WARN) exists anywhere in the plan."""
    df = QUERIES["bpe_pair_counts"](spark, sf_dir)
    s = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in s
    assert "Window" not in s
