"""Physical-plan regression tests: the scale properties that make these
queries viable on a large cluster must not silently regress.

Each assertion pins a property argued in COVERAGE.md / SURVEY.md §4:
- small dimensions broadcast (no sort-merge shuffle of the fact table
  against a 5-row region table);
- filters and column pruning reach the parquet scan;
- top-k compiles to TakeOrderedAndProject (no global sort);
- the core (non-multimodal, non-stateful) query surface stays free of
  row-at-a-time Python evaluation.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

EXPECTED_QUERY_COUNT = 264


def _plan(spark, sf_dir, name: str) -> str:
    df = entry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_joins_broadcast_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_local_supplier_revenue")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_no_broadcast_hint_on_scaling_tables(spark, sf_dir):
    """Only SF-invariant dims (region, nation) may carry an explicit
    broadcast hint. customer/supplier grow with scale factor — a hint
    there becomes a multi-GB driver broadcast at 100x; the size-based
    planner/AQE must decide for them (VERDICT round-1 item 3)."""
    for name in ("tpch_shipping_priority", "tpch_local_supplier_revenue"):
        df = entry.queries()[name](spark, sf_dir)
        lines = df._jdf.queryExecution().analyzed().toString().splitlines()
        for i, ln in enumerate(lines):
            if "ResolvedHint" in ln:
                subtree = "\n".join(lines[i : i + 4])
                assert "customer" not in subtree, (name, subtree)
                assert "supplier" not in subtree, (name, subtree)


def test_simhash_signature_plan_is_shuffle_free(spark, sf_dir):
    """The map-only simhash formulation (per-row array aggregation,
    operators/textops._simhash_fp_expr) must plan with ZERO exchanges:
    a doc's fingerprint depends only on its own tokens, so any shuffle
    here is a regression back to the explode+groupBy shape — at 100 TB
    that shuffle (the exploded token stream) would be the largest in
    the dedup pipeline."""
    plan = _plan(spark, sf_dir, "dedup_simhash")
    assert "Exchange" not in plan, plan


def test_shipping_priority_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_shipping_priority")
    assert "TakeOrderedAndProject" in plan, plan


def test_top_risk_alerts_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top_risk_alerts")
    assert "TakeOrderedAndProject" in plan, plan


def test_hourly_stats_scan_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "hourly_stats")
    # the events table has 6 columns; the rollup needs at most 4 —
    # a scan reading props (the wide JSON column) means pruning broke
    assert "props" not in plan, plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_semi_building_orders")
    assert "PushedFilters: [" in plan, plan
    # the BUILDING segment predicate must reach the customer scan
    assert "BUILDING" in plan, plan


@pytest.mark.parametrize(
    "name",
    [
        "hourly_stats",
        "user_daily_metrics",
        "risk_scores",
        "daily_summary",
        "tpch_pricing_summary",
        "dedup_exact",
        "dedup_minhash_signatures",
        "similarity_cosine_topk",
        "text_token_stats",
        "quality_flags",
    ],
)
def test_core_queries_are_python_free(spark, sf_dir, name):
    """Core surface is UDF-free (SURVEY §2.12): no BatchEvalPython /
    ArrowEvalPython nodes — everything stays JVM-side for codegen."""
    plan = _plan(spark, sf_dir, name)
    assert "EvalPython" not in plan, plan


def test_exact_similarity_broadcasts_query_side(spark, sf_dir):
    """Brute-force top-k is a broadcast nested-loop of the tiny query
    set against the corpus — the corpus must never be the build side."""
    # the registered query serves the session-shared exact-top-k memo
    # (a checkpoint fence that hides the subplan) — pin the underlying
    # builder, the same internals-not-memo precedent as the kNN test
    from wikistream_event_data_pipeline_aws_spark.operators.similarity import (
        brute_force_topk,
    )
    from wikistream_event_data_pipeline_aws_spark.plans.similarity import (
        N_QUERIES,
        TOP_K,
    )
    from wikistream_event_data_pipeline_aws_spark.catalog import load_table

    import pyspark.sql.functions as F

    e = load_table(spark, sf_dir, "embeddings")
    df = brute_force_topk(e.filter(F.col("vec_id") < N_QUERIES), e, k=TOP_K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_partitioned_scan_prunes_date_directories(spark, sf_dir):
    """S6: the two-date predicate must prune the hive-partitioned events
    table to 2 of its ~30 date directories at planning time."""
    df = entry.queries()["partitioned_scan_pruning"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [event_date" in plan, plan
    # the date predicate is resolved entirely against partition
    # directories — nothing left to filter row-by-row
    assert "DataFilters: []" in plan, plan


def test_asof_join_is_window_not_range_join(spark, sf_dir):
    """The as-of operator must compile to union + window (one key
    shuffle), never an inequality join that degenerates to a per-key
    cross product (operators/asof.py)."""
    plan = _plan(spark, sf_dir, "asof_latest_click")
    assert "Window" in plan, plan
    assert "Join" not in plan, plan


def test_minhash_pipeline_has_no_cartesian_product(spark, sf_dir):
    """LSH exists to avoid all-pairs: candidate generation must be a
    bucket equi-join, never a cross join."""
    plan = _plan(spark, sf_dir, "dedup_minhash_pairs")
    assert "CartesianProduct" not in plan, plan


def test_no_unpartitioned_windows_in_plan_sources():
    """A partitionBy-less Window.orderBy is a single-partition total sort
    — banned in registered plans except over time-bounded aggregates
    (daily_lag_trend's per-day rollup: one row per calendar day)."""
    import pathlib
    import re

    import wikistream_event_data_pipeline_aws_spark.plans as plans_pkg

    allowed = {
        "windows.py": 2,  # daily_lag_trend's two windows over daily agg
        "sketches.py": 2,  # histogram cumsums (batch + streaming reader), each over <= HIST_BINS rows
        "stats.py": 3,  # KM life-table tail-sum; KS bucket-prefix; Mann-Whitney rank-prefix over the distinct-value grain (all calendar/domain-bounded)
        "llmprep.py": 1,  # vocab-coverage rank/cumsum over the DISTINCT-TOKEN grain (vocab-bounded, ~1e5-1e6 rows in production)
        "curate.py": 1,  # quality-gate bucket running sum over <= 1024 fixed histogram buckets (r12 in-plan threshold)
    }
    root = pathlib.Path(plans_pkg.__file__).parent
    for p in sorted(root.glob("*.py")):
        hits = len(re.findall(r"Window\.orderBy", p.read_text()))
        assert hits <= allowed.get(p.name, 0), (
            f"{p.name}: {hits} global-sort window(s); allowed "
            f"{allowed.get(p.name, 0)}"
        )


def test_cms_estimate_join_broadcasts_counter_grid(spark, sf_dir):
    """The count-min counter grid is d*w cells by construction — the
    estimate join must broadcast it, never shuffle the candidates."""
    plan = _plan(spark, sf_dir, "heavy_hitters_cms")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bloom_probe_broadcasts_bit_set(spark, sf_dir):
    """The bloom bit set is <= m rows however large the build side —
    the probe join must broadcast it."""
    plan = _plan(spark, sf_dir, "bloom_semi_join_stats")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tfidf_has_no_cartesian_and_caps_with_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_tfidf_topk")
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_zorder_is_single_hash_aggregate(spark, sf_dir):
    """The layout audit is a projection + one hash agg — no join, no
    sort, no window."""
    plan = _plan(spark, sf_dir, "zorder_cluster_stats")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_udtf_filter_sits_below_python_boundary(spark, sf_dir):
    """Catalyst does not push predicates through a LATERAL Python UDTF
    join, so the query must filter before the view: the scan node has
    to carry the pushed event_type predicate (plans/pyapi.py)."""
    plan = _plan(spark, sf_dir, "props_kv_udtf")
    assert "PythonUDTF" in plan, plan
    assert "EqualTo(event_type,purchase)" in plan, plan


def test_registry_size_and_driver_front_order():
    """Pins the registered query count (a broken plans-module import now
    propagates, but this catches accidental deregistration too) and the
    driver-front ordering: the driver verifies the FIRST 50 queries, so
    the round-1-unverified names must lead."""
    from wikistream_event_data_pipeline_aws_spark import registry

    q = registry.queries()
    o = registry.oracles()
    assert len(q) == EXPECTED_QUERY_COUNT
    assert set(o) <= set(q)
    front = registry._DRIVER_FRONT
    assert list(q)[: len(front)] == list(front)
    # The driver verifies only the FIRST 50 registered queries; a 51st
    # _DRIVER_FRONT entry is silently dropped (this cut partitioned_scan
    # _pruning from BOTH round-1 and round-2 rotations).
    assert len(front) <= 50
    assert len(front) == len(set(front))
    assert set(front) <= set(q)


def test_vocab_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "vocab_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_corpus_shuffle_has_no_global_sort(spark, sf_dir):
    """The deterministic shuffle must order within hash shards only —
    a SinglePartition exchange means the whole corpus funnels through
    one task."""
    plan = _plan(spark, sf_dir, "corpus_shuffle_hash")
    assert "Exchange SinglePartition" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Window" in plan, plan


def test_decontaminate_broadcasts_heldout_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "decontaminate_ngram_overlap")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_curate_corpus_stays_bucketed(spark, sf_dir):
    """The composition must inherit its parts' scale shapes: LSH bucket
    equi-joins and broadcast decontamination, never an all-pairs join."""
    plan = _plan(spark, sf_dir, "curate_corpus")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


@pytest.mark.parametrize(
    "name",
    [
        "pack_sequences",
        "sample_stratified_hash",
        "redact_pii",
        "text_repetition_filter",
        "vocab_topk",
        "corpus_shuffle_hash",
        "domain_mixture_sample",
    ],
)
def test_llmprep_queries_are_python_free(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "EvalPython" not in plan, plan


def test_pagerank_is_take_ordered_with_no_cartesian(spark, sf_dir):
    """The iterative kernel must stay keyed joins + hash aggs; the
    top-k emission must compile to TakeOrderedAndProject, not a global
    sort of the rank table."""
    plan = _plan(spark, sf_dir, "graph_pagerank")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_triangle_count_orients_edges_by_degree(spark, sf_dir):
    """The wedge join must run on the degree-oriented edge relation
    (src/dst after the (deg, id) rank flip), not raw pa/pb canonical
    edges — the orientation is what bounds wedge fan-out by sqrt(|E|)."""
    df = entry.queries()["graph_triangle_count"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "src" in analyzed and "ddeg" in analyzed, analyzed


def test_compaction_plan_window_is_partitioned(spark, sf_dir):
    """The prefix-sum window must be partitioned by event_date (each
    partition plans independently); a partitionBy-less window would be
    a single-task global sort at scale."""
    plan = _plan(spark, sf_dir, "compaction_plan")
    import re

    windows = re.findall(r"Window .*", plan)
    assert windows, plan
    for w in windows:
        assert "event_date" in w, w


def test_passage_dedup_window_partitioned_by_passage(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_passage_exact")
    import re

    windows = re.findall(r"Window .*", plan)
    assert windows, plan
    for w in windows:
        assert "passage" in w, w
    assert "CartesianProduct" not in plan, plan


def test_ann_sweep_has_no_cartesian_beyond_result_assembly(spark, sf_dir):
    """Candidate generation must stay bucket-equi-joined for every grid
    config; the only cross joins allowed are the 1-row stat-assembly
    joins (count x recall per config) and the broadcast query side of
    the exact ground truth."""
    plan = _plan(spark, sf_dir, "similarity_ann_sweep")
    assert "SortMergeJoin" not in plan, plan


def test_bucketed_join_has_no_shuffle_before_join(spark, sf_dir):
    """Both sides scan bucketed files pair-wise: the plan must show
    bucketed scans and no exchange below the join — only the
    post-aggregation exchange remains."""
    plan = _plan(spark, sf_dir, "bucketed_join_colocated")
    assert plan.count("Bucketed: true") == 2, plan
    join_pos = plan.find("SortMergeJoin")
    assert join_pos != -1, plan
    # every Exchange in the plan must sit ABOVE the join (aggregation),
    # never between the join and its scans
    after_join = plan[join_pos:]
    assert "Exchange" not in after_join, plan


def test_incremental_merge_is_two_level_agg_without_join(spark, sf_dir):
    """The IVM refresh must stay pure aggregation: partials + combine,
    no join anywhere (a join-based refresh would rescan the base)."""
    plan = _plan(spark, sf_dir, "incremental_agg_merge")
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final x2 levels


def test_skew_profile_is_aggregation_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "skew_profile")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_table_diff_is_single_join_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "table_diff_orders")
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan


def test_gapfill_spine_join_has_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "hourly_gapfill")
    assert "CartesianProduct" not in plan, plan


def test_transition_matrix_window_partitioned_by_user(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "event_transition_matrix")
    windows = re.findall(r"Window .*", plan)
    assert windows, plan
    for w in windows:
        assert "user_id" in w, w


def test_ann_sweep_has_no_cartesian_product(spark, sf_dir):
    """Every cross join in the sweep must be a BROADCAST nested loop
    (tiny centroid/ground-truth sides); an unhinted CartesianProduct
    would be the all-pairs scan the sweep exists to avoid."""
    plan = _plan(spark, sf_dir, "similarity_ann_sweep")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_evolution_audit_is_single_keyed_join(spark, sf_dir):
    """The reconciliation is one full-outer equi-join on event_id plus
    one hash agg — no cross join, no window, no second shuffle chain."""
    plan = _plan(spark, sf_dir, "partition_evolution_audit")
    assert "CartesianProduct" not in plan, plan
    assert "FullOuter" in plan, plan
    assert "HashAggregate" in plan, plan


def test_tpch_deep_small_qty_brand_filter_pushed(spark, sf_dir):
    """Q17: the brand predicate must reach BOTH part scans (the join leg
    and the per-part threshold leg), and the correlated-AVG rewrite must
    stay broadcast — a SortMergeJoin here would shuffle lineitem twice."""
    plan = _plan(spark, sf_dir, "tpch_small_qty_revenue")
    assert plan.count("EqualTo(p_brand,Brand#3)") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_deep_disjunction_pushed_to_lineitem_scan(spark, sf_dir):
    """Q19: Catalyst must factor the lineitem-only legs of the
    OR-of-conjunctions into a scan-pushable quantity disjunction; the
    part side stays a single broadcast build."""
    plan = _plan(spark, sf_dir, "tpch_disjunctive_revenue")
    assert "Or(" in plan and "l_quantity" in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_deep_order_count_preaggregates_orders(spark, sf_dir):
    """Q13: orders are aggregated to one row per customer BEFORE the
    left join (priority filter pushed to the orders scan), so the join
    never sees the raw fact table."""
    plan = _plan(spark, sf_dir, "tpch_order_count_distribution")
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan, plan
    # pre-agg on o_custkey, final agg on c_count: two keyed exchanges max
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_tpch_deep_topk_queries_take_ordered(spark, sf_dir):
    """Q10/Q18: deterministic top-k compiles to TakeOrderedAndProject,
    never a global sort."""
    for name in ("tpch_returned_item_customers", "tpch_large_volume_customers"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, (name, plan)
        assert "Sort " not in plan.replace("TakeOrderedAndProject", ""), (name, plan)


def test_tpch_deep_scalar_subqueries_broadcast(spark, sf_dir):
    """Q15/Q22: the scalar threshold joins (MAX revenue, AVG balance)
    must be broadcast 1-row joins, not cartesian products."""
    for name in ("tpch_top_supplier", "tpch_idle_customers"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, (name, plan)
    # Q22's cross join against the 1-row scalar is a broadcast NLJ
    plan = _plan(spark, sf_dir, "tpch_idle_customers")
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan


def test_tpch_deep_volume_shipping_nation_filter_pushed(spark, sf_dir):
    """Q7: the nation-pair membership prunes both nation dim scans at
    the source."""
    plan = _plan(spark, sf_dir, "tpch_volume_shipping")
    assert plan.count("In(n_name") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_record_linkage_blocking_join_is_equi(spark, sf_dir):
    """Blocked linkage must pair via the blocking-key equi-join — a
    CartesianProduct here is the all-pairs scan blocking exists to
    avoid; the Levenshtein scorer stays JVM-side (no Python eval)."""
    for name in ("record_linkage_blocks", "record_linkage_matches"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "EvalPython" not in plan, (name, plan)


def test_wma_single_user_window(spark, sf_dir):
    """The 7-lag kernel must resolve in ONE user-partitioned window
    (one shuffle + one sort), not one window per lag."""
    import re

    plan = _plan(spark, sf_dir, "wma_user_value")
    windows = re.findall(r"Window .*", plan)
    assert windows, plan
    for w in windows:
        assert "user_id" in w, w
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_mixture_temperature_scalar_is_broadcast(spark, sf_dir):
    """The normalizing total joins back as a broadcast 1-row scalar —
    never a collect() literal, never a cartesian."""
    plan = _plan(spark, sf_dir, "mixture_temperature_weights")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_kmeans_centroids_broadcast_no_cartesian(spark, sf_dir):
    """Both Lloyd iterations must score via a BROADCAST of the K-row
    centroid side; an unhinted CartesianProduct would shuffle the corpus
    against itself. The argmin windows partition by vec_id (K rows per
    partition — bounded state)."""
    import re

    plan = _plan(spark, sf_dir, "kmeans_embeddings")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan
    for w in re.findall(r"Window .*", plan):
        assert "vec_id" in w, w


def test_attribution_is_single_window_no_join(spark, sf_dir):
    """First/last-touch attribution resolves both credits in ONE
    user-partitioned window pass — no self-join, no per-purchase
    lookback join, one key shuffle."""
    import re

    plan = _plan(spark, sf_dir, "attribution_first_last_touch")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    for w in re.findall(r"Window .*", plan):
        assert "user_id" in w, w


def test_no_cartesian_product_in_any_batch_plan(spark, sf_dir):
    """Blanket net over the whole registry: NO batch query may compile
    to a CartesianProduct — every intentional cross join in the engine
    is a broadcast nested loop against a provably-tiny side (scalars,
    centroids, query vectors). Streaming compositions are skipped (their
    builders execute foreachBatch pipelines, and their plans are
    per-micro-batch); everything else must build a cartesian-free plan."""
    skip_prefixes = ("streaming_", "scd2_stream_")
    bad = []
    for name, fn in entry.queries().items():
        if name.startswith(skip_prefixes):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # builder failure is its own red flag
            bad.append((name, f"plan build failed: {exc}"))
            continue
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
    assert not bad, bad


def test_forward_asof_is_window_not_range_join(spark, sf_dir):
    """The forward as-of mirror must also compile to union + window
    (one key shuffle), never an inequality join."""
    plan = _plan(spark, sf_dir, "asof_next_purchase")
    assert "Window" in plan, plan
    assert "Join" not in plan, plan


def test_mor_read_broadcasts_delete_keys(spark, sf_dir):
    """Merge-on-read scan: the delete-key side is tiny by construction,
    so the sequence-scoped anti joins must broadcast it — a sort-merge
    here would shuffle the data files to delete a handful of keys."""
    plan = _plan(spark, sf_dir, "snapshot_mor_read")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cdc_chunker_windows_share_one_shuffle(spark, sf_dir):
    """The rolling-hash lags and the boundary running sum are both
    doc-partitioned windows over the same ordering — they must share a
    single exchange, not shuffle the exploded tokens twice."""
    import re

    plan = _plan(spark, sf_dir, "doc_chunk_cdc")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for w in re.findall(r"Window .*", plan):
        assert "doc_id" in w, w


def test_single_shuffle_window_family(spark, sf_dir):
    """RANGE-frame and running-distinct queries: one keyed exchange,
    one window, no join."""
    for name in ("rolling_1h_user_value", "running_distinct_types"):
        plan = _plan(spark, sf_dir, name)
        assert plan.count("Exchange hashpartitioning") == 1, (name, plan)
        assert "Join" not in plan, (name, plan)


def test_linkage_matches_prunes_via_half_key_joins(spark, sf_dir):
    """The lev<=1 matcher must generate candidates from per-half
    EQUI-joins (half string in the hash-join key), not score the full
    within-block cross — three joins (h1, h2, length-sliver fallback),
    all hash-based."""
    plan = _plan(spark, sf_dir, "record_linkage_matches")
    assert "CartesianProduct" not in plan, plan
    joins = plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    )
    assert joins == 3, plan


def test_merkle_drilldown_is_broadcast_gated(spark, sf_dir):
    """The per-key drill-down must be gated by a broadcast of the tiny
    divergent-partition list, never a shuffle of the full key space
    against it."""
    plan = _plan(spark, sf_dir, "table_merkle_sync")
    assert "BroadcastHashJoin" in plan, plan


def test_decon_fraction_broadcasts_heldout_shingles(spark, sf_dir):
    """Decontamination joins the train shingles against the (small)
    held-out shingle set — that side must broadcast."""
    plan = _plan(spark, sf_dir, "decontaminate_overlap_fraction")
    assert "BroadcastHashJoin" in plan, plan


def test_hll_rolling_merge_broadcasts_day_spine(spark, sf_dir):
    """The rolling sketch merge range-joins daily registers against the
    calendar spine: the spine is broadcast (nested-loop against a
    ~30-row side), never a cartesian shuffle."""
    plan = _plan(spark, sf_dir, "hll_rolling_distinct")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_khop_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "graph_khop_features")
    assert "TakeOrderedAndProject" in plan, plan


def test_ks_prefix_and_totals_broadcast(spark, sf_dir):
    """KS joins the (bucket, value) grain against the <=500-row bucket
    prefix table and the 1-row totals — both must broadcast."""
    plan = _plan(spark, sf_dir, "stats_ks_value_drift")
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 2, plan


def test_semdedup_pair_join_is_keyed_not_cartesian(spark, sf_dir):
    """The SemDeDup within-cluster pair search must be an equi-join on
    the cluster id (Sigma|cell|^2 work), never a cross join; the only
    broadcast-nested-loop allowed is the K-row centroid fan-out."""
    plan = _plan(spark, sf_dir, "semdedup_embeddings")
    assert "CartesianProduct" not in plan, plan
    # K-row centroid fan-outs only (the pair self-join re-plans the
    # assignment subtree on each side, so the fan-out appears 3x)
    assert plan.count("BroadcastNestedLoopJoin") <= 3, plan
    assert "SortMergeJoin [cid" in plan, plan  # the pair search is keyed


def test_weighted_wor_has_no_global_sort(spark, sf_dir):
    """Per-stratum top-k: the window partitions by lang — a
    SinglePartition exchange would funnel the corpus through one task."""
    plan = _plan(spark, sf_dir, "sample_weighted_wor")
    assert "Exchange SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bigram_surprisal_is_hash_agg_joins(spark, sf_dir):
    """Count-table joins only; the sole nested-loop is the broadcast of
    the 1-row vocabulary scalar."""
    plan = _plan(spark, sf_dir, "text_bigram_surprisal")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_sql_udf_is_catalyst_inlined(spark, sf_dir):
    """A SQL-language UDF must be substituted into the plan — zero
    Python evaluation nodes, aggregation in whole-stage codegen."""
    plan = _plan(spark, sf_dir, "sql_udf_value_bands")
    assert "EvalPython" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_no_cartesian_product_inside_checkpoint_fences(spark, monkeypatch):
    """The two blanket sweeps see a LogicalRDD leaf wherever a
    localCheckpoint truncated the plan, so a CartesianProduct INSIDE a
    fence is invisible to them — round 9 found a sort-merge join that
    had been hiding behind the ANN sweep's per-config fences exactly
    this way. Wrap localCheckpoint to capture every fenced subtree's
    physical plan during query construction and sweep THOSE for the
    banned node too (executedPlan is computed by the checkpoint anyway;
    the capture only adds a toString). Streaming compositions and the
    versioned-table/fixture builders stay skipped for the same reasons
    as the plan-only sweep below — but the fence-heavy families
    (dedup, curation, clustering, eval sweeps) all run here."""
    from pyspark.sql import DataFrame

    captured: list[str] = []
    orig = DataFrame.localCheckpoint

    def capturing(self, eager=True):
        captured.append(self._jdf.queryExecution().executedPlan().toString())
        return orig(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", capturing)
    skip_prefixes = (
        "streaming_",
        "scd2_stream",
        "sse_replay",
        "snapshot_",
        "partition_evolution",
        "bucketed_join",
        "partitioned_scan",
        "multimodal_",  # fixture container encode is exercised by its own tests
    )
    sf = "/root/testdata/sf0.001"
    bad = []
    for name, fn in entry.queries().items():
        if name.startswith(skip_prefixes):
            continue
        mark = len(captured)
        fn(spark, sf)
        for plan in captured[mark:]:
            if "CartesianProduct" in plan:
                bad.append(name)
                break
    assert not bad, bad


def test_no_cartesian_product_in_any_registered_plan(spark):
    """Repo-wide scale guard: NO registered query may compile to a
    CartesianProduct — every pair enumeration must be keyed (equi-join
    on bucket/cluster/block) or a bounded broadcast nested loop.
    Queries that execute jobs during plan construction (streaming
    sinks, versioned-table builders, fixture writers) are exercised by
    their own tests and skipped here — this sweep is plan-only."""
    skip_prefixes = (
        "streaming_",
        "snapshot_",
        "partition_evolution",
        "bucketed_join",
        "partitioned_scan",
        "scd2_stream",
        "hll_rolling",
        "multimodal_",
        "sse_replay",
        "curate_corpus",
    )
    python_allowed = {
        # the declared Python-boundary demos (§2.12) — everything else
        # must stay whole-stage-codegen JVM
        "user_value_median_pandas",
        "props_kv_udtf",
        "cogroup_click_purchase_lag",
        "embedding_int8_codes",
    }
    sf = "/root/testdata/sf0.001"
    cartesian, python_leaks = [], []
    for name, fn in entry.queries().items():
        if name.startswith(skip_prefixes):
            continue
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if (
            ("EvalPython" in plan or "PythonUDTF" in plan or "MapInArrow" in plan)
            and name not in python_allowed
        ):
            python_leaks.append(name)
    assert not cartesian, cartesian
    assert not python_leaks, python_leaks


def test_knn_broadcasts_probe_side_not_corpus(spark, sf_dir):
    """The kNN yardstick must broadcast the bounded held-out probe set;
    a broadcast of the train (corpus-scale) side is a driver OOM at
    100x."""
    # the registered query serves the session-shared prediction memo
    # (a checkpoint fence that hides the subplan) — pin the underlying
    # builder, the same internals-not-memo precedent as the RRF test
    from wikistream_event_data_pipeline_aws_spark.plans.kmeans import (
        _knn_classify_embeddings,
    )

    df = _knn_classify_embeddings(spark, sf_dir)
    lines = df._jdf.queryExecution().analyzed().toString().splitlines()
    hinted = [
        "\n".join(lines[i : i + 6]) for i, ln in enumerate(lines) if "ResolvedHint" in ln
    ]
    assert hinted, "broadcast hint disappeared"
    for subtree in hinted:
        # the hinted subtree must be the probe slice: aliased t_id with
        # the (% 20 == 0) filter directly beneath the hint
        assert "AS t_id" in subtree, subtree
        assert "% cast(20 as bigint)) = cast(0 as bigint)" in subtree, subtree


def test_no_broadcast_hint_on_scaling_names_in_source():
    """Source-level sweep of the round-1 policy: explicit F.broadcast()
    hints may wrap only SF-invariant or by-construction-bounded frames —
    never raw customer/supplier/part/orders/lineitem handles (round-5
    audit removed ten such hints from the TPC-H deep set and the
    stream-static enrich)."""
    import pathlib
    import re

    import wikistream_event_data_pipeline_aws_spark as pkg

    banned = re.compile(r"F\.broadcast\((cust|supp|part|orders|li|per_part)[,)]")
    root = pathlib.Path(pkg.__file__).parent
    hits = []
    for p in root.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if banned.search(line):
                hits.append(f"{p.name}:{i}: {line.strip()}")
    assert not hits, hits


@pytest.mark.parametrize(
    "name",
    [
        "multimodal_phash_neardup",
        "multimodal_audio_fp_neardup",
        "multimodal_video_frame_neardup",
        "mine_hard_negatives",
        "streaming_postings_sink",
        "streaming_ann_index_sink",
        "curate_corpus_multimodal",
        "dedup_method_agreement",
    ],
)
def test_round8_pair_operators_never_cartesian(spark, sf_dir, name):
    """Every near-dup / candidate-pair operator (round-8 media paths,
    the round-9 multimodal curation flagship and the production
    method-agreement artifact) must pair via a keyed equi-join (band
    bucket, frame key, posting token, signature bucket, chunk
    fingerprint) — a CartesianProduct anywhere is the scale regression
    these designs exist to avoid."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan


def test_rrf_ann_ranking_leg_is_bucket_join_not_scan(spark, sf_dir):
    """retrieval_rrf_ann's RANKING semantic leg must come from the LSH
    bucket join — no brute-force corpus scan (BroadcastNestedLoopJoin)
    in the fused ranking. (The registered query additionally joins the
    exact-fused variant as the recall AUDIT, which legitimately
    contains the brute-force baseline — so this pins the ranking
    subplan, built from the same internals the query composes.)"""
    from wikistream_event_data_pipeline_aws_spark.catalog import load_table
    from wikistream_event_data_pipeline_aws_spark.operators.similarity import (
        lsh_multi_table_topk,
    )
    from wikistream_event_data_pipeline_aws_spark.plans.similarity import (
        DIM,
        N_PLANES,
        N_TABLES,
        RRF_QUERIES,
        RRF_TOPK,
        _lexical_jaccard_topk,
        _rrf_fused,
    )
    from pyspark.sql import functions as F

    lexk = _lexical_jaccard_topk(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    semk = lsh_multi_table_topk(
        e.filter(F.col("vec_id") < RRF_QUERIES),
        e,
        dim=DIM,
        k=RRF_TOPK,
        n_planes=N_PLANES,
        n_tables=N_TABLES,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("cand_id"),
        F.col("rank").alias("sem_rank"),
    )
    ranking = _rrf_fused(lexk, semk)
    plan = ranking._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_jsd_emits_disjoint_vocabulary_pairs_spark(spark, tmp_path):
    """Spark twin of the DuckDB oracle test (ADVICE r11): a source pair
    with zero shared tokens must still emit a row — the ns x ns pair
    spine left-joined with the shared-token aggregate yields
    shared_vocab = 0 and jsd_nats = ln 2 exactly."""
    import math

    from wikistream_event_data_pipeline_aws_spark.plans.text import (
        text_jsd_pairwise_sources,
    )

    spark.createDataFrame(
        [
            (1, "a", "alpha beta beta"),
            (2, "b", "gamma delta"),
            (3, "c", "alpha gamma epsilon"),
        ],
        "doc_id int, source string, text string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        (r["s1"], r["s2"]): r
        for r in text_jsd_pairwise_sources(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = rows[("a", "b")]
    assert (ab["n1_tokens"], ab["n2_tokens"], ab["shared_vocab"]) == (3, 2, 0)
    assert ab["jsd_nats"] == pytest.approx(math.log(2), abs=1e-12)
    assert ab["jsd_normalized"] == pytest.approx(1.0, abs=1e-12)
    for key in (("a", "c"), ("b", "c")):
        assert rows[key]["shared_vocab"] == 1
        assert 0.0 < rows[key]["jsd_nats"] < math.log(2)


def test_jsd_pair_spine_is_broadcast_not_cartesian(spark, sf_dir):
    """ADVICE r12: the ns x ns inequality join that seeds the pair
    spine carries an explicit F.broadcast hint, so it must plan as a
    BroadcastNestedLoopJoin over the |sources|-row aggregate — if
    Spark's size estimate ever exceeded autoBroadcastJoinThreshold
    without the hint, the same join would degrade to a
    CartesianProduct (corpus-scale shuffle of both sides)."""
    plan = _plan(spark, sf_dir, "text_jsd_pairwise_sources")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_quality_gate_constructs_with_zero_driver_actions(spark, sf_dir):
    """VERDICT r11 item 4 (exceeded): the percentile gate used to issue
    four driver actions during plan CONSTRUCTION (range agg, histogram
    collect, threshold lookup) before the caller's own action — each a
    synchronization point paying the tail on a degraded host. The
    threshold now computes in-plan (two-level bucket cumulative), so
    building the DataFrame must launch ZERO Spark jobs."""
    sc = spark.sparkContext
    st = sc.statusTracker()
    sc.setJobGroup("qpg-construct", "quality_percentile_gate construction")
    try:
        df = entry.queries()["quality_percentile_gate"](spark, sf_dir)
        ids = st.getJobIdsForGroup("qpg-construct")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    # spark.read.parquet fires one single-task schema-inference job per
    # call — metadata, not corpus work. Anything beyond that (the old
    # aggs/collects planned multi-task shuffle stages) is a regression.
    for jid in ids:
        info = st.getJobInfo(jid)
        tasks = [st.getStageInfo(s).numTasks for s in info.stageIds]
        assert len(tasks) == 1 and tasks[0] <= 1, (jid, tasks)
    # the one unpartitioned window runs over the bounded bucket grain,
    # downstream of the bucket rollup — corpus-scale legs stay keyed
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    flat = plan.replace(" ", "").lower()
    assert "windowspecdefinition(bucket" in flat, plan
