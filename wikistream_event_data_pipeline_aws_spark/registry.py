"""Central query registry: name -> (builder fn, DuckDB oracle SQL | None).

Consumed by ``__spark_entry__.py`` (driver contract) and by the parity
test-suite, which replays the driver's check locally: run the Spark plan
and the oracle SQL side-by-side and compare row count, column names and
order-insensitive values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# The driver verifies the FIRST 50 registered queries against DuckDB each
# round (CORRECTNESS_r01/r02 cut off at exactly the first 50 in insertion
# order — a 51st entry is silently dropped, so this list MUST stay <= 50;
# tests/test_plans.py pins that).  Rotation policy (VERDICT r3 item 1):
# front = (queries whose implementation or oracle changed this round)
# + (queries new this round) + (queries with the OLDEST driver row),
# capped at 50 — so every registered query keeps accumulating fresh
# verification rows and no stale green row shields a changed plan.
# Round 4 composition: all 45 of the round's new queries (tpch_deep,
# linkage, wma/mixture, kmeans + scatter, snapshots incl. merge-on-read,
# stats incl. CUSUM / k-anonymity / A-B readout, attribution,
# relational, streaming-outer, hashing, range-frame, CDC chunking +
# chunk dedup, TWAP + sweep-line, HLL-join, trigram, rolling actives,
# cohort LTV, basket lift, Gini)
# + 5 changed fill all 50 slots (the 25 r1 rows bump to round 5 — new
# queries MUST verify this round; an old green row only ages).
# The full set is always registered — only iteration order changes.
# Queries added AFTER the round-4 front froze at 50 — the continuation
# session's 26 additions (survival/KS/chi2/TVD/seasonal exact stats,
# KM life table, graph khop/kcore, split-leakage + CV folds + decon
# fractions + n-gram novelty, PQ residuals, KMV + rolling/streaming
# HLL sketches, Merkle sync, IVM join delta, LPM join, sequence
# patterns, churn labels, revenue shares, supplier lead time, decayed
# scores, cluster keepers, funnel latency) — are pytest-parity-verified
# (tests/test_oracle_parity.py replays the driver check) and MUST head
# the round-5 front together with the displaced r1 rows.
# Round 7 composition (VERDICT r6 item 1): with the full 226-query
# registry driver-green (union r01–r06 = 225/225 before this round's
# addition), the front is pure rotation plus this round's changes:
# text_bm25_topk (NEW: BM25 ranked retrieval) and retrieval_rrf_hybrid
# (NEW: reciprocal-rank fusion of lexical + vector legs),
# snapshot_mor_position_deletes (NEW: Iceberg v2 position-delete MoR
# encoding) and snapshot_tag_retention_read (NEW: tag refs as GC
# roots), dedup_simhash_pairs + dedup_simhash_band60 (implementation
# changed: map-only HOF signature computation; 16-bit variant also
# fail-fast bounded), dedup_method_agreement (oracle + implementation
# changed: three-way lsh/sim16/sim60 agreement on a fused signature
# pass — the simhash migration evidence), cogroup_click_purchase_lag
# and sse_replay_source_stats (implementation changed: fixed-overhead
# trim, VERDICT r6 item 5) head the front; then ALL 34 queries whose
# newest driver row is r2 (the stalest cohort); then the 7
# registration-order-oldest r3 rows as backfill: 9 + 34 + 7 = 50.
# Done = CORRECTNESS_r07 50/50 green and no query's newest row older
# than r3.
#
# _FRONT_TARGET_ROUND pins WHICH round this composition was built for:
# the rotation-debt guard computes staleness against CORRECTNESS files
# from rounds BEFORE it, so the driver dropping this round's file
# cannot retroactively invalidate the front that produced it
# (emission-safe sequencing, VERDICT r6 item 1). Bump it together with
# every front rotation; a CORRECTNESS file NEWER than it means a round
# ran without rotation and the guard goes red.
_FRONT_TARGET_ROUND = 7
_DRIVER_FRONT: tuple[str, ...] = (
    "text_bm25_topk",
    "retrieval_rrf_hybrid",
    "snapshot_mor_position_deletes",
    "snapshot_tag_retention_read",
    "dedup_simhash_pairs",
    "dedup_simhash_band60",
    "dedup_method_agreement",
    "cogroup_click_purchase_lag",
    "sse_replay_source_stats",
    "histogram_quantiles_value",
    "user_value_median_pandas",
    "props_kv_udtf",
    "similarity_ann_lsh_multi",
    "join_salted_skew",
    "grouping_sets_type_date",
    "asof_latest_click",
    "range_join_next_hour",
    "user_value_trend",
    "bloom_semi_join_stats",
    "dq_completeness",
    "dq_containment",
    "dq_uniqueness",
    "dq_range",
    "dq_accuracy_recompute",
    "dq_cross_column",
    "dq_profile_value",
    "dq_drift_halves",
    "dq_freshness",
    "merge_insert_only_orders",
    "merge_upsert_orders",
    "tumbling_hourly_counts",
    "tumbling_15min_by_type",
    "sliding_1h_15m_counts",
    "session_window_user_stats",
    "streaming_tumbling_hourly",
    "streaming_dedup_watermark",
    "streaming_stateful_running_count",
    "streaming_static_enrich",
    "streaming_interval_join",
    "quality_flags",
    "peak_hour_analytic",
    "gate_status_rollup",
    "zorder_cluster_stats",
    "hourly_stats",
    "user_daily_metrics",
    "risk_scores",
    "daily_summary",
    "top_risk_alerts",
    "funnel_view_click_purchase",
    "retention_cohorts",
)


def _front_ordered(d: dict) -> dict:
    """Return *d* with ``_DRIVER_FRONT`` names first, others in original order."""
    front = {k: d[k] for k in _DRIVER_FRONT if k in d}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}


def _register(queries: dict[str, QueryFn], oracles: dict[str, str | None]) -> None:
    for name, fn in queries.items():
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        sql = oracles.get(name)
        if sql is not None:
            _ORACLES[name] = sql


def _load() -> None:
    if _QUERIES:
        return
    from .plans import wiki

    _register(wiki.QUERIES, wiki.ORACLES)
    for modname in (
        "tpch",
        "tpch_deep",
        "linkage",
        "attribution",
        "relational",
        "windows",
        "setops",
        "json_ops",
        "dedup",
        "text",
        "llmprep",
        "curate",
        "sketches",
        "stats",
        "pyapi",
        "similarity",
        "kmeans",
        "graph",
        "multimodal",
        "extensions",
        "dq",
        "merge",
        "snapshots",
        "streaming_batch",
        "streaming_live",
        "silver_flags",
        "partitioned",
    ):
        # No ImportError guard: every plans module is in-repo and mandatory.
        # A broken import must fail loudly, not silently shrink the registry
        # (tests pin the exact query count as a second line of defence).
        mod = __import__(f"{__package__}.plans.{modname}", fromlist=["QUERIES", "ORACLES"])
        _register(mod.QUERIES, getattr(mod, "ORACLES", {}))


def queries() -> dict[str, QueryFn]:
    _load()
    return _front_ordered(_QUERIES)


def oracles() -> dict[str, str]:
    _load()
    return _front_ordered(_ORACLES)
