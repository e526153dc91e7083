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
# Round 8 composition (VERDICT r7 item 1): with the full 229-query
# registry driver-green (union r01–r07 = 229/229 = the registry), the
# front is this round's new/changed queries plus pure rotation:
# retrieval_rrf_ann (NEW: RRF hybrid whose semantic leg runs through
# the LSH-bucketed ANN candidate path instead of a full embedding
# scan), multimodal_phash_neardup (NEW: dHash perceptual fingerprints
# over decoded PNG pixels -> banded Hamming join),
# multimodal_audio_fp_neardup (NEW: Haitsma-Kalker-style energy
# fingerprints over decoded WAV samples -> same band join),
# multimodal_video_frame_neardup (NEW: Y4M keyframe-identity set
# overlap — frame-key equi-join + exact Jaccard),
# streaming_postings_sink (NEW: incremental (token, doc) postings
# maintenance through the insert-only merge) and
# streaming_ann_index_sink (NEW: its vector-leg twin — streamed LSH
# signature table answering the batch multi-table oracle),
# mine_hard_negatives (NEW: contrastive-training pair construction —
# LSH candidates, near-dup positives cut at cosine 0.95, top-5
# negatives per anchor),
# dedup_method_agreement + dedup_simhash_pairs (implementation
# changed: minhash leg fenced/reused + envelope guard no longer a
# separate full-corpus count — VERDICT item 4, ADVICE item 6),
# sse_replay_source_stats (implementation changed: fixture rebuild
# moved off the timed path — VERDICT item 5), similarity_ann_sweep
# (implementation changed: hyperplane projections shared across
# table-count configs — VERDICT item 6) head the front; then ALL 39
# queries whose newest driver row is r3 (the stalest cohort); then
# no backfill room remains: 11 new/changed + 39 stalest-r3 = 50.  Done = CORRECTNESS_r08 50/50 green and no query's newest row
# older than r4.
#
# _FRONT_TARGET_ROUND pins WHICH round this composition was built for:
# the rotation-debt guard computes staleness against CORRECTNESS files
# from rounds BEFORE it, so the driver dropping this round's file
# cannot retroactively invalidate the front that produced it
# (emission-safe sequencing, VERDICT r6 item 1). Bump it together with
# every front rotation; a CORRECTNESS file NEWER than it means a round
# ran without rotation and the guard goes red.
_FRONT_TARGET_ROUND = 8
_DRIVER_FRONT: tuple[str, ...] = (
    # -- new or changed this round (must verify now) --
    "retrieval_rrf_ann",
    "multimodal_phash_neardup",
    "multimodal_audio_fp_neardup",
    "multimodal_video_frame_neardup",
    "streaming_postings_sink",
    "streaming_ann_index_sink",
    "mine_hard_negatives",
    "dedup_method_agreement",
    "dedup_simhash_pairs",
    "sse_replay_source_stats",
    "similarity_ann_sweep",
    # -- all 39 queries whose newest driver row is r3 (stalest cohort) --
    "event_transition_matrix",
    "tpch_pricing_summary",
    "tpch_shipping_priority",
    "tpch_local_supplier_revenue",
    "join_semi_building_orders",
    "join_anti_customers_without_orders",
    "join_left_customer_order_profile",
    "tpch_order_priority_count",
    "tpch_forecast_revenue",
    "tpch_promo_revenue",
    "dedup_keep_first",
    "daily_lag_trend",
    "running_total_per_user",
    "rank_customers_by_balance",
    "top3_orders_per_customer",
    "user_sessionization",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_union_all_slices",
    "json_extract_props",
    "envelope_parse",
    "json_assemble_evidence",
    "dedup_passage_exact",
    "pack_sequences",
    "bpe_merge_candidates",
    "sample_importance_tokens",
    "quality_percentile_gate",
    "similarity_ann_recall",
    "graph_triangle_count",
    "incremental_agg_merge",
    "skew_profile",
    "dq_outlier_zscore",
    "table_diff_orders",
    "hourly_gapfill",
    "streaming_session_window",
    "partitioned_scan_pruning",
    "compaction_plan",
    "bucketed_join_colocated",
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
