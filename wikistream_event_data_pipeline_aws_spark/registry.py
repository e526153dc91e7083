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
# round (the gate truncates at exactly 50 in insertion order — a 51st
# entry is silently dropped, so _DRIVER_FRONT MUST stay <= 50;
# tests/test_plans.py pins that). Rotation policy (VERDICT r3 item 1,
# mechanized in tools/front_rotation.py, enforced by
# tests/test_rotation_debt.py):
#   front = NEW queries (no prior green driver row)
#         + CHANGED-output queries (_FRONT_CHANGED below)
#         + the stalest cohorts (oldest newest-green-row first,
#           registration order within a cohort), truncated at 50.
# Same-output refactors proven by the parity suite take no slots. The
# full registry is always registered — only iteration order changes.
# Per-round composition history lives in COVERAGE.md ("Front-rotation
# history"); regenerate this block with
#   python tools/front_rotation.py --target-round N [--changed a,b]
#
# _FRONT_TARGET_ROUND pins WHICH round this composition was built for:
# the rotation-debt guard computes staleness against CORRECTNESS files
# from rounds BEFORE it, so the driver dropping this round's file
# cannot retroactively invalidate the front that produced it. Bump it
# together with every rotation; a CORRECTNESS file NEWER than it means
# a round ran without rotation and the guard goes red.
_FRONT_TARGET_ROUND = 13
# Round 13 (tools/front_rotation.py --target-round 13 --changed
# bpe_vocabulary_merges,bpe_segmentation_fertility,bpe_vocabulary_curve,
# dedup_lsh_sweep): 3 NEW (bpe_encode_heldout_fertility — apply the
# learned merge table to the held-out md5 split, incl. OOV words;
# bpe_encode_heldout_curve — the held-out validation curve per merge
# budget; unigram_viterbi_nll — SentencePiece-family Viterbi scoring
# via integer min-plus repeated squaring) + 4 CHANGED-plan rows from
# the r13 optimization round (the BPE one-window-cascade rewrite +
# curve union-agg readouts; dedup_lsh_sweep's shared-flag collapse) —
# same-output refactors parity-proven locally, fronted anyway given
# their size — + the 16 r7-stale rows (floor rises to r8) + 27 of the
# 46 r8 rows; 19 r8 rows defer to round 14.
_FRONT_CHANGED: tuple[str, ...] = (
    "bpe_vocabulary_merges",
    "bpe_segmentation_fertility",
    "bpe_vocabulary_curve",
    "dedup_lsh_sweep",
    "dedup_minhash_pairs",
    "dedup_clusters",
    "dedup_cluster_keepers",
    "dedup_method_agreement",
    "dedup_sim16_agreement",
    "split_leakage_audit",
    "curate_corpus",
    "knn_classify_embeddings",
    "eval_knn_confusion",
    "similarity_ann_lsh_multi",
    "similarity_ann_recall",
    "eval_ann_ranking",
    "dedup_simhash_band60",
    "dedup_simhash_pairs",
    "graph_khop_features",
    "similarity_cosine_topk",
    "similarity_ann_sweep",
    "retrieval_rrf_hybrid",
    "retrieval_rrf_ann",
)
_DRIVER_FRONT: tuple[str, ...] = (
    "bpe_encode_heldout_fertility",
    "bpe_encode_heldout_curve",
    "unigram_viterbi_nll",
    "dedup_lsh_sweep",
    "bpe_vocabulary_merges",
    "bpe_segmentation_fertility",
    "bpe_vocabulary_curve",
    "dedup_minhash_pairs",
    "dedup_clusters",
    "dedup_cluster_keepers",
    "dedup_method_agreement",
    "dedup_sim16_agreement",
    "split_leakage_audit",
    "curate_corpus",
    "similarity_ann_lsh_multi",
    "similarity_ann_recall",
    "eval_ann_ranking",
    "eval_knn_confusion",
    "knn_classify_embeddings",
    "dedup_simhash_pairs",
    "dedup_simhash_band60",
    "graph_khop_features",
    "similarity_cosine_topk",
    "retrieval_rrf_hybrid",
    "retrieval_rrf_ann",
    "similarity_ann_sweep",
    "merge_upsert_orders",
    "snapshot_mor_position_deletes",
    "snapshot_tag_retention_read",
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
    "event_transition_matrix",
    "tpch_pricing_summary",
    "tpch_shipping_priority",
    "tpch_local_supplier_revenue",
    "join_semi_building_orders",
    "join_anti_customers_without_orders",
    "join_left_customer_order_profile",
    "tpch_order_priority_count",
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
        "bpe",
        "unigram",
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
