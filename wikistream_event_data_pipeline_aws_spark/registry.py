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
_FRONT_TARGET_ROUND = 12
# Round 12 (tools/front_rotation.py --target-round 12 --changed
# bpe_vocabulary_merges,text_mutual_information_source_token,
# bpe_segmentation_fertility,bpe_vocabulary_curve): 4 NEW
# (bpe_vocabulary_merges — the k-round merge-table induction;
# bpe_segmentation_fertility — its encode-side fertility readout;
# bpe_vocabulary_curve — the training curve over the same memoized
# rounds; text_mutual_information_source_token — the detmath
# log-family MI completion) + the 15 registration-last r6 rows
# deferred from round 11 (retiring the last rotation debt: staleness
# floor rises to r7) + 31 of the 47 r7 rows; 16 r7 rows defer to
# round 13. The round's
# two same-output refactors (text_jsd_pairwise_sources' disjoint-pair
# spine, quality_percentile_gate's in-plan threshold) take no slots —
# parity-proven identical at driver SF.
_FRONT_CHANGED: tuple[str, ...] = (
    "bpe_vocabulary_merges",
    "text_mutual_information_source_token",
    "bpe_segmentation_fertility",
    "bpe_vocabulary_curve",
)
_DRIVER_FRONT: tuple[str, ...] = (
    "text_mutual_information_source_token",
    "bpe_vocabulary_merges",
    "bpe_segmentation_fertility",
    "bpe_vocabulary_curve",
    "similarity_embedding_neardup",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "embedding_int8_codes",
    "embedding_training_pairs",
    "graph_recursive_reachability",
    "multimodal_metadata",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_audio_energy",
    "pivot_type_counts_by_date",
    "rollup_date_type",
    "cube_type_hour",
    "map_explode_props",
    "sql_udf_value_bands",
    "hourly_stats",
    "user_daily_metrics",
    "risk_scores",
    "daily_summary",
    "top_risk_alerts",
    "funnel_view_click_purchase",
    "retention_cohorts",
    "dedup_simhash_band60",
    "text_bm25_topk",
    "histogram_quantiles_value",
    "user_value_median_pandas",
    "props_kv_udtf",
    "cogroup_click_purchase_lag",
    "retrieval_rrf_hybrid",
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
