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
_FRONT_TARGET_ROUND = 14
# Round 14 (tools/front_rotation.py --target-round 14 --changed <the
# 20 r14 optimization-round rewrites>): 0 NEW + 20 CHANGED-plan rows
# (unigram identity-seeded squaring; lsh_sweep shared shingle pass;
# ann_sweep IVF consolidation; scd2 fixture cache; the two
# no-data-batch skips; the four append-merge sinks; the nine
# shared-edge-list graph queries; sim16_agreement fused seeding) —
# same-output refactors parity-proven locally, fronted per the r13
# precedent — + the stalest r8 cohort rows, truncated at 50; the
# remainder defers to round 15.
_FRONT_CHANGED: tuple[str, ...] = (
    "unigram_viterbi_nll",
    "dedup_lsh_sweep",
    "similarity_ann_sweep",
    "scd2_stream_replay",
    "streaming_dedup_watermark",
    "streaming_interval_join",
    "streaming_postings_sink",
    "streaming_ann_index_sink",
    "streaming_histogram_quantiles",
    "streaming_entropy_sink",
    "graph_eigencentrality",
    "graph_kcore_peel",
    "graph_khop_features",
    "graph_link_prediction",
    "graph_modularity_brand",
    "graph_pagerank",
    "graph_recursive_reachability",
    "graph_substitutes",
    "graph_triangle_count",
    "dedup_sim16_agreement",
)
_DRIVER_FRONT: tuple[str, ...] = (
    "unigram_viterbi_nll",
    "dedup_lsh_sweep",
    "dedup_sim16_agreement",
    "graph_khop_features",
    "similarity_ann_sweep",
    "streaming_dedup_watermark",
    "streaming_interval_join",
    "streaming_entropy_sink",
    "streaming_postings_sink",
    "streaming_histogram_quantiles",
    "streaming_ann_index_sink",
    "graph_triangle_count",
    "graph_modularity_brand",
    "graph_pagerank",
    "graph_kcore_peel",
    "graph_eigencentrality",
    "graph_substitutes",
    "graph_recursive_reachability",
    "graph_link_prediction",
    "scd2_stream_replay",
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
    "sse_replay_source_stats",
    "mine_hard_negatives",
    "multimodal_video_frame_neardup",
    "incremental_agg_merge",
    "skew_profile",
    "dq_outlier_zscore",
    "table_diff_orders",
    "hourly_gapfill",
    "streaming_session_window",
    "partitioned_scan_pruning",
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
