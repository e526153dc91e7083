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
# tests/test_plans.py pins that).  Round 3 promotes the 7 queries that have
# no driver row in r01∪r02 (partitioned_scan_pruning missed BOTH rotations)
# plus pack_sequences, whose round-2 row was red on an oracle-side HUGEINT
# type bug (now fixed) and needs a green re-check.  Queries added in round 3
# follow, so every registered query accumulates a driver verification row.
# The full set is always registered — only iteration order changes.
_DRIVER_FRONT: tuple[str, ...] = (
    "partitioned_scan_pruning",  # S6 — only SURVEY §2 row never driver-checked
    "similarity_ann_recall",  # round-2 post-freeze, no driver row yet
    "streaming_session_window",  # no driver row yet
    "graph_triangle_count",  # no driver row yet (degree-oriented this round)
    "dq_outlier_zscore",  # no driver row yet
    "tpch_forecast_revenue",  # no driver row yet
    "tpch_promo_revenue",  # no driver row yet
    "pack_sequences",  # r02 red row — oracle CAST fixed, needs green re-check
    "similarity_ann_sweep",  # new in round 3 — recall/cost frontier
    "scd2_point_in_time",  # new in round 3 — versioned-dim read side
    "compaction_plan",  # new in round 3 — small-file maintenance planner
    "graph_pagerank",  # new in round 3 — fixed-point Pregel-as-joins
    "dedup_passage_exact",  # new in round 3 — passage dedup + reassembly
    "incremental_agg_merge",  # new in round 3 — IVM partial-merge
    "skew_profile",  # new in round 3 — shuffle-planning diagnostic
    "bucketed_join_colocated",  # new in round 3 — shuffle-free bucketed join
    "quality_percentile_gate",  # new in round 3 — corpus-relative curation gate
    "funnel_view_click_purchase",  # new in round 3 — sequential funnel
    "retention_cohorts",  # new in round 3 — cohort retention matrix
    "hourly_gapfill",  # new in round 3 — time-spine resample
    "event_transition_matrix",  # new in round 3 — behavior Markov view
    "table_diff_orders",  # new in round 3 — reconciliation diff
    "bpe_merge_candidates",  # new in round 3 — BPE pair-count step
    "dq_referential_integrity",  # new in round 3 — FK orphan audit
    "sample_importance_tokens",  # new in round 3 — per-row weighted sampling
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
        "windows",
        "setops",
        "json_ops",
        "dedup",
        "text",
        "llmprep",
        "curate",
        "sketches",
        "pyapi",
        "similarity",
        "graph",
        "multimodal",
        "extensions",
        "dq",
        "merge",
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
