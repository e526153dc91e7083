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
_FRONT_TARGET_ROUND = 11
# Round 11 (tools/front_rotation.py --target-round 11 --changed
# stats_gtest_dow_type): 2 NEW (text_crossentropy_heldout_by_source,
# text_jsd_pairwise_sources — the detmath log-family completions) + 1
# CHANGED (stats_gtest_dow_type: g_stat switched from double->DECIMAL
# window sum to micro-quantized BIGINT sum, the bootstrap-SE parity
# discipline) + the 14 deferred r5 rows + 33 of the 48 r6 rows; the 15
# registration-last r6 rows defer to round 12.
_FRONT_CHANGED: tuple[str, ...] = (
    "stats_gtest_dow_type",
)
_DRIVER_FRONT: tuple[str, ...] = (
    "text_crossentropy_heldout_by_source",
    "text_jsd_pairwise_sources",
    "stats_gtest_dow_type",
    "stats_chi2_dow_type",
    "privacy_l_diversity",
    "embedding_pq_residuals",
    "knn_classify_embeddings",
    "semdedup_embeddings",
    "graph_khop_features",
    "graph_kcore_peel",
    "graph_eigencentrality",
    "graph_substitutes",
    "decayed_user_value",
    "table_merkle_sync",
    "snapshot_time_travel",
    "snapshot_changes",
    "snapshot_mor_read",
    "lateral_topn_orders",
    "surrogate_key_md5",
    "null_defaulting",
    "conditional_mapping",
    "string_cleaning",
    "timestamp_normalize",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "text_token_stats",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "text_tfidf_topk",
    "text_inverted_index",
    "decontaminate_ngram_overlap",
    "sample_stratified_hash",
    "redact_pii",
    "vocab_topk",
    "text_repetition_filter",
    "corpus_shuffle_hash",
    "domain_mixture_sample",
    "curate_corpus",
    "hll_distinct_events",
    "hll_distinct_users_by_type",
    "heavy_hitters_cms",
    "histogram_quantiles_by_type",
    "privacy_t_closeness",
    "forecast_seasonal_naive_backtest",
    "similarity_cosine_topk",
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
