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
# Round 6 composition (VERDICT r5 item 1): the 9 queries never
# driver-verified (the post-freeze round-5 API-surface batch: lateral,
# grouped histogram, t-closeness, forecast backtest, cogroup lag, int8
# codes, training pairs, recursive CTE, SQL UDF) head the front, then
# dedup_ngram_jaccard (oracle changed round 5 -> re-verifies by policy)
# plus the 24 other queries whose newest driver row is r1 (stalest
# green rows; multimodal_decode/_metadata/_frame_sample are among them
# and their implementation changes this round to real WAV/PNG codecs),
# then 15 registration-order-oldest r2 rows as backfill plus
# multimodal_audio_energy (r4-green but its implementation changed
# this round: it now parses real WAV containers -> re-verifies by
# the changed-query policy) and dedup_simhash_band60 (NEW this
# round: the production 60-bit simhash band join that replaces the
# saturating 16-bit variant at scale): 9 + 25 + 16 = 50.  Done = driver union reaches 224/224 green and no
# query's newest row is older than r2.
_DRIVER_FRONT: tuple[str, ...] = (
    "lateral_topn_orders",
    "histogram_quantiles_by_type",
    "privacy_t_closeness",
    "forecast_seasonal_naive_backtest",
    "cogroup_click_purchase_lag",
    "embedding_int8_codes",
    "embedding_training_pairs",
    "graph_recursive_reachability",
    "sql_udf_value_bands",
    "dedup_ngram_jaccard",
    "surrogate_key_md5",
    "null_defaulting",
    "conditional_mapping",
    "string_cleaning",
    "timestamp_normalize",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "text_token_stats",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "similarity_cosine_topk",
    "similarity_embedding_neardup",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "multimodal_metadata",
    "multimodal_decode",
    "multimodal_frame_sample",
    "pivot_type_counts_by_date",
    "rollup_date_type",
    "cube_type_hour",
    "map_explode_props",
    "dedup_clusters",
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
    "dedup_simhash_band60",
    "multimodal_audio_energy",
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
