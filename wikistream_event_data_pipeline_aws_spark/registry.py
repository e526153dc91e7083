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
# Round 9 composition (VERDICT r8 item 1): the registry is fully
# driver-green (union r01–r08 = 236/236), so the front is this round's
# new/changed queries plus the stalest cohort:
# curate_corpus_multimodal (NEW: media curation flagship — one
# media_signals Arrow pass feeds quality gate + three near-dup pair
# algebras + components + sampling),
# dedup_sim16_agreement (NEW: the explicitly-capped lsh/sim16/sim60
# fixture comparison split out of the production agreement artifact),
# multimodal_phash_neardup + multimodal_audio_fp_neardup (changed:
# production-grain 64-byte fingerprint corpora — 16x4 dHash rows /
# 31-window Haitsma-Kalker gradients — envelopes raised 100x, VERDICT
# item 3), dedup_method_agreement (changed: rebased on the three
# production methods lsh/sim60/cdc, envelope dropped — VERDICT item
# 4), similarity_ann_recall (changed: md5-hash-sampled audit leg at
# 600 per-mille, drops query 1 — VERDICT item 5) head the front; then
# the r4 stalest cohort in registration order. 6 + 45 = 51 > 50: the
# "changed plans must re-verify now" invariant outranks the staleness
# floor, so the registration-LAST r4 row (partition_evolution_audit)
# defers to the round-10 backfill together with the r5 cohort.
# Same-output refactors verified by the parity suite take no slots
# (retrieval_rrf_ann / similarity_ann_sweep / dedup_lsh_sweep audit
# knobs default to audit-all; the four mergeable sinks and the video
# near-dup/CDC factorings are hash-identical), and doc_chunk_cdc +
# dedup_chunk_shared — the CDC refactor's queries — ride in the r4
# cohort anyway. Done = CORRECTNESS_r09 50/50 green and no query's
# newest row older than r5 except the one documented deferral.
#
# _FRONT_TARGET_ROUND pins WHICH round this composition was built for:
# the rotation-debt guard computes staleness against CORRECTNESS files
# from rounds BEFORE it, so the driver dropping this round's file
# cannot retroactively invalidate the front that produced it
# (emission-safe sequencing, VERDICT r6 item 1). Bump it together with
# every front rotation; a CORRECTNESS file NEWER than it means a round
# ran without rotation and the guard goes red.
_FRONT_TARGET_ROUND = 10
# Changed-output queries consuming front slots this round (distinct
# from NEW queries, which have no prior row at all): the rotation-debt
# guard subtracts these from the room available to the stalest cohort,
# because "a changed plan must re-verify now" outranks the staleness
# floor whenever the two compete for the 50-slot window. Reset this
# each rotation to exactly the round's changed set.
#
# Round 10 composition (tools/front_rotation.py --target-round 10):
# six NEW queries head the front — dedup_substring_spans (Lee et al.
# 2022 substring-level dedup: md5-keyed window occurrence agg +
# gaps-and-islands runs), dedup_containment (asymmetric doc-inside-doc
# near-dup via a document-frequency candidate cut + lossless integer
# prune), stats_mannwhitney_value (tie-corrected rank-sum test, exact
# BIGINT rank algebra at the distinct-value grain),
# vocab_coverage_curve (tokenizer vocab-sizing curve at power-of-two
# checkpoints over the vocab-bounded grain), graph_link_prediction
# (common-neighbor + preferential-attachment top-25 for non-edges,
# exact-integer scores), dedup_substring_rewrite (the APPLY step of
# substring dedup: first-occurrence-wins span elision + reassembly,
# md5-value-checked) — and the continuation session adds EIGHT more:
# text_entropy_kl_by_source + stats_psi_value_drift (the log-family
# divergences unlocked by operators/detmath.det_ln_ratio — a bit-stable
# cross-engine ln over exact integer ratios), streaming_entropy_sink
# (keyed-sum mergeable state feeding the same readout),
# stats_bootstrap_ci_mean (deterministic Poisson bootstrap),
# stats_theilsen_trend (median-of-slopes order statistic),
# similarity_ann_pq (IVF-PQ ADC search — completes the LSH/IVF/PQ
# trio), eval_knn_confusion (per-class confusion + macro-F1),
# graph_modularity_brand (Newman-Girvan Q), stats_gtest_dow_type
# (likelihood-ratio independence — chi2's log-family sibling), and
# privacy_dp_counts (the Laplace-mechanism release shape with
# deterministic hash noise), and eval_ann_ranking (graded nDCG@k +
# MRR for the ANN path — the log2 discount is det_ln too). 17 new +
# the r4 deferral (partition_evolution_audit) + 32 of the 46 r5 rows
# in registration order = 50; the fourteen registration-last r5 rows
# (stats_chi2_dow_type … table_merkle_sync, snapshot_time_travel,
# snapshot_changes, snapshot_mor_read) defer to round 11 — new
# queries outrank the staleness floor (tools/front_rotation.py
# --target-round 10 reproduces this block verbatim). No
# changed-output queries this round (the round-10 advice fixes — mmcur
# video value_range oracle leg, bench contended-row recording,
# rotation deferral reporting, encode dims arg — are all
# output-identical, re-proven by the parity suite; the
# text_entropy_kl_by_source readout refactor landed the same session
# the query was born, so it rides the query's own NEW slot).
_FRONT_CHANGED: tuple[str, ...] = ()
_DRIVER_FRONT: tuple[str, ...] = (
    "dedup_substring_spans",
    "dedup_containment",
    "stats_mannwhitney_value",
    "vocab_coverage_curve",
    "graph_link_prediction",
    "dedup_substring_rewrite",
    "text_entropy_kl_by_source",
    "streaming_entropy_sink",
    "stats_psi_value_drift",
    "stats_bootstrap_ci_mean",
    "stats_theilsen_trend",
    "similarity_ann_pq",
    "eval_knn_confusion",
    "graph_modularity_brand",
    "stats_gtest_dow_type",
    "privacy_dp_counts",
    "eval_ann_ranking",
    "partition_evolution_audit",
    "funnel_time_to_convert",
    "sequence_pattern_match",
    "churn_label_features",
    "tpch_revenue_share_hierarchy",
    "tpch_supplier_leadtime",
    "tpch_priority_sla",
    "customer_rfm_segments",
    "record_linkage_blocks",
    "incremental_join_delta",
    "join_longest_prefix_match",
    "variant_props_stats",
    "dedup_cluster_keepers",
    "dedup_lsh_sweep",
    "text_ngram_novelty",
    "tokenizer_fertility_by_lang",
    "context_window_fit",
    "text_bigram_surprisal",
    "split_leakage_audit",
    "cv_fold_assignment",
    "decontaminate_overlap_fraction",
    "sample_weighted_wor",
    "hll_rolling_distinct",
    "kmv_set_operations",
    "streaming_hll_users",
    "streaming_histogram_quantiles",
    "stats_autocorrelation",
    "value_decile_assignment",
    "stats_benford_prices",
    "stats_seasonal_outliers",
    "survival_km_order_gaps",
    "tv_distance_source_mix",
    "stats_ks_value_drift",
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
