"""Session-scoped DataFrame memos (r13 optimization, guide §1.2 "don't
compute things twice").

Several analysis queries consume the SAME expensive kernel (the exact
kNN scoring join, the multi-table LSH top-k, the minhash pair set, the
BPE pipeline); without sharing, each query re-runs the kernel from the
parquet scan inside one session. The memo here is the discipline
`plans/bpe.py` established and VERDICT r12 endorsed:

- keyed by ``(applicationId, sf_dir-ish key, file fingerprint, the
  algorithm constants baked into the cached plan)`` — the applicationId
  dies with the SparkContext, so NOTHING persists across sessions and
  every bench/oracle invocation (a fresh process) still computes from
  the parquet inputs; the constants (TOP_K, N_PLANES, ...) make a
  same-session constant change a cache MISS, not a stale answer
  (ADVICE r13);
- a file-identity fingerprint (path, size, mtime_ns per data file)
  invalidates the entry if an sf_dir is rewritten in place — and the
  stale entry is EVICTED on insert (same sf_dir, different fingerprint)
  so a long-lived session over rewritten inputs doesn't accumulate dead
  checkpointed blocks (ADVICE r13);
- insertion evicts entries from other applications, so dead contexts
  cannot pin checkpointed RDD blocks;
- values are lazily ``localCheckpoint``-ed DataFrames: the first
  consumer materializes, the rest reuse the checkpointed blocks.

Measurement transparency (VERDICT r13 item 3): every hit/build is
appended to :data:`MEMO_EVENTS` so ``bench.py`` can mark which timed
queries were served by an already-built kernel (their per-query seconds
are NOT standalone costs) and ``tools/spot_measure.py`` can clear the
caches between repeats (:func:`reset_memos`) to measure standalone
floors.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

# (kind, label) audit trail: kind is "hit" | "build". Appended by
# session_memo and by the hand-rolled memos in plans/bpe.py and
# plans/dedup.py; consumed (and sliced by index) by bench._timed.
MEMO_EVENTS: list[tuple[str, str]] = []

# every memo dict that has passed through session_memo or was
# explicitly registered — reset_memos() clears them all
_ALL_CACHES: list[dict] = []


def log_memo_event(kind: str, label: str) -> None:
    MEMO_EVENTS.append((kind, label))


def register_cache(cache: dict) -> dict:
    """Track ``cache`` so :func:`reset_memos` can clear it. Idempotent;
    returns the dict for inline use at definition sites."""
    if not any(c is cache for c in _ALL_CACHES):
        _ALL_CACHES.append(cache)
    return cache


def reset_memos() -> None:
    """Drop every registered memo entry (tools/spot_measure.py: forces
    each repeat of a memoized query to rebuild its kernel, so the
    recorded minimum is a standalone floor, not a memo-hit time). The
    checkpointed blocks are reclaimed by Spark's ContextCleaner once
    the dropped DataFrames are garbage-collected."""
    for cache in _ALL_CACHES:
        cache.clear()


def file_fingerprint(sf_dir: str, table: str) -> tuple:
    """(path, size, mtime_ns) per data file of ``<sf_dir>/<table>.parquet``
    — a single file or a directory of parts. Non-local paths (s3a://
    etc.) fall back to path-only keying; the immutable-input contract
    is then the caller's to uphold."""
    root = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(root):
            out = []
            for dirpath, _, names in sorted(os.walk(root)):
                for n in sorted(names):
                    p = os.path.join(dirpath, n)
                    st = os.stat(p)
                    out.append((p, st.st_size, st.st_mtime_ns))
            return tuple(out)
        st = os.stat(root)
        return ((root, st.st_size, st.st_mtime_ns),)
    except OSError:
        return (root,)


def session_memo(
    cache: dict,
    spark: SparkSession,
    key: tuple,
    build: Callable[[], DataFrame],
    label: str | None = None,
) -> DataFrame:
    """Return the memoized lazily-checkpointed DataFrame for ``key``
    within the CURRENT Spark application, building it once per session.
    ``key`` must already include the data fingerprint(s) of every table
    the kernel reads (see :func:`file_fingerprint`) and the algorithm
    constants the built plan bakes in (ADVICE r13 — a changed constant
    must be a cache miss)."""
    register_cache(cache)
    name = label or getattr(build, "__qualname__", "memo")
    app_id = spark.sparkContext.applicationId
    full = (app_id, *key)
    cached = cache.get(full)
    if cached is not None:
        log_memo_event("hit", name)
        return cached
    # evict: entries from dead applications, and same-app entries whose
    # first key component (the sf_dir-ish key) matches but whose
    # fingerprint/constants do not — a rewritten sf_dir must not leave
    # stale checkpointed blocks pinned for the rest of the session
    for k in [
        k
        for k in cache
        if k[0] != app_id or (len(k) > 1 and len(full) > 1 and k[1] == full[1])
    ]:
        del cache[k]
    df = build().localCheckpoint(eager=False)
    log_memo_event("build", name)
    cache[full] = df
    return df
