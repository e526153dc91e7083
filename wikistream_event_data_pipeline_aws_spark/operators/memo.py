"""Session-scoped DataFrame memos (r13 optimization, guide §1.2 "don't
compute things twice").

Several analysis queries consume the SAME expensive kernel (the exact
kNN scoring join, the multi-table LSH top-k, the minhash pair set, the
BPE pipeline); without sharing, each query re-runs the kernel from the
parquet scan inside one session. The memo here is the discipline
`plans/bpe.py` established and VERDICT r12 endorsed:

- keyed by ``(applicationId, sf_dir-ish key, file fingerprint)`` — the
  applicationId dies with the SparkContext, so NOTHING persists across
  sessions and every bench/oracle invocation (a fresh process) still
  computes from the parquet inputs;
- a file-identity fingerprint (path, size, mtime_ns per data file)
  invalidates the entry if an sf_dir is rewritten in place;
- insertion evicts entries from other applications, so dead contexts
  cannot pin checkpointed RDD blocks;
- values are lazily ``localCheckpoint``-ed DataFrames: the first
  consumer materializes, the rest reuse the checkpointed blocks.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


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
) -> DataFrame:
    """Return the memoized lazily-checkpointed DataFrame for ``key``
    within the CURRENT Spark application, building it once per session.
    ``key`` must already include the data fingerprint(s) of every table
    the kernel reads (see :func:`file_fingerprint`)."""
    app_id = spark.sparkContext.applicationId
    full = (app_id, *key)
    cached = cache.get(full)
    if cached is not None:
        return cached
    for k in [k for k in cache if k[0] != app_id]:
        del cache[k]
    df = build().localCheckpoint(eager=False)
    cache[full] = df
    return df
