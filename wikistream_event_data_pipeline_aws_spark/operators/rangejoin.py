"""Banded range (interval) join — the scalable form of
``l.key = r.key AND r.ts IN (l.ts + lower, l.ts + upper]``.

A naive inequality join gives Catalyst only the equi-key to hash on;
every within-key pair is generated and then filtered, which degenerates
to a per-key cross product (hot key => quadratic). The banded form adds
a time bucket of width ``upper - lower`` to the join key: a qualifying
pair's buckets can differ by at most one, so each left row is exploded
into the (at most two) candidate buckets and the join becomes a plain
equi-join on (key, bucket) — shuffle-partitionable, AQE-skew-splittable
— followed by the exact interval filter. Pair generation drops from
O(n_l * n_r) per key to O(pairs sharing a bucket), the same trick the
LSH dedup path uses for shingle buckets.

Timestamps are compared in integer microseconds (``unix_micros``) so
the band arithmetic and the interval predicate are exact — no float or
calendar-interval rounding to diverge from an oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal ``keys`` and
    ``right_ts - left_ts`` in the half-open interval ``(lower_us, upper_us]``
    (microseconds). Returns left columns + right columns (right's keys
    and timestamp deduplicated). ``how`` may be ``inner`` or ``left``
    (left keeps unmatched left rows with NULL right columns).
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must exceed lower_us")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type {how!r}")
    keys = list(keys)
    width = upper_us - lower_us

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    # left row's interval (l+lower, l+upper] spans at most two
    # width-sized buckets: floor((l+lower)/w) and that + 1
    l_bucket0 = F.floor((l_us + F.lit(lower_us)) / F.lit(width))
    # Surrogate row id taken BEFORE the explode: the left-join re-attach
    # below must identify unmatched rows by identity, not by whole-row
    # equality — a null-unsafe anti-join on all left columns both drops
    # NULL-bearing unmatched rows and re-emits NULL-bearing matched ones.
    # The left path evaluates l_id twice (inner branch + anti branch), so
    # the id assignment must come from ONE materialized evaluation: a
    # shuffle/sample/other nondeterministic stage upstream could otherwise
    # renumber rows between branches, emitting a row as both matched and
    # unmatched (or neither). localCheckpoint pins the assignment; the
    # inner path evaluates once and needs no fence.
    # Trade-off: localCheckpoint(eager=True) runs a job at plan-construction
    # time and materializes the ENTIRE left input to executor block storage;
    # it is also non-reliable (lost on executor failure, the job fails and
    # retries from the caller). For a left input too large for cluster
    # storage, swap in persist(StorageLevel.DISK_ONLY) + a reliable
    # checkpoint dir, or pre-assign a stable business key upstream and skip
    # the surrogate id entirely — the surrogate is only needed when the
    # left side has no unique key.
    l_id = left.withColumn("__lid", F.monotonically_increasing_id())
    if how == "left":
        l_id = l_id.localCheckpoint(eager=True)
    l_tagged = l_id.withColumn("__lus", l_us).withColumn(
        "__bucket", F.explode(F.array(l_bucket0, l_bucket0 + 1))
    )
    r_tagged = right.withColumn("__rus", r_us).withColumn(
        "__bucket", F.floor(r_us / F.lit(width))
    )

    on = [*keys, "__bucket"]
    pred = (F.col("__rus") > F.col("__lus") + F.lit(lower_us)) & (
        F.col("__rus") <= F.col("__lus") + F.lit(upper_us)
    )
    right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    if how == "inner":
        joined = l_tagged.join(r_tagged, on).filter(pred)
        return joined.select(*left.columns, *right_cols)

    # left join: run the inner band join, then re-attach unmatched left
    # rows by surrogate id (a direct left join would duplicate unmatched
    # rows, once per exploded candidate bucket)
    inner = l_tagged.join(r_tagged, on).filter(pred).select("__lid", *left.columns, *right_cols)
    unmatched = l_id.join(inner.select("__lid"), "__lid", "left_anti")
    for c in right_cols:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    return inner.drop("__lid").unionByName(unmatched.drop("__lid"))
