"""As-of (point-in-time) join — a custom operator Spark's join set
lacks, composed from existing DataFrame ops per the build contract:
union + last(ignorenulls) window, never an inequality join.

For each left row, attach the payload of the latest right row with the
same key and ``right.ts <= left.ts`` (backward, inclusive — the
semantics of DuckDB's ``ASOF LEFT JOIN ... ON l.ts >= r.ts``, which is
the oracle twin).

Why this shape at scale: a naive implementation is a range join
(``l.key = r.key AND r.ts <= l.ts`` + row_number) whose inequality
predicate degenerates to a per-key cross product — O(n_l * n_r) within
every key. The union-window form is one shuffle of (left ∪ right) on
the key, a per-partition sort, and a linear last-non-null sweep:
O((n_l + n_r) log) with no pair blow-up, and it inherits AQE skew
splitting on the sort-merge-free single exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Left as-of-backward join: latest right payload at-or-before each
    left row's ``ts_col`` within ``keys``. Left rows keep all their
    columns; payload columns are NULL when no prior right row exists.

    Right rows sort before left rows at equal timestamps (side tag in
    the ordering), making the match inclusive. Ties among right rows at
    the same (key, ts) are broken by the last payload column ordering.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    overlap = [c for c in left.columns if c in payload_cols]
    if overlap:
        raise ValueError(f"payload columns {overlap} already exist on the left side")

    # All payload columns travel in ONE struct, built on the right side
    # BEFORE the union (left rows therefore carry a NULL struct, not a
    # struct of NULLs). A single last(ignorenulls) over the struct keeps
    # the matched row atomic — per-column last() could mix payload values
    # from different right rows when a right row carries a NULL field.
    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = (
        right.select(*keys, ts_col, *payload_cols)
        .withColumn("__payload", F.struct(*payload_cols))
        .drop(*payload_cols)
        .withColumn("__side", F.lit(0))
    )
    both = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # Struct comparison is field-wise lexicographic, so ordering by the
    # struct reproduces the per-column tie-break among same-(key, ts)
    # right rows; left rows' NULL struct sorts first, which is harmless
    # (they all share __side = 1).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__payload").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        "*", F.last(F.col("__payload"), ignorenulls=True).over(w).alias("__asof")
    )
    return filled.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__asof.{c}").alias(c) for c in payload_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Left as-of-FORWARD join: earliest right payload at-or-after each
    left row's ``ts_col`` within ``keys`` (NULL when no later right row
    exists) — the mirror of :func:`asof_join`, same union-window shape,
    same O((n_l + n_r) log) cost with no range-join pair blow-up.

    Ordering mirror: at equal timestamps the LEFT row must sort before
    the right rows it may match (inclusive forward), so the side tag
    orders left-first; the frame flips to current-row .. unbounded
    following with ``first(ignorenulls)``.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    overlap = [c for c in left.columns if c in payload_cols]
    if overlap:
        raise ValueError(f"payload columns {overlap} already exist on the left side")

    l_tag = left.withColumn("__side", F.lit(0))
    r_tag = (
        right.select(*keys, ts_col, *payload_cols)
        .withColumn("__payload", F.struct(*payload_cols))
        .drop(*payload_cols)
        .withColumn("__side", F.lit(1))
    )
    both = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__payload").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = both.select(
        "*", F.first(F.col("__payload"), ignorenulls=True).over(w).alias("__asof")
    )
    return filled.filter(F.col("__side") == 0).select(
        *left.columns,
        *[F.col(f"__asof.{c}").alias(c) for c in payload_cols],
    )
