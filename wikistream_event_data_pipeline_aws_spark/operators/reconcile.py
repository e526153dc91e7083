"""Anti-entropy table reconciliation (the Merkle-tree pattern as
relational algebra).

``merkle_compare`` takes two sides already reduced to the
``(partition, key, signature)`` grain — the caller decides the
partition scheme and the row-hash — and produces the two-level
comparison: per-partition order-free BIGINT checksums first, per-key
drill-down ONLY inside partitions whose summaries disagree (gated by a
broadcast semi-join on the divergent-partition list). Exchanging
summaries costs |partitions| rows however large the tables are; the
key-grain work is proportional to the divergence, not the data — the
property that makes replica repair feasible at 100 TB.

Used by ``plans/merge.py::table_merkle_sync`` (driver-verified against
a DuckDB oracle) and property-tested over randomized mutations in
``tests/test_properties.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merkle_compare(src_sig: DataFrame, rep_sig: DataFrame) -> DataFrame:
    """Compare two ``(part, key, sig)`` relations.

    Returns one row per partition present on either side:
    ``(part, n_source, n_replica, cs_source, cs_replica, in_sync,
    n_divergent_keys)`` where ``n_divergent_keys`` counts keys missing
    from either side or carrying different signatures — computed only
    for partitions whose (count, checksum) summaries differ."""
    part, key = "part", "key"
    ssum = src_sig.groupBy(part).agg(
        F.count(F.lit(1)).alias("n_source"), F.sum("sig").alias("cs_source")
    )
    rsum = rep_sig.groupBy(part).agg(
        F.count(F.lit(1)).alias("n_replica"), F.sum("sig").alias("cs_replica")
    )
    summary = ssum.join(rsum, part, "full_outer").select(
        part,
        F.coalesce("n_source", F.lit(0)).alias("n_source"),
        F.coalesce("n_replica", F.lit(0)).alias("n_replica"),
        F.coalesce("cs_source", F.lit(0)).alias("cs_source"),
        F.coalesce("cs_replica", F.lit(0)).alias("cs_replica"),
    )
    in_sync = (F.col("n_source") == F.col("n_replica")) & (
        F.col("cs_source") == F.col("cs_replica")
    )
    divergent = summary.filter(~in_sync).select(part)
    skeys = src_sig.join(F.broadcast(divergent), part)
    rkeys = rep_sig.join(F.broadcast(divergent), part)
    drill = (
        skeys.withColumnRenamed("sig", "s_sig")
        .join(
            rkeys.withColumnRenamed("sig", "r_sig"),
            [part, key],
            "full_outer",
        )
        .filter(
            F.col("s_sig").isNull()
            | F.col("r_sig").isNull()
            | (F.col("s_sig") != F.col("r_sig"))
        )
        .groupBy(part)
        .agg(F.count(F.lit(1)).alias("n_divergent_keys"))
    )
    return summary.join(drill, part, "left").select(
        part,
        "n_source",
        "n_replica",
        "cs_source",
        "cs_replica",
        in_sync.alias("in_sync"),
        F.coalesce("n_divergent_keys", F.lit(0)).alias("n_divergent_keys"),
    )
