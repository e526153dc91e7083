"""DQ checks as oracle-verifiable queries (SURVEY §2.11 Q1-Q14).

Each query computes the same metric the DQ engine's compiled checks do
(``..dq.checks``), expressed so a DuckDB oracle reproduces it exactly.
The engine library uses sketch-based profiling (approx distinct /
approx percentiles) for the 100 TB path; these parity queries use exact
formulations (manual discrete percentiles via row_number, integer-cents
moments) because the oracle gate demands bit-exact floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .wiki import events_with_time

ALLOWED_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


# -- Q1/Q2 completeness -------------------------------------------------------


def dq_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def nulls(c):
        return F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")

    def rate(c):
        return (
            F.avg(F.when(F.col(c).isNull(), 0.0).otherwise(1.0)).alias(f"{c}_non_null_rate")
        )

    return e.agg(
        F.count(F.lit(1)).alias("total_rows"),
        nulls("event_id"),
        rate("event_id"),
        nulls("ts"),
        rate("ts"),
        nulls("user_id"),
        rate("user_id"),
        nulls("event_type"),
        rate("event_type"),
        nulls("value"),
        rate("value"),
    )


DQ_COMPLETENESS_SQL = """
SELECT COUNT(*) AS total_rows,
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id_nulls,
       AVG(CASE WHEN event_id IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END) AS event_id_non_null_rate,
       CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts_nulls,
       AVG(CASE WHEN ts IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END) AS ts_non_null_rate,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
       AVG(CASE WHEN user_id IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END) AS user_id_non_null_rate,
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_nulls,
       AVG(CASE WHEN event_type IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END) AS event_type_non_null_rate,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
       AVG(CASE WHEN value IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END) AS value_non_null_rate
FROM events
"""

# -- Q3 containment -----------------------------------------------------------


def dq_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    in_set = F.col("event_type").isin(list(ALLOWED_EVENT_TYPES))
    return e.agg(
        F.avg(in_set.cast("double")).alias("in_set_rate"),
        F.sum((~in_set).cast("long")).alias("out_of_set_rows"),
        F.countDistinct(F.when(~in_set, F.col("event_type"))).alias("unexpected_values"),
    )


DQ_CONTAINMENT_SQL = f"""
SELECT AVG(CAST(event_type IN {ALLOWED_EVENT_TYPES} AS DOUBLE)) AS in_set_rate,
       CAST(SUM(CASE WHEN event_type NOT IN {ALLOWED_EVENT_TYPES} THEN 1 ELSE 0 END) AS BIGINT) AS out_of_set_rows,
       COUNT(DISTINCT CASE WHEN event_type NOT IN {ALLOWED_EVENT_TYPES} THEN event_type END) AS unexpected_values
FROM events
"""

# -- Q5 uniqueness ------------------------------------------------------------


def dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct("event_id").alias("distinct_event_ids"),
        (F.countDistinct("event_id") / F.count(F.lit(1))).alias("event_id_uniqueness"),
        # struct() so tuples with a NULL component COUNT (DuckDB's
        # COUNT(DISTINCT (user_id, ts)) counts them; bare multi-column
        # countDistinct drops any row with a NULL key — in the check
        # whose job is auditing exactly those keys)
        F.countDistinct(F.struct("user_id", "ts")).alias("distinct_user_ts"),
    )


DQ_UNIQUENESS_SQL = """
SELECT COUNT(*) AS total_rows,
       COUNT(DISTINCT event_id) AS distinct_event_ids,
       COUNT(DISTINCT event_id) / CAST(COUNT(*) AS DOUBLE) AS event_id_uniqueness,
       COUNT(DISTINCT (user_id, ts)) AS distinct_user_ts
FROM events
"""

# -- Q4 range -----------------------------------------------------------------


def dq_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = events_with_time(spark, sf_dir)
    return e.agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum((F.col("value") < 0).cast("long")).alias("negative_value_rows"),
        F.min("event_hour").alias("min_hour"),
        F.max("event_hour").alias("max_hour"),
        F.sum(((F.col("event_hour") < 0) | (F.col("event_hour") > 23)).cast("long")).alias(
            "hour_violations"
        ),
    )


DQ_RANGE_SQL = """
SELECT MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_value_rows,
       CAST(MIN(hour(ts)) AS INTEGER) AS min_hour,
       CAST(MAX(hour(ts)) AS INTEGER) AS max_hour,
       CAST(SUM(CASE WHEN hour(ts) < 0 OR hour(ts) > 23 THEN 1 ELSE 0 END) AS BIGINT) AS hour_violations
FROM events
"""

# -- Q7 accuracy by recomputation --------------------------------------------


def dq_accuracy_recompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    match = F.col("n_chars") == F.length("text")
    return d.agg(
        F.count(F.lit(1)).alias("total_rows"),
        # rate: over COMPARABLE rows (avg skips the NULL comparison on
        # both engines); mismatch count: a row that CANNOT be verified
        # (NULL on either side) counts as a mismatch — the conservative
        # DQ stance, and the oracle's CASE-ELSE already said so while
        # sum((~match)) silently skipped it
        F.avg(match.cast("double")).alias("recompute_match_rate"),
        F.sum(F.when(match, F.lit(0)).otherwise(F.lit(1))).alias("mismatch_rows"),
    )


DQ_ACCURACY_RECOMPUTE_SQL = """
SELECT COUNT(*) AS total_rows,
       AVG(CAST(n_chars = length(text) AS DOUBLE)) AS recompute_match_rate,
       CAST(SUM(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END) AS BIGINT) AS mismatch_rows
FROM documents
"""

# -- Q11 cross-column consistency ---------------------------------------------


def dq_cross_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = events_with_time(spark, sf_dir)
    hourly = e.groupBy("event_date", "event_hour").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").alias("unique_users"),
    )
    return hourly.agg(
        F.count(F.lit(1)).alias("hourly_rows"),
        F.sum((F.col("total_events") < F.col("unique_users")).cast("long")).alias(
            "violations"
        ),
    )


DQ_CROSS_COLUMN_SQL = """
WITH hourly AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date, hour(ts) AS event_hour,
         COUNT(*) AS total_events, COUNT(DISTINCT user_id) AS unique_users
  FROM events GROUP BY 1, 2
)
SELECT COUNT(*) AS hourly_rows,
       CAST(SUM(CASE WHEN total_events < unique_users THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM hourly
"""

# -- Q13 profile: exact moments + discrete percentiles ------------------------


def dq_profile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact profile (moments + discrete percentiles) with NO global sort.

    The round-1 formulation ranked every row through a partitionBy-less
    orderBy window — a single-partition total sort that dies at 100 TB.
    This version is the distributed exact-order-statistic shape:

    1. one keyed shuffle collapses rows to (value, count) pairs — moments
       come exactly from sum(c*cnt)/sum(c^2*cnt) in integer/decimal math;
    2. a <=1025-bucket equi-width histogram of those pairs is collected
       (bounded coordinator data, same order of magnitude as AQE stats)
       to locate, for each target rank ceil(q*n), its bucket and
       within-bucket rank;
    3. the value at each rank is read back with a PER-BUCKET cumulative
       window (partitionBy bucket — distributed), filtered to the <=4
       target buckets only.

    Every window is partitioned; driver data is bounded by the bucket
    count, never by data volume.
    """
    import math

    e = load_table(spark, sf_dir, "events")
    cents_col = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    # profile NON-NULL values only (both engines): a NULL value produced
    # a cents=NULL group whose bucket TypeError'd the driver-side
    # histogram sort, and even counted in n while excluded from lo/hi —
    # skewing every target rank. NULL volume is dq_completeness's job.
    counts = (
        e.filter(F.col("value").isNotNull())
        .select(cents_col.alias("cents"))
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    lo, hi, n = counts.agg(
        F.min("cents"), F.max("cents"), F.sum("cnt")
    ).first()
    if not n:
        # Empty input: the histogram math below would TypeError on None
        # bounds; return the same null-filled single row the oracle's
        # aggregate produces over zero rows.
        return spark.sql(
            "SELECT CAST(0 AS BIGINT) AS n,"
            " CAST(NULL AS BIGINT) AS min_cents, CAST(NULL AS BIGINT) AS max_cents,"
            " CAST(NULL AS DOUBLE) AS mean_cents, CAST(NULL AS DOUBLE) AS stddev_cents,"
            " CAST(NULL AS BIGINT) AS p25_cents, CAST(NULL AS BIGINT) AS p50_cents,"
            " CAST(NULL AS BIGINT) AS p75_cents, CAST(NULL AS BIGINT) AS p95_cents"
        )
    width = max((hi - lo) // 1024, 1)
    bucketed = counts.withColumn(
        "bucket", F.floor((F.col("cents") - F.lit(lo)) / F.lit(width))
    )
    hist = sorted(
        (r["bucket"], r["bcnt"])
        for r in bucketed.groupBy("bucket").agg(F.sum("cnt").alias("bcnt")).collect()
    )
    offsets, acc = {}, 0
    for b, c in hist:
        offsets[b] = acc
        acc += c

    targets: dict[str, tuple[int, int]] = {}
    for q, name in ((0.25, "p25_cents"), (0.50, "p50_cents"),
                    (0.75, "p75_cents"), (0.95, "p95_cents")):
        pos = max(1, math.ceil(q * n))
        for b, c in hist:
            if offsets[b] < pos <= offsets[b] + c:
                targets[name] = (b, pos - offsets[b])
                break

    w_bucket = Window.partitionBy("bucket").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = bucketed.filter(
        F.col("bucket").isin([b for b, _ in targets.values()])
    ).withColumn("cum", F.sum("cnt").over(w_bucket))
    pct_row = local.agg(
        *[
            F.min(
                F.when(
                    (F.col("bucket") == b)
                    & (F.col("cum") >= r)
                    & (F.col("cum") - F.col("cnt") < r),
                    F.col("cents"),
                )
            ).alias(name)
            for name, (b, r) in targets.items()
        ]
    )

    sum_c = F.sum(F.col("cents") * F.col("cnt"))
    sumsq = F.sum(
        (F.col("cents") * F.col("cents")).cast("decimal(38,0)")
        * F.col("cnt").cast("decimal(18,0)")
    ).cast("decimal(38,0)")
    n_agg = F.sum("cnt")
    mean = sum_c.cast("double") / n_agg
    var = (
        sumsq.cast("double") - sum_c.cast("double") * sum_c.cast("double") / n_agg
    ) / (n_agg - F.lit(1))
    stats_row = counts.agg(
        n_agg.alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        mean.alias("mean_cents"),
        F.sqrt(var).alias("stddev_cents"),
    )
    return stats_row.crossJoin(pct_row)


DQ_PROFILE_VALUE_SQL = """
WITH cents_t AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents) AS rn,
         COUNT(*) OVER () AS n
  FROM cents_t
)
SELECT COUNT(*) AS n,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents,
       CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_cents,
       sqrt((CAST(SUM(CAST(cents * cents AS DECIMAL(38,0))) AS DOUBLE)
             - CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE) / COUNT(*))
            / (COUNT(*) - 1)) AS stddev_cents,
       MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(CAST(0.25 AS DOUBLE) * n) AS INTEGER)) THEN cents END) AS p25_cents,
       MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(CAST(0.50 AS DOUBLE) * n) AS INTEGER)) THEN cents END) AS p50_cents,
       MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(CAST(0.75 AS DOUBLE) * n) AS INTEGER)) THEN cents END) AS p75_cents,
       MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS INTEGER)) THEN cents END) AS p95_cents
FROM ranked
"""

# -- Q14 drift: first half of window as baseline vs second half ---------------


def dq_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    half = F.when(F.dayofmonth("ts") <= 15, "baseline").otherwise("current")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    per_half = (
        e.withColumn("half", half)
        .withColumn("cents", cents)
        .groupBy("half")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("mean_cents"),
            F.avg(F.col("event_type").isin("error").cast("double")).alias("error_rate"),
        )
    )
    b = per_half.filter(F.col("half") == "baseline").alias("b")
    c = per_half.filter(F.col("half") == "current").alias("c")
    joined = b.crossJoin(c)
    mean_change = F.abs(F.col("c.mean_cents") - F.col("b.mean_cents")) / F.abs(
        F.col("b.mean_cents")
    )
    err_change = F.abs(F.col("c.error_rate") - F.col("b.error_rate"))
    return joined.select(
        F.col("b.rows").alias("baseline_rows"),
        F.col("c.rows").alias("current_rows"),
        F.col("b.mean_cents").alias("baseline_mean_cents"),
        F.col("c.mean_cents").alias("current_mean_cents"),
        mean_change.alias("mean_rel_change"),
        F.col("b.error_rate").alias("baseline_error_rate"),
        F.col("c.error_rate").alias("current_error_rate"),
        err_change.alias("error_rate_abs_change"),
        F.when(err_change > 0.20, "ALERT")
        .when(err_change > 0.10, "WARNING")
        .otherwise("OK")
        .alias("drift_status"),
    )


DQ_DRIFT_HALVES_SQL = """
WITH per_half AS (
  SELECT CASE WHEN dayofmonth(ts) <= 15 THEN 'baseline' ELSE 'current' END AS half,
         COUNT(*) AS rows_,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / COUNT(*) AS mean_cents,
         AVG(CAST(event_type IN ('error') AS DOUBLE)) AS error_rate
  FROM events GROUP BY 1
)
SELECT b.rows_ AS baseline_rows,
       c.rows_ AS current_rows,
       b.mean_cents AS baseline_mean_cents,
       c.mean_cents AS current_mean_cents,
       abs(c.mean_cents - b.mean_cents) / abs(b.mean_cents) AS mean_rel_change,
       b.error_rate AS baseline_error_rate,
       c.error_rate AS current_error_rate,
       abs(c.error_rate - b.error_rate) AS error_rate_abs_change,
       CASE WHEN abs(c.error_rate - b.error_rate) > CAST(0.20 AS DOUBLE) THEN 'ALERT'
            WHEN abs(c.error_rate - b.error_rate) > CAST(0.10 AS DOUBLE) THEN 'WARNING'
            ELSE 'OK' END AS drift_status
FROM (SELECT * FROM per_half WHERE half = 'baseline') b,
     (SELECT * FROM per_half WHERE half = 'current') c
"""

# -- Q6 freshness / timeliness -------------------------------------------------


def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    global_max = e.agg(F.max(F.unix_micros("ts")).alias("gmax"))
    per_type = e.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("type_max_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    joined = per_type.crossJoin(F.broadcast(global_max))
    lag_sec = ((F.col("gmax") - F.col("type_max_us")) / F.lit(1_000_000.0)).alias(
        "staleness_sec"
    )
    return joined.select(
        "event_type",
        "n_events",
        lag_sec,
        F.when(
            (F.col("gmax") - F.col("type_max_us")) / F.lit(1_000_000.0) > 3600.0,
            "WARNING",
        )
        .otherwise("PASSED")
        .alias("freshness_status"),
    )


DQ_FRESHNESS_SQL = """
WITH g AS (SELECT MAX(epoch_us(ts)) AS gmax FROM events),
per_type AS (
  SELECT event_type, MAX(epoch_us(ts)) AS type_max_us, COUNT(*) AS n_events
  FROM events GROUP BY event_type
)
SELECT event_type, n_events,
       (gmax - type_max_us) / CAST(1000000.0 AS DOUBLE) AS staleness_sec,
       CASE WHEN (gmax - type_max_us) / CAST(1000000.0 AS DOUBLE) > CAST(3600.0 AS DOUBLE)
            THEN 'WARNING' ELSE 'PASSED' END AS freshness_status
FROM per_type, g
"""


def dq_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection (Q14-adjacent DQ extension): per event_type,
    count values beyond 2 standard deviations of the type's mean.

    Mean/variance come from integer-exact cents sums held in
    DECIMAL(38,0) — `var = (n*sxx - sx^2) / n^2` is computed on exact
    integers and only the final division and sqrt touch floating
    point. ``sqrt`` is IEEE-754 correctly rounded (unlike ln/exp), so
    the thresholds are bit-identical across engines and even the
    outlier COUNTS value-hash-match. Two map-side-combined passes
    (moments, then flag counts) joined on the 5-row type key — the
    same shape at any scale.
    """
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    t = e.select("event_type", cents.alias("cents"))
    m = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    mean = sx_d / n_d
    # exact integer sums -> double factors, combined with the identical
    # expression tree as the oracle (user_value_trend pattern): every
    # op is the same IEEE op in both engines
    var = (n_d * sxx_d - sx_d * sx_d) / (n_d * n_d)
    stats = m.select(
        "event_type",
        "n",
        mean.alias("mean_cents"),
        F.sqrt(var).alias("std_cents"),
    )
    flagged = (
        t.join(F.broadcast(stats), "event_type")
        .filter(
            F.abs(F.col("cents").cast("double") - F.col("mean_cents"))
            > F.lit(2.0) * F.col("std_cents")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        stats.join(flagged, "event_type", "left")
        .select(
            "event_type",
            "n",
            "mean_cents",
            "std_cents",
            F.coalesce(F.col("n_outliers"), F.lit(0)).alias("n_outliers"),
        )
    )


DQ_OUTLIER_ZSCORE_SQL = """
WITH t AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(cents AS DECIMAL(38,0))) AS sx,
         SUM(CAST(cents * cents AS DECIMAL(38,0))) AS sxx
  FROM t GROUP BY event_type
),
stats AS (
  SELECT event_type, n,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
         sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS std_cents
  FROM m
),
flagged AS (
  SELECT t.event_type, COUNT(*) AS n_outliers
  FROM t JOIN stats s ON t.event_type = s.event_type
  WHERE abs(CAST(cents AS DOUBLE) - mean_cents) > CAST(2.0 AS DOUBLE) * std_cents
  GROUP BY t.event_type
)
SELECT s.event_type, s.n, s.mean_cents, s.std_cents,
       COALESCE(f.n_outliers, 0) AS n_outliers
FROM stats s LEFT JOIN flagged f ON s.event_type = f.event_type
"""


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table FK orphan audit — the relationship-level check the
    per-table DQ family (Q1-Q16) doesn't cover: for each declared
    relationship, how many child keys have no parent. Each relationship
    is one distinct-project + one left-anti join on the key (broadcast
    when the parent keyset is small, hash otherwise — AQE decides);
    results union into the audit row-per-relationship shape the gate
    consumes. A healthy TPC-H-shaped corpus reports zero orphans, so
    the query plants one synthetic orphan per relationship which MUST
    surface — the same plant-then-find discipline as the dedup family.
    The plant is derived as ``max(parent key) + 1`` (one extra scalar
    agg per relationship, re-used by AQE), never a fixed literal: a
    constant beyond today's key range collides with a real parent key
    once the scale factor grows (o_orderkey grows ~6M x SF), silently
    corrupting the only_planted/orphan counts."""

    def _plant(parent: DataFrame) -> DataFrame:
        """1-row frame carrying max(pk)+1 — collision-free by construction."""
        return parent.agg((F.max("pk") + F.lit(1)).alias("ck"))

    rels = []
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ck")
    )
    orders = load_table(spark, sf_dir, "orders")
    o_parent = orders.select(F.col("o_orderkey").alias("pk"))
    rels.append(
        ("lineitem.l_orderkey->orders", li.unionByName(_plant(o_parent)), o_parent)
    )
    cust = load_table(spark, sf_dir, "customer")
    c_parent = cust.select(F.col("c_custkey").alias("pk"))
    rels.append(
        (
            "orders.o_custkey->customer",
            orders.select(F.col("o_custkey").alias("ck")).unionByName(_plant(c_parent)),
            c_parent,
        )
    )
    nation = load_table(spark, sf_dir, "nation")
    n_parent = nation.select(F.col("n_nationkey").cast("long").alias("pk"))
    rels.append(
        (
            "customer.c_nationkey->nation",
            cust.select(F.col("c_nationkey").cast("long").alias("ck")).unionByName(
                _plant(n_parent)
            ),
            n_parent,
        )
    )
    parts = []
    for name, child, parent in rels:
        orphans = (
            child.distinct()
            .join(parent.distinct(), child["ck"] == parent["pk"], "left_anti")
        )
        parts.append(
            orphans.agg(
                F.count(F.lit(1)).alias("n_orphan_keys"),
                F.min("ck").alias("min_orphan_key"),
            ).select(
                F.lit(name).alias("relationship"),
                "n_orphan_keys",
                "min_orphan_key",
                (F.col("n_orphan_keys") == 1).alias("only_planted"),
            )
        )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


DQ_REFERENTIAL_INTEGRITY_SQL = """
WITH l AS (
  SELECT DISTINCT ck FROM (
    SELECT l_orderkey AS ck FROM lineitem
    UNION ALL SELECT MAX(o_orderkey) + 1 FROM orders
  )
),
o AS (
  SELECT DISTINCT ck FROM (
    SELECT o_custkey AS ck FROM orders
    UNION ALL SELECT MAX(c_custkey) + 1 FROM customer
  )
),
c AS (
  SELECT DISTINCT ck FROM (
    SELECT CAST(c_nationkey AS BIGINT) AS ck FROM customer
    UNION ALL SELECT CAST(MAX(n_nationkey) AS BIGINT) + 1 FROM nation
  )
)
SELECT 'lineitem.l_orderkey->orders' AS relationship,
       CAST(COUNT(*) AS BIGINT) AS n_orphan_keys,
       MIN(ck) AS min_orphan_key,
       COUNT(*) = 1 AS only_planted
FROM l WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l.ck)
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST(COUNT(*) AS BIGINT), MIN(ck), COUNT(*) = 1
FROM o WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o.ck)
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST(COUNT(*) AS BIGINT), MIN(ck), COUNT(*) = 1
FROM c WHERE NOT EXISTS (SELECT 1 FROM nation WHERE CAST(n_nationkey AS BIGINT) = c.ck)
"""


QUERIES = {
    "dq_referential_integrity": dq_referential_integrity,
    "dq_completeness": dq_completeness,
    "dq_containment": dq_containment,
    "dq_uniqueness": dq_uniqueness,
    "dq_range": dq_range,
    "dq_accuracy_recompute": dq_accuracy_recompute,
    "dq_cross_column": dq_cross_column,
    "dq_profile_value": dq_profile_value,
    "dq_drift_halves": dq_drift_halves,
    "dq_freshness": dq_freshness,
    "dq_outlier_zscore": dq_outlier_zscore,
}

ORACLES = {
    "dq_referential_integrity": DQ_REFERENTIAL_INTEGRITY_SQL,
    "dq_completeness": DQ_COMPLETENESS_SQL,
    "dq_containment": DQ_CONTAINMENT_SQL,
    "dq_uniqueness": DQ_UNIQUENESS_SQL,
    "dq_range": DQ_RANGE_SQL,
    "dq_accuracy_recompute": DQ_ACCURACY_RECOMPUTE_SQL,
    "dq_cross_column": DQ_CROSS_COLUMN_SQL,
    "dq_profile_value": DQ_PROFILE_VALUE_SQL,
    "dq_drift_halves": DQ_DRIFT_HALVES_SQL,
    "dq_freshness": DQ_FRESHNESS_SQL,
    "dq_outlier_zscore": DQ_OUTLIER_ZSCORE_SQL,
}
