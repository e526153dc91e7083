"""Exact-arithmetic statistics: robust MAD outliers, Pearson
correlation, OLS trend — with zero float nondeterminism.

Complements the DQ family's z-score outliers (``plans/dq.py``,
reference Q10's profile moments): the z-score breaks down when the
contamination itself inflates the mean/stddev; the MAD estimator is
robust to 50% contamination. And unlike the built-in ``F.corr`` /
``F.covar_pop`` (float accumulation, order-dependent), correlation and
regression here run on DECIMAL power sums combined in one fixed double
expression at the output edge — bit-stable under any row order or
partitioning, which is what makes them oracle-checkable AND what a
resumable 100 TB job wants (retried partitions cannot drift the
result).

Medians are rank-based (lower median: element ``ceil(n/2)`` by
``(value, event_id)``), not interpolated — no float arithmetic on the
order statistic. The per-type windows shuffle on a bounded-cardinality
key (|event types|); at true scale the same statistic comes from the
bucketed order-statistic pattern of ``plans/curate.py``'s percentile
gate (histogram + one exact pass over the boundary bucket), which
avoids low-cardinality window partitions entirely — this query keeps
the window form because it also demonstrates the rank-median operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.textops import hex_hash
from ..operators.detmath import (
    det_ln_ratio,
    ln_e_sql,
    ln_m_sql,
    ln_val_sql,
    ln_z_sql,
)

MAD_K = 3.0  # flag beyond 3 robust sigmas
MAD_SCALE = 1.4826  # MAD -> sigma under normality


def _lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
    """Per-type lower median of ``col``: rank by (col, event_id), keep
    the ceil(n/2)-th element. Exact — no interpolation."""
    w = Window.partitionBy("event_type").orderBy(F.col(col), F.col("event_id"))
    n = Window.partitionBy("event_type")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(n))
        .filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint"))
        .select("event_type", F.col(col).alias(out))
    )


def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: exact median, median absolute deviation, and the
    count of events beyond MAD_K robust sigmas."""
    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    med = _lower_median(e, "value", "median_value")
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("median_value"))
    )
    mad = _lower_median(dev, "adev", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("median_value").alias("median_value"),
            F.min("mad").alias("mad"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (
                    F.col("adev") > F.lit(MAD_K) * F.lit(MAD_SCALE) * F.col("mad")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


STATS_MAD_OUTLIERS_SQL = f"""
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, value AS median_value
  FROM ranked WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, m.median_value,
         abs(e.value - m.median_value) AS adev
  FROM events e JOIN med m USING (event_type)
),
dev_ranked AS (
  SELECT event_type, adev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
madt AS (
  SELECT event_type, adev AS mad
  FROM dev_ranked WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
)
SELECT d.event_type,
       MIN(d.median_value) AS median_value,
       MIN(t.mad) AS mad,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN d.adev > {MAD_K} * {MAD_SCALE} * t.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN madt t USING (event_type)
GROUP BY d.event_type
"""


def stats_corr_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS fit of value against hour-of-day, per
    event type. One hash aggregation accumulates the five power sums in
    DECIMAL (exact, order-free); the closed-form estimators combine
    them in a single double expression per row."""
    e = load_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("decimal(4,0)")
    y = F.col("value").cast("decimal(18,6)")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    # degenerate-variance guard (NULLIF on both engines): a group with
    # n = 1, or constant x or y, has exactly-zero variance — under
    # Spark's default ANSI mode an unguarded /0 RAISES, while DuckDB
    # yields NaN/Inf; NULLIF makes "correlation undefined" NULL on both
    var_x_n = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    var_y_n = F.nullif(n * syy - sy * sy, F.lit(0.0))
    slope = cov_n / var_x_n
    return s.select(
        "event_type",
        "n",
        (cov_n / (F.sqrt(var_x_n) * F.sqrt(var_y_n))).alias("corr_hour_value"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


# DuckDB's CAST(DECIMAL AS DOUBLE) double-rounds for scale-12 sums whose
# unscaled int128 exceeds 2^53 (int128 -> double, then / 10^scale — two
# roundings); Spark's BigDecimal.doubleValue rounds once, correctly. The
# VARCHAR round-trip forces DuckDB through its correctly-rounded string
# parser so both engines produce the identical double.
_D = "CAST(CAST({c} AS VARCHAR) AS DOUBLE)"
_SX, _SY, _SXY, _SXX, _SYY = (
    _D.format(c=c) for c in ("sx", "sy", "sxy", "sxx", "syy")
)

STATS_CORR_OLS_SQL = f"""
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(hour(ts) AS DECIMAL(4,0))) AS sx,
         SUM(CAST(value AS DECIMAL(18,6))) AS sy,
         SUM(CAST(hour(ts) AS DECIMAL(4,0)) * CAST(value AS DECIMAL(18,6))) AS sxy,
         SUM(CAST(hour(ts) AS DECIMAL(4,0)) * CAST(hour(ts) AS DECIMAL(4,0))) AS sxx,
         SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS syy
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       (n * {_SXY} - {_SX} * {_SY})
         / (sqrt(NULLIF(n * {_SXX} - {_SX} * {_SX}, 0.0))
            * sqrt(NULLIF(n * {_SYY} - {_SY} * {_SY}, 0.0)))
         AS corr_hour_value,
       (n * {_SXY} - {_SX} * {_SY})
         / NULLIF(n * {_SXX} - {_SX} * {_SX}, 0.0) AS slope,
       ({_SY}
          - (n * {_SXY} - {_SX} * {_SY})
            / NULLIF(n * {_SXX} - {_SX} * {_SX}, 0.0)
            * {_SX}) / n AS intercept
FROM s
"""


K_ANON = 5


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the privacy
    gate a training-data release pipeline runs before publishing: every
    (nation, segment, balance-band) group with fewer than K members is
    re-identification risk. Two hash aggregations (group sizes, then
    the rollup); at 100 TB the first agg is the only shuffle and its
    map-side partials collapse each group to one row."""
    c = load_table(spark, sf_dir, "customer")
    groups = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    risky = F.col("group_size") < K_ANON
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("min_group_size"),
        F.sum(risky.cast("int")).cast("bigint").alias("n_risky_groups"),
        F.sum(F.when(risky, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("n_risky_rows"),
    )


PRIVACY_K_ANONYMITY_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         COUNT(*) AS group_size
  FROM customer GROUP BY 1, 2, 3
)
SELECT COUNT(*) AS n_groups,
       MIN(group_size) AS min_group_size,
       CAST(SUM(CASE WHEN group_size < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
       CAST(SUM(CASE WHEN group_size < {K_ANON} THEN group_size ELSE 0 END) AS BIGINT) AS n_risky_rows
FROM groups
"""


def stats_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point signal per user: the maximum absolute
    cumulative deviation from the user's own mean — the classic
    level-shift detector. Exactness by cross-multiplication again:
    ``cusum_k = Σ_{i≤k} v_i − k·mean`` is scaled by n into
    ``n·Σ_k − k·S`` (pure DECIMAL×INT — zero float until the single
    output division). One running-sum window per user + one broadcast
    join of the per-user totals."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    tot = e.groupBy("user_id").agg(
        F.sum(v).alias("S"), F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = e.select("user_id", "ts", "event_id", v.alias("v")).select(
        "user_id",
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.row_number().over(w).alias("k"),
    )
    scaled = F.abs(F.col("n") * F.col("cum") - F.col("k") * F.col("S"))
    return (
        run.join(F.broadcast(tot), "user_id")
        .groupBy("user_id", "n")
        .agg(
            (F.max(scaled).cast("double") / F.col("n").cast("double")).alias(
                "max_cusum"
            )
        )
        .select("user_id", "n", "max_cusum")
    )


STATS_CUSUM_SQL = """
WITH s AS (
  SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v, ts, event_id FROM events
),
tot AS (
  SELECT user_id, SUM(v) AS S, COUNT(*) AS n FROM s GROUP BY user_id
),
run AS (
  SELECT s.user_id,
         SUM(s.v) OVER (PARTITION BY s.user_id ORDER BY s.ts, s.event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         ROW_NUMBER() OVER (PARTITION BY s.user_id ORDER BY s.ts, s.event_id) AS k
  FROM s
)
SELECT r.user_id, t.n,
       CAST(CAST(MAX(abs(t.n * r.cum - r.k * t.S)) AS VARCHAR) AS DOUBLE)
         / CAST(t.n AS DOUBLE) AS max_cusum
FROM run r JOIN tot t USING (user_id)
GROUP BY r.user_id, t.n
"""


AB_WINDOW_H = 6


def ab_test_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: users are assigned to an arm
    by their FIRST click-or-view (the struct-min idiom — no window),
    converted = any purchase within AB_WINDOW_H hours of that first
    touch, and the lift significance is the standard pooled two-
    proportion z — computed from exact integer counts in ONE closed-form
    double expression, so the statistic is bit-stable however the 100 TB
    scan is partitioned. One user-keyed agg, one user-keyed join, one
    2-row agg pivoted to a single readout row."""
    e = load_table(spark, sf_dir, "events")
    ft = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.struct(
                    F.col("ts").alias("ts"),
                    F.col("event_id").alias("event_id"),
                    F.col("event_type").alias("etype"),
                )
            ).alias("f")
        )
    )
    conv = (
        ft.join(e, "user_id", "left")
        .groupBy("user_id", F.col("f.etype").alias("arm"))
        .agg(
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("f.ts"))
                    & (
                        F.col("ts")
                        <= F.col("f.ts") + F.expr(f"INTERVAL {AB_WINDOW_H} HOURS")
                    )
                ).cast("int")
            ).alias("converted")
        )
    )
    arms = conv.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conversions"),
    )
    wide = arms.groupBy().agg(
        F.max(F.when(F.col("arm") == "click", F.col("n"))).alias("n_click"),
        F.max(F.when(F.col("arm") == "click", F.col("conversions"))).alias("conv_click"),
        F.max(F.when(F.col("arm") == "view", F.col("n"))).alias("n_view"),
        F.max(F.when(F.col("arm") == "view", F.col("conversions"))).alias("conv_view"),
    )
    p1 = F.col("conv_click").cast("double") / F.col("n_click").cast("double")
    p2 = F.col("conv_view").cast("double") / F.col("n_view").cast("double")
    pp = (F.col("conv_click") + F.col("conv_view")).cast("double") / (
        F.col("n_click") + F.col("n_view")
    ).cast("double")
    # pooled-variance guard (NULLIF on both engines): zero conversions
    # (pp = 0) or universal conversion (pp = 1) zero the pooled variance —
    # the z statistic is undefined, not infinite (and under ANSI an
    # unguarded /0 raises)
    z = (p1 - p2) / F.nullif(
        F.sqrt(
            pp
            * (F.lit(1.0) - pp)
            * (
                F.lit(1.0) / F.col("n_click").cast("double")
                + F.lit(1.0) / F.col("n_view").cast("double")
            )
        ),
        F.lit(0.0),
    )
    return wide.select(
        "n_click", "conv_click", "n_view", "conv_view",
        (p1 - p2).alias("lift"),
        z.alias("z_score"),
    )


AB_TEST_FIRST_TOUCH_SQL = f"""
WITH ft AS (
  SELECT user_id,
         min({{'ts': ts, 'event_id': event_id, 'etype': event_type}}) AS f
  FROM events WHERE event_type IN ('click','view')
  GROUP BY user_id
),
conv AS (
  SELECT ft.user_id, ft.f.etype AS arm,
         MAX(CASE WHEN e.event_type = 'purchase'
                   AND e.ts >= ft.f.ts
                   AND e.ts <= ft.f.ts + INTERVAL {AB_WINDOW_H} HOUR
                  THEN 1 ELSE 0 END) AS converted
  FROM ft LEFT JOIN events e ON e.user_id = ft.user_id
  GROUP BY ft.user_id, ft.f.etype
),
arms AS (
  SELECT arm, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conversions
  FROM conv GROUP BY arm
),
wide AS (
  SELECT MAX(CASE WHEN arm = 'click' THEN n END) AS n_click,
         MAX(CASE WHEN arm = 'click' THEN conversions END) AS conv_click,
         MAX(CASE WHEN arm = 'view' THEN n END) AS n_view,
         MAX(CASE WHEN arm = 'view' THEN conversions END) AS conv_view
  FROM arms
)
SELECT n_click, conv_click, n_view, conv_view,
       CAST(conv_click AS DOUBLE) / CAST(n_click AS DOUBLE)
         - CAST(conv_view AS DOUBLE) / CAST(n_view AS DOUBLE) AS lift,
       (CAST(conv_click AS DOUBLE) / CAST(n_click AS DOUBLE)
          - CAST(conv_view AS DOUBLE) / CAST(n_view AS DOUBLE))
         / NULLIF(sqrt(CAST(conv_click + conv_view AS DOUBLE) / CAST(n_click + n_view AS DOUBLE)
                * (1.0 - CAST(conv_click + conv_view AS DOUBLE) / CAST(n_click + n_view AS DOUBLE))
                * (1.0 / CAST(n_click AS DOUBLE) + 1.0 / CAST(n_view AS DOUBLE))), 0.0) AS z_score
FROM wide
"""


def gini_balance_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of positive balances per nation — the
    inequality readout (Lorenz-curve form
    ``G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)`` over ascending
    ranks). The rank-weighted sums are DECIMAL × INT — exact under any
    partitioning — so the only float op is the final division; ties
    rank deterministically by (balance, key). One nation-partitioned
    window + one hash agg."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    ranked = c.select(
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("x"),
        F.row_number().over(w).alias("i"),
    )
    s = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    num = (F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
    den = F.col("n") * F.col("sx").cast("double")
    return s.select("c_nationkey", "n", (num / den).alias("gini"))


# VARCHAR round-trips: see STATS_CORR_OLS_SQL (DuckDB decimal->double
# double-rounding past 2^53 unscaled)
GINI_BALANCE_BY_NATION_SQL = """
WITH ranked AS (
  SELECT c_nationkey,
         CAST(c_acctbal AS DECIMAL(18,2)) AS x,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal, c_custkey) AS i
  FROM customer WHERE c_acctbal > 0
),
s AS (
  SELECT c_nationkey, COUNT(*) AS n,
         SUM(x) AS sx, SUM(i * x) AS six
  FROM ranked GROUP BY c_nationkey
)
SELECT c_nationkey, n,
       CAST(CAST(2 * six - (n + 1) * sx AS VARCHAR) AS DOUBLE)
         / (n * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) AS gini
FROM s
"""


def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over (user, day) baskets: support,
    confidence and lift for every event-type pair. The basket grain is
    deduplicated BEFORE pairing, and the pair join is an equi-join on
    the basket key with the ``<`` canonical ordering — fan-out bounded
    by |types|² per basket, never event-grain quadratic. The three
    probability ratios come from exact integer counts in fixed double
    expressions (the same partition-stable discipline as the A/B
    readout above)."""
    e = load_table(spark, sf_dir, "events")
    baskets = e.select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("d"), "event_type"
    ).distinct()
    nb = baskets.select("user_id", "d").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_item"))
    a = baskets.select("user_id", "d", F.col("event_type").alias("item_a"))
    b = baskets.select("user_id", "d", F.col("event_type").alias("item_b"))
    pair = (
        a.join(b, ["user_id", "d"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    ia = item.select(F.col("event_type").alias("item_a"), F.col("n_item").alias("na"))
    ib = item.select(F.col("event_type").alias("item_b"), F.col("n_item").alias("nb_"))
    out = (
        pair.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .join(F.broadcast(nb))
    )
    np_d = F.col("n_pair").cast("double")
    return out.select(
        "item_a",
        "item_b",
        "n_pair",
        (np_d / F.col("n_baskets")).alias("support"),
        (np_d / F.col("na")).alias("confidence_a_to_b"),
        (
            np_d
            * F.col("n_baskets")
            / (F.col("na").cast("double") * F.col("nb_").cast("double"))
        ).alias("lift"),
    )


BASKET_LIFT_PAIRS_SQL = """
WITH baskets AS (
  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS d, event_type FROM events
),
nb AS (SELECT COUNT(*) AS n_baskets FROM (SELECT DISTINCT user_id, d FROM baskets)),
item AS (SELECT event_type, COUNT(*) AS n_item FROM baskets GROUP BY event_type),
pair AS (
  SELECT a.event_type AS item_a, b.event_type AS item_b, COUNT(*) AS n_pair
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.d = b.d AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b, p.n_pair,
       CAST(p.n_pair AS DOUBLE) / nb.n_baskets AS support,
       CAST(p.n_pair AS DOUBLE) / ia.n_item AS confidence_a_to_b,
       CAST(p.n_pair AS DOUBLE) * nb.n_baskets
         / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)) AS lift
FROM pair p
JOIN item ia ON p.item_a = ia.event_type
JOIN item ib ON p.item_b = ib.event_type
CROSS JOIN nb
"""


def survival_km_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier life table of customer inter-order gaps (reorder
    "survival"): each consecutive-order gap is an observed event, the
    tail from a customer's last order to the corpus max date is a
    right-censored observation. Durations bucket to weeks; the life
    table carries ``n_at_risk`` (subjects still unexpired entering the
    week, via a DESCENDING cumulative sum so no total-count scalar is
    needed), the event/censor counts, and the discrete hazard
    ``d_t / n_t`` — the table's only float op, a single division, so
    the output stays exactly hash-comparable. The survival curve itself
    is the running product of ``(1 - hazard)``, deliberately left to
    the consumer: a float cumulative product is order-fragile across
    engines, while this table is not.

    Scale: the per-customer ``lead`` window shuffles once on the
    natural key; the life-table window is a single-partition sort over
    at most (date-range / 7) rows — bounded by calendar span, not data
    volume."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("d")
    )
    w = Window.partitionBy("o_custkey").orderBy(F.col("d").asc(), F.col("o_orderkey").asc())
    mx = o.agg(F.max("d").alias("max_d"))
    obs = (
        o.withColumn("nd", F.lead("d").over(w))
        .join(F.broadcast(mx))
        .select(
            F.when(
                F.col("nd").isNotNull(), F.datediff(F.col("nd"), F.col("d"))
            )
            .otherwise(F.datediff(F.col("max_d"), F.col("d")))
            .alias("days"),
            F.when(F.col("nd").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_event"),
        )
    )
    lt = (
        obs.select(F.expr("days div 7").alias("t_week"), "is_event")
        .groupBy("t_week")
        .agg(
            F.sum("is_event").cast("bigint").alias("n_events"),
            F.sum(1 - F.col("is_event")).cast("bigint").alias("n_censored"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    # n_at_risk(t) = sum of observations with duration >= t: descending
    # cumulative over the (tiny) life table.
    wd = Window.orderBy(F.col("t_week").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return lt.select(
        "t_week",
        F.sum("n_obs").over(wd).alias("n_at_risk"),
        "n_events",
        "n_censored",
    ).withColumn(
        "hazard",
        F.col("n_events").cast("double") / F.col("n_at_risk").cast("double"),
    )


SURVIVAL_KM_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
),
mx AS (SELECT MAX(d) AS max_d FROM o),
seq AS (
  SELECT o_custkey, d,
         LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS nd
  FROM o
),
obs AS (
  SELECT CASE WHEN nd IS NOT NULL THEN date_diff('day', d, nd)
              ELSE date_diff('day', d, (SELECT max_d FROM mx)) END AS days,
         CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM seq
),
lt AS (
  SELECT CAST(days // 7 AS BIGINT) AS t_week,
         CAST(SUM(is_event) AS BIGINT) AS n_events,
         CAST(SUM(1 - is_event) AS BIGINT) AS n_censored,
         COUNT(*) AS n_obs
  FROM obs GROUP BY 1
)
SELECT t_week,
       CAST(SUM(n_obs) OVER (ORDER BY t_week DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at_risk,
       n_events, n_censored,
       CAST(n_events AS DOUBLE)
         / CAST(SUM(n_obs) OVER (ORDER BY t_week DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS hazard
FROM lt
"""


def tv_distance_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between each source's language mix and
    the corpus-wide mix — the drift statistic a data-mixture curator
    watches per shard/source. TVD = ½·Σ|p_l − q_l| is computed on the
    COMMON DENOMINATOR: the numerator Σ|c_{s,l}·M − d_l·n_s| is an
    exact BIGINT (no per-cell float division, so the sum is
    partition-order-free), and the one float op is the final division.
    Chosen over KL divergence precisely because KL needs per-cell
    log() — a libm call with no cross-engine bit guarantee.

    Scale: two bounded-cardinality hash aggs (|source|, |source|×|lang|)
    plus broadcast joins of the tiny marginals; nothing row-scale ever
    shuffles twice. Validity bound: the exact c*m_total products fit
    BIGINT up to ~3e9 documents; past that BOTH engines fail loudly
    (Spark ANSI integral overflow raises, DuckDB errors) — widen the
    term arithmetic to DECIMAL(38,0) before running at that scale."""
    d = load_table(spark, sf_dir, "documents").select("source", "lang")
    cell = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    n_s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    d_l = d.groupBy("lang").agg(F.count(F.lit(1)).alias("d_lang"))
    m = d.agg(F.count(F.lit(1)).alias("m_total"))
    grid = n_s.crossJoin(F.broadcast(d_l)).crossJoin(F.broadcast(m))
    terms = grid.join(F.broadcast(cell), ["source", "lang"], "left").select(
        "source",
        "n_source",
        "m_total",
        F.abs(
            F.coalesce(F.col("c"), F.lit(0)) * F.col("m_total")
            - F.col("d_lang") * F.col("n_source")
        ).alias("term"),
    )
    out = terms.groupBy("source", "n_source", "m_total").agg(
        F.sum("term").cast("bigint").alias("tv_num")
    )
    return out.select(
        "source",
        F.col("n_source").alias("n_docs"),
        "tv_num",
        (
            F.col("tv_num").cast("double")
            / (F.lit(2.0) * F.col("n_source").cast("double") * F.col("m_total").cast("double"))
        ).alias("tv_distance"),
    )


TV_DISTANCE_SOURCE_MIX_SQL = """
WITH cell AS (
  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY source, lang
),
ns AS (SELECT source, COUNT(*) AS n_source FROM documents GROUP BY source),
dl AS (SELECT lang, COUNT(*) AS d_lang FROM documents GROUP BY lang),
m AS (SELECT COUNT(*) AS m_total FROM documents),
terms AS (
  SELECT ns.source, ns.n_source, m.m_total,
         abs(COALESCE(cell.c, 0) * m.m_total - dl.d_lang * ns.n_source) AS term
  FROM ns CROSS JOIN dl CROSS JOIN m
  LEFT JOIN cell ON cell.source = ns.source AND cell.lang = dl.lang
)
SELECT source, n_source AS n_docs,
       CAST(SUM(term) AS BIGINT) AS tv_num,
       CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE)
         / (2.0 * CAST(n_source AS DOUBLE) * CAST(m_total AS DOUBLE)) AS tv_distance
FROM terms GROUP BY source, n_source, m_total
"""


def stats_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    ``purchase`` and ``view`` value distributions — the continuous
    complement of ``tv_distance_source_mix`` (and of ``dq_drift_halves``'
    moment deltas): D = sup|F₁−F₂|, which for step ECDFs is attained at
    an observed value evaluated inclusively.

    Distributed-ECDF shape: counts are collapsed to the (bucket, value)
    grain first, so ties are handled by construction; within-bucket
    running counts come from BUCKET-partitioned windows, and only the
    per-bucket totals (≤ ~500 rows — the value domain is bounded, and a
    production caller sizes the bucket width from a range scan) pass
    through the tiny ordered prefix window. The sup comparison runs on
    the common denominator: ``|c₁·n₂ − c₂·n₁|`` is exact BIGINT, the
    final division is the only float op. No global sort over data-scale
    rows anywhere. Validity bound: the cumulative-count products fit
    BIGINT up to ~3e9 rows per arm; past that BOTH engines fail loudly
    (Spark ANSI integral overflow raises, DuckDB errors) — widen to
    DECIMAL(38,0) intermediates before running at that scale."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    g = (
        e.select(
            F.floor("value").cast("bigint").alias("bucket"),
            "value",
            (F.col("event_type") == "purchase").cast("bigint").alias("is_p"),
        )
        .groupBy("bucket", "value")
        .agg(
            F.sum("is_p").alias("k_p"),
            F.sum(1 - F.col("is_p")).alias("k_v"),
        )
    )
    bt = g.groupBy("bucket").agg(
        F.sum("k_p").alias("t_p"), F.sum("k_v").alias("t_v")
    )
    wpre = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    pre = bt.select(
        "bucket",
        F.coalesce(F.sum("t_p").over(wpre), F.lit(0)).alias("pre_p"),
        F.coalesce(F.sum("t_v").over(wpre), F.lit(0)).alias("pre_v"),
    )
    win = (
        Window.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.select(
        "bucket",
        "value",
        F.sum("k_p").over(win).alias("cum_p"),
        F.sum("k_v").over(win).alias("cum_v"),
    ).join(F.broadcast(pre), "bucket")
    n = e.agg(
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("n_p"),
        F.sum((F.col("event_type") == "view").cast("bigint")).alias("n_v"),
    )
    diffs = cum.join(F.broadcast(n)).select(
        "n_p",
        "n_v",
        F.abs(
            (F.col("pre_p") + F.col("cum_p")) * F.col("n_v")
            - (F.col("pre_v") + F.col("cum_v")) * F.col("n_p")
        ).alias("d"),
    )
    return diffs.groupBy("n_p", "n_v").agg(
        F.max("d").cast("bigint").alias("ks_num")
    ).select(
        F.col("n_p").alias("n_purchase"),
        F.col("n_v").alias("n_view"),
        "ks_num",
        (
            F.col("ks_num").cast("double")
            / (F.col("n_p").cast("double") * F.col("n_v").cast("double"))
        ).alias("ks_stat"),
    )


STATS_KS_VALUE_DRIFT_SQL = """
WITH e AS (
  SELECT value, CAST(floor(value) AS BIGINT) AS bucket,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events WHERE event_type IN ('purchase', 'view')
),
g AS (
  SELECT bucket, value,
         CAST(SUM(is_p) AS BIGINT) AS k_p,
         CAST(SUM(1 - is_p) AS BIGINT) AS k_v
  FROM e GROUP BY bucket, value
),
bt AS (
  SELECT bucket, SUM(k_p) AS t_p, SUM(k_v) AS t_v FROM g GROUP BY bucket
),
pre AS (
  SELECT bucket,
         COALESCE(SUM(t_p) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_p,
         COALESCE(SUM(t_v) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_v
  FROM bt
),
cum AS (
  SELECT g.bucket, g.value,
         SUM(k_p) OVER (PARTITION BY g.bucket ORDER BY g.value
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_p,
         SUM(k_v) OVER (PARTITION BY g.bucket ORDER BY g.value
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_v
  FROM g
),
n AS (
  SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_v
  FROM events WHERE event_type IN ('purchase', 'view')
),
diffs AS (
  SELECT n.n_p, n.n_v,
         abs((p.pre_p + c.cum_p) * n.n_v - (p.pre_v + c.cum_v) * n.n_p) AS d
  FROM cum c JOIN pre p ON c.bucket = p.bucket CROSS JOIN n
)
SELECT n_p AS n_purchase, n_v AS n_view,
       CAST(MAX(d) AS BIGINT) AS ks_num,
       CAST(CAST(MAX(d) AS BIGINT) AS DOUBLE)
         / (CAST(n_p AS DOUBLE) * CAST(n_v AS DOUBLE)) AS ks_stat
FROM diffs GROUP BY n_p, n_v
"""


def stats_chi2_dow_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for the (day-of-week × event-type)
    contingency table — "is traffic mix independent of weekday?", the
    categorical complement of the KS test above. Emitted at CELL grain
    (≤ 7×|types| rows): observed count, expected ``r·c/T``, and the
    χ² contribution ``(o·T − r·c)²/(r·c·T)``. The squared numerator is
    exact DECIMAL(38,0) (``o·T`` reaches ~1e10 at sf0.1, its square
    overflows BIGINT), marginals come from two broadcast-joined hash
    aggs, and each float column is one fixed expression — the same
    common-denominator discipline as the TVD/KS statistics. Day-of-week
    is normalized to 0=Sunday on both engines."""
    e = load_table(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).alias("dow"), "event_type"
    )
    cell = e.groupBy("dow", "event_type").agg(F.count(F.lit(1)).alias("o"))
    rtot = e.groupBy("dow").agg(F.count(F.lit(1)).alias("r"))
    ctot = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = e.agg(F.count(F.lit(1)).alias("t"))
    j = (
        cell.join(F.broadcast(rtot), "dow")
        .join(F.broadcast(ctot), "event_type")
        .join(F.broadcast(tot))
    )
    # cast the OPERANDS, not the product: o*t in BIGINT silently wraps
    # past 2^63 (~sf100+: t ~ 1e10); DECIMAL operands keep the multiply
    # exact on both engines (the oracle carries the same operand casts)
    d19 = "decimal(19,0)"
    num = (
        F.col("o").cast(d19) * F.col("t").cast(d19)
        - F.col("r").cast(d19) * F.col("c").cast(d19)
    ).cast(d19)
    sq = (num * num).cast("decimal(38,0)")
    rc = F.col("r") * F.col("c")
    return j.select(
        "dow",
        "event_type",
        F.col("o").alias("observed"),
        (rc.cast("double") / F.col("t").cast("double")).alias("expected"),
        (
            sq.cast("double")
            / (rc.cast("double") * F.col("t").cast("double"))
        ).alias("chi2_contribution"),
    )


STATS_CHI2_DOW_TYPE_SQL = """
WITH e AS (SELECT dayofweek(ts) AS dow, event_type FROM events),
cell AS (SELECT dow, event_type, COUNT(*) AS o FROM e GROUP BY dow, event_type),
rtot AS (SELECT dow, COUNT(*) AS r FROM e GROUP BY dow),
ctot AS (SELECT event_type, COUNT(*) AS c FROM e GROUP BY event_type),
tot AS (SELECT COUNT(*) AS t FROM e)
SELECT cell.dow, cell.event_type, o AS observed,
       CAST(r * c AS DOUBLE) / CAST(t AS DOUBLE) AS expected,
       CAST(CAST(CAST(CAST(CAST(o AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))
                           - CAST(r AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)) AS DECIMAL(19,0))
                      * CAST(CAST(o AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))
                             - CAST(r AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)) AS DECIMAL(19,0)) AS DECIMAL(38,0))
                 AS VARCHAR) AS DOUBLE)
         / (CAST(r * c AS DOUBLE) * CAST(t AS DOUBLE)) AS chi2_contribution
FROM cell
JOIN rtot ON cell.dow = rtot.dow
JOIN ctot ON cell.event_type = ctot.event_type
CROSS JOIN tot
"""


L_DIVERSITY = 3


def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the follow-up to ``privacy_k_anonymity``: a
    group can be k-anonymous yet still leak if everyone in it shares the
    same SENSITIVE value. Quasi-identifier = (order month, status);
    sensitive attribute = order priority; groups whose distinct
    sensitive count falls below l={L_DIVERSITY} are homogeneity-attack
    prone. One (QI, sensitive) distinct collapse + one QI hash agg —
    the same two-shuffle shape as the k-anonymity gate."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        "o_orderstatus",
        "o_orderpriority",
    )
    return (
        o.groupBy("order_month", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_orderpriority").alias("n_distinct_sensitive"),
        )
        .withColumn(
            "meets_l_diversity", F.col("n_distinct_sensitive") >= L_DIVERSITY
        )
    )


PRIVACY_L_DIVERSITY_SQL = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       o_orderstatus,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT o_orderpriority) AS n_distinct_sensitive,
       COUNT(DISTINCT o_orderpriority) >= {L_DIVERSITY} AS meets_l_diversity
FROM orders
GROUP BY 1, 2
"""


def stats_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted outlier counts: events compared against
    their own (event_type, hour-of-day) cell — the profile a metrics
    monitor keeps so a nightly-batch spike isn't judged against the
    daytime mean. The 3σ decision is evaluated WITHOUT computing σ as a
    float: ``|x − μ| > 3σ`` cross-multiplies to
    ``(n·x − S)² > 9·(n·Q − S²)`` with S=Σx, Q=Σx² in DECIMAL. The rhs
    is exact; the lhs is rounded to DECIMAL(38,3) before squaring (to
    fit 38-digit precision), so the accepted tolerance is ~5e-4 on
    |n·x − S| at the 3σ boundary — same discipline as the PQ-residual
    1e-12 truncation, deterministic on both engines because Spark
    HALF_UP and DuckDB half-away-from-zero agree on ties (and the
    invariant test notes no corpus value sits on the boundary). Two
    passes over the cell:
    one agg for (n, S, Q), one broadcast join back + conditional count.
    Cells are |types|×24 — bounded state, broadcastable forever."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("h"), F.col("value").cast("decimal(18,6)").alias("x")
    )
    prof = e.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    j = e.join(F.broadcast(prof), ["event_type", "h"])
    # (n·x − S)² > 9·(n·Q − S²) — all DECIMAL; lhs rounds to (38,3)
    # before squaring (precision budget), tolerance documented above
    lhs = (F.col("n") * F.col("x") - F.col("s")).cast("decimal(38,6)")
    rhs = (
        F.col("n") * F.col("q") - (F.col("s") * F.col("s")).cast("decimal(38,12)")
    ).cast("decimal(38,12)")
    is_out = (lhs.cast("decimal(38,3)") * lhs.cast("decimal(38,3)")).cast(
        "decimal(38,6)"
    ) > (F.lit(9) * rhs).cast("decimal(38,6)")
    return (
        j.groupBy("event_type", "h")
        .agg(
            F.max("n").alias("n_events"),
            F.sum(is_out.cast("int")).cast("bigint").alias("n_outliers"),
        )
        .withColumn("hour", F.col("h"))
        .drop("h")
    )


STATS_SEASONAL_OUTLIERS_SQL = """
WITH e AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS h,
         CAST(value AS DECIMAL(18,6)) AS x
  FROM events
),
prof AS (
  SELECT event_type, h, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS q
  FROM e GROUP BY event_type, h
)
SELECT e.event_type,
       MAX(n) AS n_events,
       CAST(SUM(CASE WHEN
           CAST(CAST(CAST(n * x - s AS DECIMAL(38,6)) AS DECIMAL(38,3))
                * CAST(CAST(n * x - s AS DECIMAL(38,6)) AS DECIMAL(38,3)) AS DECIMAL(38,6))
           > CAST(9 * CAST(n * q - CAST(s * s AS DECIMAL(38,12)) AS DECIMAL(38,12)) AS DECIMAL(38,6))
         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       e.h AS hour
FROM e JOIN prof ON e.event_type = prof.event_type AND e.h = prof.h
GROUP BY e.event_type, e.h
"""


import math as _math

# log10(1 + 1/d) for d = 1..9, precomputed once in Python so BOTH
# engines consume the identical double literals — no libm call in
# either plan (the repo's standing rule for log-shaped constants)
_BENFORD = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def stats_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classical fabricated-numbers screen: observed leading-digit shares
    vs the Benford expectation log₁₀(1+1/d). The expectations enter as
    nine PRECOMPUTED double literals (identical text in both engines),
    so no logarithm is ever evaluated at query time; counts are exact
    and the share/deviation are single float ops. One narrow projection
    + one 9-key hash agg. (The synthetic uniform-ish prices are NOT
    Benford-distributed — the audit flagging that loudly is the
    demonstration.)"""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.regexp_replace(F.col("o_totalprice").cast("decimal(18,2)").cast("string"), r"[0.\-]", ""), 1, 1
    ).cast("int")
    counts = o.select(digit.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = o.agg(F.count(F.lit(1)).alias("t"))
    expected = F.lit(0.0)
    for d, p in _BENFORD.items():
        expected = F.when(F.col("d") == d, F.lit(p)).otherwise(expected)
    share = F.col("n").cast("double") / F.col("t").cast("double")
    return counts.join(F.broadcast(total)).select(
        F.col("d").alias("leading_digit"),
        "n",
        share.alias("observed_share"),
        expected.alias("benford_share"),
        (share - expected).alias("deviation"),
    )


def _benford_sql() -> str:
    cases = " ".join(
        f"WHEN d = {d} THEN {p!r}" for d, p in _BENFORD.items()
    )
    return f"""
WITH t AS (
  SELECT CAST(substr(regexp_replace(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                     '[0.\\-]', '', 'g'), 1, 1) AS INTEGER) AS d
  FROM orders
),
counts AS (SELECT d, COUNT(*) AS n FROM t GROUP BY d),
total AS (SELECT COUNT(*) AS tt FROM t)
SELECT d AS leading_digit, n,
       CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) AS observed_share,
       CASE {cases} ELSE 0.0 END AS benford_share,
       CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) - (CASE {cases} ELSE 0.0 END) AS deviation
FROM counts CROSS JOIN total
"""


STATS_BENFORD_PRICES_SQL = _benford_sql()


N_DECILES = 10


def value_decile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile banding per event type: boundaries are RANK order
    statistics (element ``ceil(q·n)`` by ``(value, event_id)`` — the
    same no-interpolation discipline as the rank medians above), and
    every event is then assigned its band by counting how many
    boundaries it exceeds — a broadcast join against the ≤|types|×9
    boundary table, never a second window pass over the data. Output:
    per (type, decile) the member count and the band's lower boundary;
    by construction each band holds ~n/10 events, so the output doubles
    as a uniformity audit of the banding itself."""
    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy(F.col("value"), F.col("event_id"))
    nw = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(nw).alias("n"),
    )
    qs = [q / N_DECILES for q in range(1, N_DECILES)]
    bounds = ranked.filter(
        F.array_contains(
            F.array(
                *[F.ceil(F.col("n") * F.lit(q)).cast("bigint") for q in qs]
            ),
            F.col("rn"),
        )
    ).select("event_type", F.col("value").alias("bound"))
    assigned = e.join(F.broadcast(bounds), "event_type").groupBy(
        "event_type", "event_id", "value"
    ).agg(
        F.sum((F.col("value") > F.col("bound")).cast("int")).alias("decile")
    )
    lower = bounds.groupBy("event_type").agg(
        F.sort_array(F.collect_list("bound")).alias("bs")
    )
    return (
        assigned.groupBy("event_type", "decile")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .join(F.broadcast(lower), "event_type")
        .select(
            "event_type",
            "decile",
            "n_events",
            F.when(F.col("decile") == 0, F.lit(None).cast("double"))
            .otherwise(F.element_at(F.col("bs"), F.col("decile").cast("int")))
            .alias("lower_bound"),
        )
    )


VALUE_DECILE_ASSIGNMENT_SQL = f"""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
bounds AS (
  SELECT event_type, value AS bound
  FROM ranked
  WHERE list_contains(
          [{", ".join(f"CAST(ceil(n * {q / 10}) AS BIGINT)" for q in range(1, 10))}],
          rn)
),
assigned AS (
  SELECT e.event_type, e.event_id, e.value,
         CAST(SUM(CASE WHEN e.value > b.bound THEN 1 ELSE 0 END) AS BIGINT) AS decile
  FROM events e JOIN bounds b ON e.event_type = b.event_type
  GROUP BY e.event_type, e.event_id, e.value
),
lower AS (
  SELECT event_type, list_sort(list(bound)) AS bs FROM bounds GROUP BY event_type
)
SELECT a.event_type, a.decile, COUNT(*) AS n_events,
       CASE WHEN a.decile = 0 THEN NULL
            ELSE l.bs[CAST(a.decile AS INTEGER)] END AS lower_bound
FROM assigned a JOIN lower l ON a.event_type = l.event_type
GROUP BY a.event_type, a.decile, CASE WHEN a.decile = 0 THEN NULL
            ELSE l.bs[CAST(a.decile AS INTEGER)] END
"""


ACF_MAX_LAG = 7


def stats_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-volume series at lags
    1..{ACF_MAX_LAG} — the seasonality detector (a weekly cycle shows
    as a lag-7 peak). The series is daily COUNTS (exact integers), so
    every power sum in the lag-k Pearson correlation is exact BIGINT
    arithmetic and the coefficient is one closed-form double expression
    — the same discipline as ``stats_corr_ols``. The lag join is a
    self-equi-join on the (tiny, one-row-per-day) aggregate, expanded
    over a broadcast lag spine; nothing event-grain touches the lag
    logic."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("d").alias("d1"), F.col("y").alias("x"))
    b = daily.select(F.col("d").alias("d2"), F.col("y").alias("z"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("date_add(d1, lag) = d2"))
        .select("lag", "x", "z")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sz = F.col("sx").cast("double"), F.col("sz").cast("double")
    sxz = F.col("sxz").cast("double")
    sxx, szz = F.col("sxx").cast("double"), F.col("szz").cast("double")
    # constant-series guard (NULLIF both engines): identical daily counts
    # zero both variances — ACF undefined, and ANSI /0 raises on Spark
    r = (n * sxz - sx * sz) / F.nullif(
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * szz - sz * sz), F.lit(0.0)
    )
    return s.select("lag", "n_pairs", r.alias("acf"))


STATS_AUTOCORRELATION_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS y FROM events GROUP BY 1
),
lags AS (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag),
pairs AS (
  SELECT l.lag, a.y AS x, b.y AS z
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON a.d + CAST(l.lag AS INTEGER) = b.d
),
s AS (
  SELECT lag, COUNT(*) AS n_pairs,
         SUM(x) AS sx, SUM(z) AS sz, SUM(x * z) AS sxz,
         SUM(x * x) AS sxx, SUM(z * z) AS szz
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
       (CAST(n_pairs AS DOUBLE) * CAST(sxz AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
         / NULLIF(sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * sqrt(CAST(n_pairs AS DOUBLE) * CAST(szz AS DOUBLE)
                   - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)), 0.0) AS acf
FROM s
"""


_TC_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
# t = 1/5: a group fails when EMD > 0.2 — compared in EXACT integers
_TC_NUM, _TC_DEN = 1, 5


def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung after ``privacy_k_anonymity``
    and ``privacy_l_diversity``: a group can be k-anonymous AND
    l-diverse yet still leak if its SENSITIVE-value distribution skews
    far from the table's (the attacker learns the skew). Distance is
    the Earth Mover's Distance over the ORDERED sensitive attribute
    (order priority, 1-URGENT..5-LOW):

        EMD = (1/(m-1)) * sum_i |CumP_i - CumQ_i|

    computed on the COMMON DENOMINATOR n_g*N (the ``tv_distance``
    discipline): each cumulative term is the exact BIGINT
    |sum_j<=i (c_j*N - d_j*n_g)|, the only float op is the final
    division, and the pass/fail gate never touches float at all —
    ``EMD <= t`` cross-multiplies to
    ``(m-1)-sum * DEN <= NUM * n_g * N * (m-1)`` in integers. Plan: one
    (QI, sensitive) pivot-style conditional agg + one broadcast global
    row — two shuffles, group count x m cells of state."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        "o_orderstatus",
        "o_orderpriority",
    )

    def counts(df, prefix: str):
        return [
            F.sum((F.col("o_orderpriority") == p).cast("long")).alias(f"{prefix}{i}")
            for i, p in enumerate(_TC_PRIORITIES)
        ]

    g = o.groupBy("order_month", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_g"), *counts(o, "c")
    )
    glob = o.agg(F.count(F.lit(1)).alias("n_tot"), *counts(o, "d"))
    j = g.join(F.broadcast(glob))
    m = len(_TC_PRIORITIES)
    cums = []
    acc = None
    for i in range(m - 1):  # the m-th cumulative diff is identically 0
        term = F.col(f"c{i}") * F.col("n_tot") - F.col(f"d{i}") * F.col("n_g")
        acc = term if acc is None else acc + term
        cums.append(F.abs(acc))
    emd_scaled = cums[0]
    for c in cums[1:]:
        emd_scaled = emd_scaled + c
    denom = F.col("n_g") * F.col("n_tot") * F.lit(m - 1)
    return j.select(
        "order_month",
        "o_orderstatus",
        F.col("n_g").alias("n_rows"),
        (emd_scaled.cast("double") / denom.cast("double")).alias("emd"),
        (emd_scaled * _TC_DEN <= F.lit(_TC_NUM) * denom).alias("meets_t_closeness"),
    )


def _tc_sql() -> str:
    m = len(_TC_PRIORITIES)
    c_cols = ", ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i, p in enumerate(_TC_PRIORITIES)
    )
    d_cols = ", ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS d{i}"
        for i, p in enumerate(_TC_PRIORITIES)
    )
    cum_terms = []
    for i in range(m - 1):
        inner = " + ".join(f"(c{j} * n_tot - d{j} * n_g)" for j in range(i + 1))
        cum_terms.append(f"ABS({inner})")
    emd = " + ".join(cum_terms)
    return f"""
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS order_month, o_orderstatus,
         o_orderpriority
  FROM orders
),
g AS (
  SELECT order_month, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_g, {c_cols}
  FROM o GROUP BY order_month, o_orderstatus
),
gtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot, {d_cols} FROM o)
SELECT order_month, o_orderstatus, n_g AS n_rows,
       CAST(CAST({emd} AS BIGINT) AS DOUBLE)
         / CAST(n_g * n_tot * {m - 1} AS DOUBLE) AS emd,
       CAST({emd} AS BIGINT) * {_TC_DEN}
         <= {_TC_NUM} * n_g * n_tot * {m - 1} AS meets_t_closeness
FROM g, gtot
"""


PRIVACY_T_CLOSENESS_SQL = _tc_sql()


FORECAST_LAG_DAYS = 7


def forecast_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every forecasting
    pipeline must beat and therefore must be able to SCORE: predict each
    day's per-type volume/value as the value {FORECAST_LAG_DAYS} days
    earlier, then report MAE over all scoreable days. Exact arithmetic:
    counts are BIGINT, values fold in DECIMAL(18,2), |errors| sum in
    DECIMAL before ONE closing division per metric — no float
    accumulation, so the backtest value-hashes across engines. Plan:
    one (type, day) hash agg, one self-join on the shifted calendar key
    (both sides pre-aggregated to |types| x 30 rows), one type-level
    agg — bounded state everywhere."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    daily = e.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    fc = daily.select(
        "event_type",
        F.date_add("d", FORECAST_LAG_DAYS).alias("d"),
        F.col("n").alias("n_hat"),
        F.col("sv").alias("sv_hat"),
    )
    scored = daily.join(fc, ["event_type", "d"])
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        (
            F.sum(F.abs(F.col("n") - F.col("n_hat"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mae_count"),
        (
            F.sum(F.abs(F.col("sv") - F.col("sv_hat"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mae_value"),
    )


FORECAST_SEASONAL_NAIVE_SQL = f"""
WITH e AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(value AS DECIMAL(18,2)) AS v
  FROM events
),
daily AS (
  SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS sv
  FROM e GROUP BY event_type, d
),
fc AS (
  SELECT event_type, d + INTERVAL {FORECAST_LAG_DAYS} DAY AS d,
         n AS n_hat, sv AS sv_hat
  FROM daily
),
scored AS (
  SELECT daily.event_type, ABS(daily.n - fc.n_hat) AS abs_n_err,
         ABS(daily.sv - fc.sv_hat) AS abs_v_err
  FROM daily JOIN fc ON daily.event_type = fc.event_type AND daily.d = fc.d
)
SELECT event_type,
       COUNT(*) AS n_days_scored,
       CAST(CAST(SUM(abs_n_err) AS VARCHAR) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS mae_count,
       CAST(CAST(SUM(abs_v_err) AS VARCHAR) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS mae_value
FROM scored GROUP BY event_type
"""


def stats_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann–Whitney U (rank-sum) test, one-vs-rest per
    event type over ``value`` — the NONPARAMETRIC complement of the
    parametric drift checks (``dq_drift_halves`` compares moments,
    ``stats_ks_value_drift`` the sup-gap): "does this event type's
    value distribution stochastically dominate the rest?", robust to
    the heavy right tail where a t-test is not.

    Exact-integer discipline (the chi2/KS pattern): ranks never
    materialize per row — counts collapse to the DISTINCT-VALUE grain
    first (bounded domain, same validity note as the KS test), average
    ranks come from the cumulative window over that grain, and
    ``2·R₁`` (doubled rank sum — integral even with tied half-ranks),
    ``2·U₁`` and the tie-correction term ``Σ(t³−t)`` are all exact
    BIGINT. The z-score is the single float expression
    ``(2U₁−n₁n₂) / sqrt(n₁n₂·((N+1) − ΣT/(N(N−1)))/3)`` evaluated
    identically on both engines. Overflow: 2R ≤ N(N+1) fits BIGINT to
    N≈3e9 rows; past that both engines fail loudly (ANSI overflow) —
    widen to DECIMAL(38,0) intermediates before running there."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    cell = e.groupBy("value", "event_type").agg(F.count(F.lit(1)).alias("g"))
    vt = cell.groupBy("value").agg(F.sum("g").alias("t"))
    wpre = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    vt = vt.select(
        "value", "t", F.coalesce(F.sum("t").over(wpre), F.lit(0)).alias("c")
    )
    per_type = (
        cell.join(vt, "value")
        .groupBy("event_type")
        .agg(
            F.sum("g").alias("n"),
            F.sum(F.col("g") * (2 * F.col("c") + F.col("t") + 1)).alias(
                "rank_sum_x2"
            ),
        )
    )
    tot = vt.agg(
        F.sum("t").alias("big_n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("sum_t"),
    )
    j = per_type.join(F.broadcast(tot))
    n2 = F.col("big_n") - F.col("n")
    u_x2 = F.col("rank_sum_x2") - F.col("n") * (F.col("n") + 1)
    num = u_x2 - F.col("n") * n2
    z = num.cast("double") / F.sqrt(
        (F.col("n").cast("double") * n2.cast("double"))
        * (
            (F.col("big_n") + 1).cast("double")
            - F.col("sum_t").cast("double")
            / (F.col("big_n").cast("double") * (F.col("big_n") - 1).cast("double"))
        )
        / F.lit(3.0)
    )
    return j.select(
        "event_type",
        "n",
        "rank_sum_x2",
        u_x2.alias("u_x2"),
        z.alias("z_score"),
    )


STATS_MANNWHITNEY_VALUE_SQL = """
WITH cell AS (
  SELECT value, event_type, COUNT(*) AS g FROM events GROUP BY value, event_type
),
vt AS (
  SELECT value, CAST(SUM(g) AS BIGINT) AS t FROM cell GROUP BY value
),
vtc AS (
  SELECT value, t,
         CAST(COALESCE(SUM(t) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
  FROM vt
),
per_type AS (
  SELECT event_type,
         CAST(SUM(g) AS BIGINT) AS n,
         CAST(SUM(g * (2 * c + t + 1)) AS BIGINT) AS rank_sum_x2
  FROM cell JOIN vtc USING (value)
  GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS big_n,
         CAST(SUM(t * t * t - t) AS BIGINT) AS sum_t
  FROM vtc
)
SELECT event_type, n, rank_sum_x2,
       rank_sum_x2 - n * (n + 1) AS u_x2,
       CAST(rank_sum_x2 - n * (n + 1) - n * (big_n - n) AS DOUBLE)
       / sqrt(
           (CAST(n AS DOUBLE) * CAST(big_n - n AS DOUBLE))
           * (CAST(big_n + 1 AS DOUBLE)
              - CAST(sum_t AS DOUBLE)
                / (CAST(big_n AS DOUBLE) * CAST(big_n - 1 AS DOUBLE)))
           / 3.0
         ) AS z_score
FROM per_type, tot
"""


# --- PSI + Jensen-Shannon drift (the log-family divergences) ----------
# Unlocked by operators/detmath.det_ln_ratio: ln of an EXACT INTEGER
# RATIO computed from IEEE-exact primitives only, bit-identical across
# engines by construction — so PSI/JSD join the drift family
# (dq_drift_halves moments, KS sup-gap, chi2, TVD, MW-U rank test)
# WITHOUT breaking the no-libm parity discipline that made
# tv_distance_source_mix choose TVD over KL.
_PSI_NBUCKETS = 16
_PSI_BUCKET_W = 32.0  # pinned [0, 512) range; production sizes from a range scan


def stats_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index + Jensen–Shannon divergence of the
    ``value`` distribution, baseline (day-of-month ≤ 15, the
    ``dq_drift_halves`` split) vs current, per event type — the two
    log-family drift scores a model-serving / data-mixture stack
    watches per feature per slice (PSI > 0.1 investigate, > 0.2 act —
    the conventional banking-scorecard thresholds).

    Exactness: counts collapse to the (type, half, bucket) grain
    (16 fixed-width buckets over the pinned [0, 512) range, clamped
    SYMMETRICALLY — overflow into the top bucket, negatives into bucket
    0: a one-sided clamp would let a negative value fall off the 0..15
    spine, dropping it from the PSI/JSD numerators while still counting
    it in the n_base/n_cur denominators. A bucket spine keeps EMPTY
    buckets in the sum so the +1 Laplace smoothing denominators agree). Every log
    argument is an exact BIGINT ratio — pₐ/p_b = u·q / v·p with
    u = c_base+1, v = c_cur+1, p = n_base+16, q = n_cur+16, and the
    JSD legs 2uq/(uq+vp), 2vp/(uq+vp) — evaluated by
    ``operators/detmath.det_ln_ratio`` (bitlen-reduced atanh series,
    IEEE-exact ops in pinned order, bit-identical cross-engine; ~1e-12
    relative accuracy). Per-bucket terms cast to DECIMAL(28,12) before
    the per-type sum (order-free exact). Overflow: u·q fits BIGINT to
    ~3e9 rows per arm; past that both engines fail loudly.

    Scale: one events scan → two bounded hash aggs (|types|×16 cells,
    |types| totals) + broadcast spine/total joins; nothing row-scale
    shuffles twice. The spine crossJoin is broadcast (|types| × 16)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.dayofmonth("ts") <= 15).alias("is_base"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(
                F.lit(_PSI_NBUCKETS - 1).cast("bigint"),
                F.floor(F.col("value") / F.lit(_PSI_BUCKET_W)).cast("bigint"),
            ),
        ).alias("bucket"),
    )
    cell = e.groupBy("event_type", "bucket").agg(
        F.sum(F.col("is_base").cast("bigint")).alias("cb"),
        F.sum((~F.col("is_base")).cast("bigint")).alias("cc"),
    )
    tot = e.groupBy("event_type").agg(
        F.sum(F.col("is_base").cast("bigint")).alias("nb"),
        F.sum((~F.col("is_base")).cast("bigint")).alias("nc"),
    )
    types = e.select("event_type").distinct()
    buckets = spark.range(_PSI_NBUCKETS).select(F.col("id").alias("bucket"))
    spine = types.crossJoin(F.broadcast(buckets))
    full = (
        spine.join(cell, ["event_type", "bucket"], "left")
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "nb",
            "nc",
            (F.coalesce(F.col("cb"), F.lit(0)) + 1).alias("u"),
            (F.coalesce(F.col("cc"), F.lit(0)) + 1).alias("v"),
            (F.col("nb") + _PSI_NBUCKETS).alias("p"),
            (F.col("nc") + _PSI_NBUCKETS).alias("q"),
        )
    )
    uq = F.col("u") * F.col("q")
    vp = F.col("v") * F.col("p")
    pa = F.col("u").cast("double") / F.col("p").cast("double")
    pb = F.col("v").cast("double") / F.col("q").cast("double")
    psi_term = (pa - pb) * det_ln_ratio(uq, vp)
    jsd_term = F.lit(0.5) * pa * det_ln_ratio(F.lit(2) * uq, uq + vp) + F.lit(
        0.5
    ) * pb * det_ln_ratio(F.lit(2) * vp, uq + vp)
    agg = (
        full.select(
            "event_type",
            "nb",
            "nc",
            psi_term.cast("decimal(28,12)").alias("psi_t"),
            jsd_term.cast("decimal(28,12)").alias("jsd_t"),
        )
        .groupBy("event_type", "nb", "nc")
        .agg(F.sum("psi_t").alias("psi_d"), F.sum("jsd_t").alias("jsd_d"))
    )
    psi = F.col("psi_d").cast("double")
    return agg.select(
        "event_type",
        F.col("nb").alias("n_base"),
        F.col("nc").alias("n_cur"),
        psi.alias("psi"),
        F.col("jsd_d").cast("double").alias("jsd_nats"),
        F.when(psi > 0.2, "ALERT")
        .when(psi > 0.1, "WARN")
        .otherwise("OK")
        .alias("psi_status"),
    )


def _psi_sql() -> str:
    """DuckDB twin: the det_ln stages run as CTE columns (e/m/z/w per
    log argument) so the series never nests inside itself."""
    lnv = ln_val_sql
    return f"""
WITH ev AS (
  SELECT event_type,
         (date_part('day', ts) <= 15) AS is_base,
         GREATEST(CAST(0 AS BIGINT),
                  LEAST({_PSI_NBUCKETS - 1},
                        CAST(FLOOR(value / {_PSI_BUCKET_W!r}) AS BIGINT))) AS bucket
  FROM events
),
cell AS (
  SELECT event_type, bucket,
         CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS cb,
         CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS cc
  FROM ev GROUP BY event_type, bucket
),
tot AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS nc
  FROM ev GROUP BY event_type
),
spine AS (
  SELECT t.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM ev) t,
       (SELECT unnest(generate_series(0, {_PSI_NBUCKETS - 1})) AS bucket) g
),
full_cell AS (
  SELECT s.event_type, tot.nb, tot.nc,
         COALESCE(cell.cb, 0) + 1 AS u,
         COALESCE(cell.cc, 0) + 1 AS v,
         tot.nb + {_PSI_NBUCKETS} AS p,
         tot.nc + {_PSI_NBUCKETS} AS q
  FROM spine s
  LEFT JOIN cell ON s.event_type = cell.event_type AND s.bucket = cell.bucket
  JOIN tot ON s.event_type = tot.event_type
),
t0 AS (
  SELECT *, u * q AS uq, v * p AS vp FROM full_cell
),
l1 AS (
  SELECT *,
         {ln_e_sql("uq", "vp")} AS e1,
         {ln_e_sql("2 * uq", "uq + vp")} AS e2,
         {ln_e_sql("2 * vp", "uq + vp")} AS e3
  FROM t0
),
l2 AS (
  SELECT *,
         {ln_m_sql("uq", "vp", "e1")} AS m1,
         {ln_m_sql("2 * uq", "uq + vp", "e2")} AS m2,
         {ln_m_sql("2 * vp", "uq + vp", "e3")} AS m3
  FROM l1
),
l3 AS (
  SELECT *, {ln_z_sql("m1")} AS z1, {ln_z_sql("m2")} AS z2,
         {ln_z_sql("m3")} AS z3
  FROM l2
),
l4 AS (
  SELECT *, z1 * z1 AS w1, z2 * z2 AS w2, z3 * z3 AS w3 FROM l3
),
terms AS (
  SELECT event_type, nb, nc,
         (CAST(u AS DOUBLE) / CAST(p AS DOUBLE)
          - CAST(v AS DOUBLE) / CAST(q AS DOUBLE))
           * {lnv("e1", "z1", "w1")} AS psi_term,
         CAST(0.5 AS DOUBLE) * (CAST(u AS DOUBLE) / CAST(p AS DOUBLE))
           * {lnv("e2", "z2", "w2")}
         + CAST(0.5 AS DOUBLE) * (CAST(v AS DOUBLE) / CAST(q AS DOUBLE))
           * {lnv("e3", "z3", "w3")} AS jsd_term
  FROM l4
),
agg AS (
  SELECT event_type, nb, nc,
         SUM(CAST(psi_term AS DECIMAL(28,12))) AS psi_d,
         SUM(CAST(jsd_term AS DECIMAL(28,12))) AS jsd_d
  FROM terms GROUP BY event_type, nb, nc
)
SELECT event_type, nb AS n_base, nc AS n_cur,
       CAST(CAST(psi_d AS VARCHAR) AS DOUBLE) AS psi,
       CAST(CAST(jsd_d AS VARCHAR) AS DOUBLE) AS jsd_nats,
       CASE WHEN CAST(CAST(psi_d AS VARCHAR) AS DOUBLE) > 0.2 THEN 'ALERT'
            WHEN CAST(CAST(psi_d AS VARCHAR) AS DOUBLE) > 0.1 THEN 'WARN'
            ELSE 'OK' END AS psi_status
FROM agg
"""


STATS_PSI_VALUE_DRIFT_SQL = _psi_sql()


# --- Deterministic Poisson bootstrap -----------------------------------
# Resamples. CPU cost is LINEAR in B by construction (the explode
# materializes N·B weight rows but they collapse into the map-side
# (type, b) partial agg, so the SHUFFLE stays |types|·B regardless);
# the B-knob scaling is MEASURED — see the `bootstrap_B` family in
# tools/scale_curve.py (suite-gated by tests/test_scale_curve.py) —
# so "production raises B to 1000+" is a priced claim, not a hope.
# The B=64 default keeps the per-round gate cheap.
_BOOT_B = 64
_BOOT_SEED = "boot"
# Inverse Poisson(1) CDF breakpoints: P(X<=k) = e^-1 * sum 1/j! for
# j<=k, hardcoded as double literals so BOTH engines branch on
# bit-identical constants (no runtime exp()).
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
)
_TWO60 = float(1 << 60)


def stats_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap 95% CI for the mean ``value`` per event
    type — the uncertainty quantification a metrics pipeline attaches
    to every point estimate, made DETERMINISTIC (hence oracle-checkable
    and retry-stable) by replacing the RNG with a hash: replica weights
    are Poisson(1) draws via the inverse CDF applied to
    ``md5(seed, event_id, b) / 2^60`` — the distributed "Poisson
    bootstrap" (Chamandy et al., Google 2012), which needs no
    per-resample shuffling of the data and no knowledge of n upfront.

    Exactness: weights are exact ints; per-resample sums Σw·cents / Σw
    are exact BIGINT on the cents grain (the ``dq_drift_halves``
    decimal(18,2)·100 trick), so each resample mean is ONE double
    division; the CI bounds are ORDER STATISTICS of the {_BOOT_B}
    resample means (rank ⌈0.025B⌉ / ⌈0.975B⌉, ties broken by resample
    id — no interpolation, no float accumulation); the bootstrap SE
    comes from EXACT BIGINT power sums of the CENTERED, micro-cent-
    QUANTIZED deviations: dev_q = floor((mean_b − point_mean)·10³ +
    0.5) — floor/multiply are IEEE-exact, Σdev_q and Σdev_q² are
    integers, and Var = ((Σq² − (Σq)²/B)/(B−1))/10⁶ is one fixed
    float expression (the bigram-surprisal integer-quantization
    discipline; the 10⁻³-cent quantization bias is ~1e-7/12 cents² —
    documented noise, zero parity risk). The first draft used
    double→DECIMAL(28,12) power sums of the RAW means and the sf0.1
    scale sweep caught it: Spark's double→DECIMAL cast routes through
    the shortest string repr (≤17 significant digits, ZERO-PADDED
    beyond) while DuckDB expands the true binary value, so that cast
    is bit-identical only while int_digits + scale ≲ 15 — mean² terms
    at ~1e9 × scale 12 sit at 22 and diverged in the 11th decimal.
    Centering + integer quantization removes the cast entirely.
    Overflow: Σdev_q² ≤ B·(5.6e7)² ≈ 2e17 fits BIGINT with 45× head-
    room; dev_q is bounded by the cents domain, not the row count, so
    the bound is SF-invariant.

    Scale: the ×B row explosion collapses immediately into the
    (type, b) partial agg — map-side combine means the shuffle carries
    |types|·B rows, not N·B; the order-statistic window runs over B
    rows per type. Σw·cents fits BIGINT to ~1e14 rows·cents; past that
    both engines fail loudly (ANSI overflow)."""
    return _bootstrap_ci_plan(spark, sf_dir, _BOOT_B)


def _bootstrap_ci_plan(
    spark: SparkSession,
    sf_dir: str,
    b_resamples: int,
    means_only: bool = False,
):
    """B-parametrized core of :func:`stats_bootstrap_ci_mean` —
    factored so ``tools/scale_curve.py``'s ``bootstrap_B`` family can
    measure the B-knob's cost curve on the REAL plan (the registered
    query is exactly ``b_resamples=_BOOT_B``). ``means_only`` stops at
    the per-resample means (the shuffle-carrying grain) so the curve
    can count shuffle rows without paying the window stage twice."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    point = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias(
            "point_mean_cents"
        ),
    )
    rep = e.select(
        "event_type",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(b_resamples - 1))).alias("b"),
        "event_id",
    )
    u = (
        hex_hash(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("#"),
                F.col("b").cast("string"),
            ),
            seed=_BOOT_SEED,
        ).cast("double")
        / F.lit(_TWO60)
    )
    w = (
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .when(u < _POIS_CDF[4], 4)
        .otherwise(5)
        .cast("long")
    )
    per_b = (
        rep.select("event_type", "b", w.alias("w"), F.col("cents"))
        .groupBy("event_type", "b")
        .agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("cents")).alias("swc"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "event_type",
            "b",
            (F.col("swc").cast("double") / F.col("sw").cast("double")).alias(
                "mean_b"
            ),
        )
    )
    if means_only:
        return per_b
    wrk = Window.partitionBy("event_type").orderBy(
        F.col("mean_b").asc(), F.col("b").asc()
    )
    lo_rank = -(-25 * b_resamples // 1000)  # ceil(0.025*B)
    hi_rank = -(-975 * b_resamples // 1000)  # ceil(0.975*B)
    dev_q = F.floor(
        (F.col("mean_b") - F.col("point_mean_cents")) * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    ranked = per_b.join(F.broadcast(point), "event_type").select(
        "event_type",
        "n",
        "point_mean_cents",
        "mean_b",
        dev_q.alias("dev_q"),
        F.row_number().over(wrk).alias("rn"),
    )
    agg = ranked.groupBy("event_type", "n", "point_mean_cents").agg(
        F.min(F.when(F.col("rn") == lo_rank, F.col("mean_b"))).alias(
            "ci_lo_cents"
        ),
        F.min(F.when(F.col("rn") == hi_rank, F.col("mean_b"))).alias(
            "ci_hi_cents"
        ),
        F.sum("dev_q").alias("s1"),
        F.sum(F.col("dev_q") * F.col("dev_q")).alias("s2"),
        F.count(F.lit(1)).alias("n_b"),
    )
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    nb = F.col("n_b").cast("double")
    boot_se = (
        F.sqrt((s2 - s1 * s1 / nb) / (nb - F.lit(1.0))) / F.lit(1000.0)
    )
    return agg.select(
        "event_type",
        "n",
        "point_mean_cents",
        "ci_lo_cents",
        "ci_hi_cents",
        boot_se.alias("boot_se_cents"),
    )


def _boot_sql() -> str:
    cdf = _POIS_CDF
    lo_rank = -(-25 * _BOOT_B // 1000)
    hi_rank = -(-975 * _BOOT_B // 1000)
    return f"""
WITH e AS (
  SELECT event_id, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
point AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS point_mean_cents
  FROM e GROUP BY event_type
),
rep AS (
  SELECT event_type, cents, b.b, event_id
  FROM e, (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b
),
weighted AS (
  SELECT event_type, b, cents,
         CASE WHEN u < CAST({cdf[0]!r} AS DOUBLE) THEN 0
              WHEN u < CAST({cdf[1]!r} AS DOUBLE) THEN 1
              WHEN u < CAST({cdf[2]!r} AS DOUBLE) THEN 2
              WHEN u < CAST({cdf[3]!r} AS DOUBLE) THEN 3
              WHEN u < CAST({cdf[4]!r} AS DOUBLE) THEN 4
              ELSE 5 END AS w
  FROM (
    SELECT *,
           CAST(CAST(concat('0x', substr(md5(concat('{_BOOT_SEED}',
                 CAST(event_id AS VARCHAR), '#', CAST(b AS VARCHAR))), 1, 15))
               AS BIGINT) AS DOUBLE) / CAST({_TWO60!r} AS DOUBLE) AS u
    FROM rep
  )
),
per_b AS (
  SELECT event_type, b,
         CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_b
  FROM weighted GROUP BY event_type, b
  HAVING SUM(w) > 0
),
ranked AS (
  SELECT per_b.event_type, point.n, point.point_mean_cents, mean_b,
         CAST(FLOOR((mean_b - point.point_mean_cents) * CAST(1000.0 AS DOUBLE)
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS dev_q,
         ROW_NUMBER() OVER (PARTITION BY per_b.event_type
                            ORDER BY mean_b ASC, b ASC) AS rn
  FROM per_b JOIN point ON per_b.event_type = point.event_type
),
agg AS (
  SELECT event_type, n, point_mean_cents,
         MIN(CASE WHEN rn = {lo_rank} THEN mean_b END) AS ci_lo_cents,
         MIN(CASE WHEN rn = {hi_rank} THEN mean_b END) AS ci_hi_cents,
         CAST(SUM(dev_q) AS BIGINT) AS s1,
         CAST(SUM(dev_q * dev_q) AS BIGINT) AS s2,
         CAST(COUNT(*) AS BIGINT) AS n_b
  FROM ranked GROUP BY event_type, n, point_mean_cents
)
SELECT event_type, n, point_mean_cents,
       ci_lo_cents, ci_hi_cents,
       sqrt((CAST(s2 AS DOUBLE)
             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n_b AS DOUBLE))
            / (CAST(n_b AS DOUBLE) - CAST(1.0 AS DOUBLE)))
       / CAST(1000.0 AS DOUBLE) AS boot_se_cents
FROM agg
"""


STATS_BOOTSTRAP_CI_MEAN_SQL = _boot_sql()


def stats_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of the DAILY EVENT VOLUME per event type
    — the median of all pairwise slopes, the estimator that shrugs off
    the single corrupted day that drags OLS (29% breakdown point vs
    0%); the ``ols_slope`` column ships alongside as the contrast the
    runbook shows when the two disagree. The volume trend per type is
    the capacity-planning / incident signal (error-rate creep, traffic
    decay) a streaming platform fits continuously.

    Exactness: the series collapses to the DAY grain first (bounded —
    the KS/chi2 validity discipline: pairwise enumeration happens on
    the ~O(days²) bounded grain, never on raw rows), each pairwise
    slope is ONE double division of exact BIGINTs, and the median is a
    pure ORDER STATISTIC (lower median, rank ⌈P/2⌉, total order
    (slope, x_i, x_j) — no float averaging). The OLS contrast uses
    exact integer moment sums combined in one fixed float expression
    (the ``stats_corr_ols`` discipline). Σx·Σxy products fit BIGINT
    for series to ~50k days; far past any retention window."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("x"),
    )
    daily = e.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("y"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(b, (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.x") < F.col("b.x")))
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.x").alias("xi"),
            F.col("b.x").alias("xj"),
            (
                (F.col("b.y") - F.col("a.y")).cast("double")
                / (F.col("b.x") - F.col("a.x")).cast("double")
            ).alias("slope"),
        )
    )
    wrk = Window.partitionBy("event_type").orderBy("slope", "xi", "xj")
    wcnt = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(wcnt).alias("n_pairs"),
    )
    lower_median_rank = F.floor((F.col("n_pairs") + 1) / 2).cast("long")
    ts = ranked.filter(F.col("rn") == lower_median_rank).select(
        "event_type", "n_pairs", F.col("slope").alias("theilsen_slope")
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    ols = (
        (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return mom.join(ts, "event_type").select(
        "event_type",
        "n_days",
        "n_pairs",
        "theilsen_slope",
        ols.alias("ols_slope"),
    )


STATS_THEILSEN_TREND_SQL = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
),
pairs AS (
  SELECT a.event_type, a.x AS xi, b.x AS xj,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.x < b.x
),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY slope, xi, xj) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
  FROM pairs
),
ts AS (
  SELECT event_type, n_pairs, slope AS theilsen_slope
  FROM ranked WHERE rn = (n_pairs + 1) // 2
),
mom AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM daily GROUP BY event_type
)
SELECT mom.event_type, n_days, n_pairs, theilsen_slope,
       CAST(n_days * sxy - sx * sy AS DOUBLE)
       / CAST(n_days * sxx - sx * sx AS DOUBLE) AS ols_slope
FROM mom JOIN ts ON mom.event_type = ts.event_type
"""


def stats_gtest_dow_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio) independence statistic for the
    (day-of-week × event-type) contingency table — the log-family
    sibling of ``stats_chi2_dow_type`` (additive over cells, the form
    hierarchical log-linear models decompose; preferred over χ² when
    any O/E ratio is far from 1). Per cell: G-term = 2·O·ln(O·T/(r·c)),
    an exact-integer-ratio log via ``det_ln_ratio``; zero-observed
    cells contribute 0 and never materialize (the grain holds observed
    cells only). The global G rides on every row via a window sum of
    the MICRO-QUANTIZED terms — g_q = floor(g_term·10⁶ + 0.5) summed
    as BIGINT, then /10⁶ (the bootstrap-SE integer-quantization
    discipline): g_term grows with event counts, and a raw
    double→DECIMAL(28,12) cast is bit-identical across engines only
    while int_digits + scale ≲ 15 significant digits — terms past ~1e3
    would break parity in the low decimals. floor/·10⁶ are IEEE-exact
    on the bit-identical det_ln product — PROVIDED each g_term·10⁶
    stays below 2^53 (g_term ≲ 9e9), the double-representability bound
    for the micro-quantized integer; beyond it the intermediate double
    silently coarsens the quantization grain in that cell (both engines
    coarsen IDENTICALLY — same IEEE ops — so cross-engine determinism
    survives, but the stated ≤5e-7 per-cell bias does not). A single
    cell's g_term = 2·O·ln(O·T/(r·c)) can cross 9e9 well before the
    BIGINT-overflow event count in heavily skewed tables (e.g. one
    cell holding ~2e8 events at an O/E ratio of e¹⁰), so the honest
    validity window is min(per-term 2^53/10⁶ representability,
    O·T BIGINT/det_ln 2^62) — the BIGINT sum itself keeps ~70×
    headroom (Σ|g_q| ≤ 2·T·lnT·10⁶ ≈ 1.3e17 at ~3e9 events). Past
    either bound, scale the quantum down (10⁴) or widen the operands;
    the integer casts fail loudly, the representability bound does
    not — check max(g_term) when auditing extreme skew. Quantization
    bias ≤ 5e-7 per cell inside the window, identical on both engines
    by construction. dof = (7−1)(|types|−1) from the same marginal
    aggs."""
    e = load_table(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).alias("dow"), "event_type"
    )
    cell = e.groupBy("dow", "event_type").agg(F.count(F.lit(1)).alias("o"))
    rtot = e.groupBy("dow").agg(F.count(F.lit(1)).alias("r"))
    ctot = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = e.agg(F.count(F.lit(1)).alias("t"))
    j = (
        cell.join(F.broadcast(rtot), "dow")
        .join(F.broadcast(ctot), "event_type")
        .join(F.broadcast(tot))
    )
    g_term = (
        F.lit(2.0)
        * F.col("o").cast("double")
        * det_ln_ratio(F.col("o") * F.col("t"), F.col("r") * F.col("c"))
    )
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_dow = F.size(F.collect_set("dow").over(wall))
    n_typ = F.size(F.collect_set("event_type").over(wall))
    return j.select(
        "dow",
        "event_type",
        F.col("o").alias("observed"),
        (
            (F.col("r") * F.col("c")).cast("double")
            / F.col("t").cast("double")
        ).alias("expected"),
        g_term.alias("g_term"),
        (
            F.sum(
                F.floor(g_term * F.lit(1000000.0) + F.lit(0.5)).cast("long")
            )
            .over(wall)
            .cast("double")
            / F.lit(1000000.0)
        ).alias("g_stat"),
        ((n_dow - F.lit(1)) * (n_typ - F.lit(1))).cast("long").alias("dof"),
    )


def _gtest_sql() -> str:
    return f"""
WITH e AS (
  SELECT date_part('dow', ts) AS dow, event_type FROM events
),
cell AS (SELECT dow, event_type, CAST(COUNT(*) AS BIGINT) AS o
         FROM e GROUP BY dow, event_type),
rtot AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS r FROM e GROUP BY dow),
ctot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
         FROM e GROUP BY event_type),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM e),
t0 AS (
  SELECT cell.dow, cell.event_type, o, r, c, t,
         o * t AS a1, r * c AS b1
  FROM cell JOIN rtot USING (dow) JOIN ctot USING (event_type), tot
),
l1 AS (SELECT *, {ln_e_sql("a1", "b1")} AS e1 FROM t0),
l2 AS (SELECT *, {ln_m_sql("a1", "b1", "e1")} AS m1 FROM l1),
l3 AS (SELECT *, {ln_z_sql("m1")} AS z1 FROM l2),
l4 AS (SELECT *, z1 * z1 AS w1 FROM l3),
terms AS (
  SELECT dow, event_type, o, r, c, t,
         CAST(2.0 AS DOUBLE) * CAST(o AS DOUBLE) * {ln_val_sql("e1", "z1", "w1")} AS g_term
  FROM l4
)
SELECT dow, event_type, o AS observed,
       CAST(r * c AS DOUBLE) / CAST(t AS DOUBLE) AS expected,
       g_term,
       CAST(SUM(CAST(FLOOR(g_term * 1000000.0 + 0.5) AS BIGINT)) OVER ()
            AS DOUBLE) / 1000000.0 AS g_stat,
       CAST((COUNT(DISTINCT dow) OVER () - 1)
            * (COUNT(DISTINCT event_type) OVER () - 1) AS BIGINT) AS dof
FROM terms
"""


STATS_GTEST_DOW_TYPE_SQL = _gtest_sql()


# --- Deterministic-hash Laplace release (DP mechanism shape) -----------
_DP_SEED = "dplap"
_DP_EPSILON = 1.0
_TWO59 = 1 << 59
_TWO60_INT = 1 << 60


def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release for the (event_type, day)
    histogram — the ε-differential-privacy OUTPUT SHAPE (sensitivity-1
    counts + Laplace(1/ε) noise, ε = {eps}) that completes the privacy
    family (k-anonymity/l-diversity/t-closeness audit the inputs; this
    is the noisy-release side). THE NOISE HERE IS A DETERMINISTIC HASH
    SUBSTITUTE, NOT PRIVACY: md5-uniform u → inverse Laplace CDF —
    deterministic so the release is oracle-checkable and retry-stable
    in tests; a production deployment swaps ONE expression (the hash
    uniform) for a calibrated RNG draw and keeps everything else.

    The inverse CDF's log is ``det_ln_ratio`` on the EXACT DYADIC
    RATIONAL the hash provides: u = h/2^60, 1−2|u−½| = (2^60−2|h−2^59|)
    / 2^60 — an integer ratio, floored at 1/2^60 to dodge ln 0 (the
    one-in-2^59 hash value that would blow up). Grain is bounded
    (|types|×days); one scan, one hash agg, map-side noise."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    cell = e.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    h = hex_hash(
        F.concat(F.col("event_type"), F.lit("|"), F.col("day").cast("string")),
        seed=_DP_SEED,
    )
    num = F.greatest(
        F.lit(1).cast("long"),
        F.lit(_TWO60_INT) - F.lit(2) * F.abs(h - F.lit(_TWO59)),
    )
    sgn = F.when(h >= _TWO59, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = (
        F.lit(-1.0 / _DP_EPSILON)
        * sgn
        * det_ln_ratio(num, F.lit(_TWO60_INT))
    )
    return cell.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        (F.col("n").cast("double") + noise).alias("noisy_count"),
        F.lit(_DP_EPSILON).alias("epsilon"),
    )


privacy_dp_counts.__doc__ = privacy_dp_counts.__doc__.format(eps=_DP_EPSILON)


def _dp_sql() -> str:
    h = (
        f"CAST(concat('0x', substr(md5(concat('{_DP_SEED}', event_type, '|', "
        f"CAST(day AS VARCHAR))), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH cell AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
t0 AS (
  SELECT *, {h} AS h FROM cell
),
t1 AS (
  SELECT *,
         GREATEST(CAST(1 AS BIGINT),
                  CAST({_TWO60_INT} AS BIGINT)
                  - 2 * ABS(h - CAST({_TWO59} AS BIGINT))) AS num,
         CASE WHEN h >= CAST({_TWO59} AS BIGINT)
              THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sgn
  FROM t0
),
l1 AS (SELECT *, {ln_e_sql("num", str(_TWO60_INT))} AS e1 FROM t1),
l2 AS (SELECT *, {ln_m_sql("num", str(_TWO60_INT), "e1")} AS m1 FROM l1),
l3 AS (SELECT *, {ln_z_sql("m1")} AS z1 FROM l2),
l4 AS (SELECT *, z1 * z1 AS w1 FROM l3)
SELECT event_type, CAST(day AS VARCHAR) AS day,
       CAST(n AS DOUBLE)
       + CAST({-1.0 / _DP_EPSILON!r} AS DOUBLE) * sgn
         * {ln_val_sql("e1", "z1", "w1")} AS noisy_count,
       CAST({_DP_EPSILON!r} AS DOUBLE) AS epsilon
FROM l4
"""


PRIVACY_DP_COUNTS_SQL = _dp_sql()


QUERIES = {
    "stats_mannwhitney_value": stats_mannwhitney_value,
    "stats_psi_value_drift": stats_psi_value_drift,
    "stats_bootstrap_ci_mean": stats_bootstrap_ci_mean,
    "stats_theilsen_trend": stats_theilsen_trend,
    "stats_gtest_dow_type": stats_gtest_dow_type,
    "privacy_dp_counts": privacy_dp_counts,
    "stats_mad_outliers": stats_mad_outliers,
    "stats_autocorrelation": stats_autocorrelation,
    "value_decile_assignment": value_decile_assignment,
    "stats_benford_prices": stats_benford_prices,
    "stats_seasonal_outliers": stats_seasonal_outliers,
    "survival_km_order_gaps": survival_km_order_gaps,
    "tv_distance_source_mix": tv_distance_source_mix,
    "stats_ks_value_drift": stats_ks_value_drift,
    "stats_chi2_dow_type": stats_chi2_dow_type,
    "privacy_l_diversity": privacy_l_diversity,
    "basket_lift_pairs": basket_lift_pairs,
    "gini_balance_by_nation": gini_balance_by_nation,
    "ab_test_first_touch": ab_test_first_touch,
    "stats_corr_ols": stats_corr_ols,
    "privacy_k_anonymity": privacy_k_anonymity,
    "stats_cusum_changepoint": stats_cusum_changepoint,
    "privacy_t_closeness": privacy_t_closeness,
    "forecast_seasonal_naive_backtest": forecast_seasonal_naive_backtest,
}

ORACLES = {
    "stats_mannwhitney_value": STATS_MANNWHITNEY_VALUE_SQL,
    "stats_psi_value_drift": STATS_PSI_VALUE_DRIFT_SQL,
    "stats_bootstrap_ci_mean": STATS_BOOTSTRAP_CI_MEAN_SQL,
    "stats_theilsen_trend": STATS_THEILSEN_TREND_SQL,
    "stats_gtest_dow_type": STATS_GTEST_DOW_TYPE_SQL,
    "privacy_dp_counts": PRIVACY_DP_COUNTS_SQL,
    "stats_mad_outliers": STATS_MAD_OUTLIERS_SQL,
    "stats_autocorrelation": STATS_AUTOCORRELATION_SQL,
    "value_decile_assignment": VALUE_DECILE_ASSIGNMENT_SQL,
    "stats_benford_prices": STATS_BENFORD_PRICES_SQL,
    "stats_seasonal_outliers": STATS_SEASONAL_OUTLIERS_SQL,
    "survival_km_order_gaps": SURVIVAL_KM_SQL,
    "tv_distance_source_mix": TV_DISTANCE_SOURCE_MIX_SQL,
    "stats_ks_value_drift": STATS_KS_VALUE_DRIFT_SQL,
    "stats_chi2_dow_type": STATS_CHI2_DOW_TYPE_SQL,
    "privacy_l_diversity": PRIVACY_L_DIVERSITY_SQL,
    "stats_corr_ols": STATS_CORR_OLS_SQL,
    "privacy_k_anonymity": PRIVACY_K_ANONYMITY_SQL,
    "stats_cusum_changepoint": STATS_CUSUM_SQL,
    "ab_test_first_touch": AB_TEST_FIRST_TOUCH_SQL,
    "basket_lift_pairs": BASKET_LIFT_PAIRS_SQL,
    "gini_balance_by_nation": GINI_BALANCE_BY_NATION_SQL,
    "privacy_t_closeness": PRIVACY_T_CLOSENESS_SQL,
    "forecast_seasonal_naive_backtest": FORECAST_SEASONAL_NAIVE_SQL,
}
