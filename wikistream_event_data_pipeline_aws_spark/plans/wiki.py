"""Wiki-pipeline gold-layer semantics re-expressed over the synthetic
``events`` table (FIXTURES.md maps events -> silver.cleaned_events).

Reference parity (citations into /root/reference):
- ``hourly_stats``       <- gold hourly aggregation, ``spark/jobs/gold_batch_job.py:68-121`` (A1)
- ``user_daily_metrics`` <- per-user daily metrics + HAVING,
                            ``gold_batch_job.py:137-164`` (A2)
- ``risk_scores``        <- piecewise CASE risk ladder -> 0-100 score/band/alert,
                            ``gold_batch_job.py:169-247`` (A3)
- ``daily_summary``      <- 2-CTE rollup + analytic peak-hour window + left join,
                            ``gold_batch_job.py:252-402`` (A4, W1, J1)
- ``top_risk_alerts``    <- ORDER BY risk DESC LIMIT k report query,
                            ``gold_batch_job.py:728-735`` (O1)

All plans are pure DataFrame compositions — Catalyst handles pushdown,
partial aggregation and (for the tiny per-day join) broadcast; at 100 TB
the groupBy keys (event_date, event_hour) give bounded cardinality so
the shuffle reduces to near-nothing after map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

# -- shared projection ------------------------------------------------------


def with_time_cols(e: DataFrame) -> DataFrame:
    """Derived partition-style columns (reference P7,
    ``bronze_streaming_job.py:220-221``)."""
    return e.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd")).withColumn(
        "event_hour", F.hour("ts")
    )


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_time_cols(load_table(spark, sf_dir, "events"))


_EVENTS_TIME_SQL = """
    SELECT *, strftime(ts, '%Y-%m-%d') AS event_date,
           CAST(hour(ts) AS INTEGER) AS event_hour
    FROM events
"""

# -- A1: hourly stats (flagship) --------------------------------------------


def hourly_stats_df(e: DataFrame) -> DataFrame:
    """A1 aggregation over any events-shaped frame with time columns."""
    dec_value = F.col("value").cast("decimal(18,2)")
    n = F.count(F.lit(1))

    def n_type(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")

    return (
        e.groupBy("event_date", "event_hour")
        .agg(
            n.alias("total_events"),
            F.countDistinct("user_id").alias("unique_users"),
            n_type("click"),
            n_type("view"),
            n_type("purchase"),
            n_type("signup"),
            n_type("error"),
            F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).alias("high_value_events"),
            F.sum(dec_value).cast("double").alias("sum_value"),
            (F.sum(dec_value).cast("double") / n).alias("avg_value"),
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
                / n
            ).alias("error_pct"),
        )
    )


def hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_stats_df(events_with_time(spark, sf_dir))


HOURLY_STATS_SQL = f"""
SELECT event_date, event_hour,
       COUNT(*) AS total_events,
       COUNT(DISTINCT user_id) AS unique_users,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS high_value_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
       CAST(100.0 AS DOUBLE) * SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           / COUNT(*) AS error_pct
FROM ({_EVENTS_TIME_SQL})
GROUP BY event_date, event_hour
"""

# -- A2: per-user daily metrics ----------------------------------------------


def user_daily_metrics_df(e: DataFrame) -> DataFrame:
    """A2 aggregation over any events-shaped frame with time columns."""
    e = e.filter(F.col("user_id").isNotNull())
    dec_value = F.col("value").cast("decimal(18,2)")
    out = (
        e.groupBy("event_date", "user_id")
        .agg(
            F.count(F.lit(1)).alias("total_actions"),
            (F.count(F.lit(1)) / F.lit(24.0)).alias("actions_per_hour"),
            F.countDistinct("event_hour").alias("active_hours"),
            (F.max("event_hour") - F.min("event_hour") + F.lit(1)).alias("hour_span"),
            F.countDistinct("event_type").alias("distinct_event_types"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("purchases"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
            F.sum(dec_value).cast("double").alias("sum_value"),
            F.min("event_hour").alias("first_seen_hour"),
        )
        .filter(F.col("total_actions") >= 5)
    )
    return out


def user_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_daily_metrics_df(events_with_time(spark, sf_dir))


USER_DAILY_METRICS_SQL = f"""
SELECT event_date, user_id,
       COUNT(*) AS total_actions,
       COUNT(*) / CAST(24.0 AS DOUBLE) AS actions_per_hour,
       COUNT(DISTINCT event_hour) AS active_hours,
       CAST(MAX(event_hour) - MIN(event_hour) + 1 AS INTEGER) AS hour_span,
       COUNT(DISTINCT event_type) AS distinct_event_types,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(MIN(event_hour) AS INTEGER) AS first_seen_hour
FROM ({_EVENTS_TIME_SQL})
WHERE user_id IS NOT NULL
GROUP BY event_date, user_id
HAVING COUNT(*) >= 5
"""

# -- A3: risk scoring ladder --------------------------------------------------

# Threshold constants mirror the reference's RISK_THRESHOLDS block
# (gold_batch_job.py:33-38, config/settings.py:136-150), adapted to the
# synthetic events domain.
VELOCITY_T = (4.0, 2.0, 1.0)
ERROR_T = (5, 2)


def _risk_projection(um: DataFrame) -> DataFrame:
    velocity = (
        F.when(F.col("actions_per_hour") > VELOCITY_T[0], 40)
        .when(F.col("actions_per_hour") > VELOCITY_T[1], 25)
        .when(F.col("actions_per_hour") > VELOCITY_T[2], 10)
        .otherwise(0)
    )
    err = (
        F.when(F.col("errors") >= ERROR_T[0], 30)
        .when(F.col("errors") >= ERROR_T[1], 15)
        .otherwise(0)
    )
    spread = F.when(F.col("distinct_event_types") >= 4, 15).otherwise(0)
    spend = F.when(F.col("sum_value") > F.lit(1000.0), 15).otherwise(0)
    score = F.least(F.lit(100), F.greatest(F.lit(0), velocity + err + spread + spend))
    return (
        um.withColumn("velocity_score", velocity)
        .withColumn("error_score", err)
        .withColumn("spread_score", spread)
        .withColumn("spend_score", spend)
        .withColumn("risk_score", score)
        .withColumn(
            "risk_level",
            F.when(score >= 70, "HIGH").when(score >= 40, "MEDIUM").otherwise("LOW"),
        )
        .withColumn("alert", score >= 70)
        .select(
            "event_date",
            "user_id",
            "total_actions",
            "velocity_score",
            "error_score",
            "spread_score",
            "spend_score",
            "risk_score",
            "risk_level",
            "alert",
        )
    )


def risk_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _risk_projection(user_daily_metrics(spark, sf_dir))


_RISK_CORE_SQL = f"""
WITH um AS ({USER_DAILY_METRICS_SQL}),
scored AS (
  SELECT event_date, user_id, total_actions,
         CASE WHEN actions_per_hour > 4.0 THEN 40
              WHEN actions_per_hour > 2.0 THEN 25
              WHEN actions_per_hour > 1.0 THEN 10
              ELSE 0 END AS velocity_score,
         CASE WHEN errors >= 5 THEN 30
              WHEN errors >= 2 THEN 15
              ELSE 0 END AS error_score,
         CASE WHEN distinct_event_types >= 4 THEN 15 ELSE 0 END AS spread_score,
         CASE WHEN sum_value > CAST(1000.0 AS DOUBLE) THEN 15 ELSE 0 END AS spend_score
  FROM um
)
SELECT event_date, user_id, total_actions,
       velocity_score, error_score, spread_score, spend_score,
       LEAST(100, GREATEST(0, velocity_score + error_score + spread_score + spend_score)) AS risk_score,
       CASE WHEN LEAST(100, GREATEST(0, velocity_score + error_score + spread_score + spend_score)) >= 70 THEN 'HIGH'
            WHEN LEAST(100, GREATEST(0, velocity_score + error_score + spread_score + spend_score)) >= 40 THEN 'MEDIUM'
            ELSE 'LOW' END AS risk_level,
       LEAST(100, GREATEST(0, velocity_score + error_score + spread_score + spend_score)) >= 70 AS alert
FROM scored
"""

RISK_SCORES_SQL = _RISK_CORE_SQL

# -- A4: daily summary (2-CTE rollup + W1 window + J1 left join) -------------


def daily_summary_df(e: DataFrame, risk: DataFrame) -> DataFrame:
    """A4/W1/J1 over any events-shaped frame + a risk_scores frame."""
    # W1: analytic count per (date, hour) then MAX per date = peak-hour volume
    w = Window.partitionBy("event_date", "event_hour")
    hour_counts = e.withColumn("hour_events", F.count(F.lit(1)).over(w))
    dec_value = F.col("value").cast("decimal(18,2)")
    daily_base = hour_counts.groupBy("event_date").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").alias("unique_users"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("purchases"),
        F.sum(dec_value).cast("double").alias("sum_value"),
        F.max("hour_events").alias("peak_hour_events"),
    )
    risk_summary = risk.groupBy("event_date").agg(
        F.sum(F.when(F.col("risk_level") == "HIGH", 1).otherwise(0)).alias("high_risk_users"),
        F.sum(F.when(F.col("risk_level") == "MEDIUM", 1).otherwise(0)).alias("medium_risk_users"),
        F.max("risk_score").alias("max_risk_score"),
    )
    joined = daily_base.alias("d").join(
        F.broadcast(risk_summary.alias("r")), on="event_date", how="left"
    )
    error_rate = (
        F.lit(100.0) * F.col("errors") / F.nullif(F.col("total_events"), F.lit(0))
    )
    health = F.least(
        F.lit(100.0),
        F.greatest(
            F.lit(0.0),
            F.lit(100.0)
            - error_rate * F.lit(2.0)
            - F.coalesce(F.col("high_risk_users"), F.lit(0)) * F.lit(5.0),
        ),
    )
    return joined.select(
        "event_date",
        "total_events",
        "unique_users",
        "errors",
        "purchases",
        "sum_value",
        "peak_hour_events",
        F.coalesce(F.col("high_risk_users"), F.lit(0)).alias("high_risk_users"),
        F.coalesce(F.col("medium_risk_users"), F.lit(0)).alias("medium_risk_users"),
        F.coalesce(F.col("max_risk_score"), F.lit(0)).alias("max_risk_score"),
        error_rate.alias("error_rate_pct"),
        health.alias("platform_health_score"),
    )


def daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_summary_df(
        events_with_time(spark, sf_dir), risk_scores(spark, sf_dir)
    )


DAILY_SUMMARY_SQL = f"""
WITH base AS (
  SELECT *, COUNT(*) OVER (PARTITION BY event_date, event_hour) AS hour_events
  FROM ({_EVENTS_TIME_SQL})
),
daily_base AS (
  SELECT event_date,
         COUNT(*) AS total_events,
         COUNT(DISTINCT user_id) AS unique_users,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         MAX(hour_events) AS peak_hour_events
  FROM base GROUP BY event_date
),
risk AS ({_RISK_CORE_SQL}),
risk_summary AS (
  SELECT event_date,
         CAST(SUM(CASE WHEN risk_level = 'HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_risk_users,
         CAST(SUM(CASE WHEN risk_level = 'MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium_risk_users,
         MAX(risk_score) AS max_risk_score
  FROM risk GROUP BY event_date
)
SELECT d.event_date, d.total_events, d.unique_users, d.errors, d.purchases,
       d.sum_value, d.peak_hour_events,
       COALESCE(r.high_risk_users, 0) AS high_risk_users,
       COALESCE(r.medium_risk_users, 0) AS medium_risk_users,
       COALESCE(r.max_risk_score, 0) AS max_risk_score,
       CAST(100.0 AS DOUBLE) * d.errors / NULLIF(d.total_events, 0) AS error_rate_pct,
       LEAST(CAST(100.0 AS DOUBLE),
             GREATEST(CAST(0.0 AS DOUBLE),
                      CAST(100.0 AS DOUBLE)
                      - (CAST(100.0 AS DOUBLE) * d.errors / NULLIF(d.total_events, 0)) * CAST(2.0 AS DOUBLE)
                      - COALESCE(r.high_risk_users, 0) * CAST(5.0 AS DOUBLE))) AS platform_health_score
FROM daily_base d LEFT JOIN risk_summary r ON d.event_date = r.event_date
"""

# -- O1: top-k alerts ---------------------------------------------------------


def top_risk_alerts(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    r = risk_scores(spark, sf_dir)
    # deterministic tiebreak so LIMIT k is well-defined across engines
    return (
        r.filter(F.col("risk_score") >= 40)
        .orderBy(
            F.col("risk_score").desc(),
            F.col("total_actions").desc(),
            F.col("event_date").asc(),
            F.col("user_id").asc(),
        )
        .limit(k)
    )


TOP_RISK_ALERTS_SQL = f"""
SELECT * FROM ({_RISK_CORE_SQL})
WHERE risk_score >= 40
ORDER BY risk_score DESC, total_actions DESC, event_date ASC, user_id ASC
LIMIT 10
"""


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: per user, the earliest view, the earliest
    click strictly AFTER that view, and the earliest purchase strictly
    after that click — the ordered-pattern operator behind conversion
    metrics. Three chained conditional-min aggregations on the user key
    (each stage needs the previous stage's timestamp, so the
    data-dependency depth — not the operator — forces three keyed
    passes); all joins are on user_id, hash-shuffled, no window, no
    ordering. Output: users reaching each stage and median-free stage
    conversion counts per event-date cohort of the first view."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2.select("user_id", "t_click"), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    funnel = (
        t1.join(t2.select("user_id", "t_click"), "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            F.date_format("t_view", "yyyy-MM-dd").alias("cohort_date"),
            "t_click",
            "t_purchase",
        )
    )
    return funnel.groupBy("cohort_date").agg(
        F.count(F.lit(1)).alias("n_viewed"),
        F.count("t_click").alias("n_clicked"),
        F.count("t_purchase").alias("n_purchased"),
    )


FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t_view
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
  GROUP BY e.user_id
)
SELECT strftime(t1.t_view, '%Y-%m-%d') AS cohort_date,
       CAST(COUNT(*) AS BIGINT) AS n_viewed,
       CAST(COUNT(t2.t_click) AS BIGINT) AS n_clicked,
       CAST(COUNT(t3.t_purchase) AS BIGINT) AS n_purchased
FROM t1
LEFT JOIN t2 ON t1.user_id = t2.user_id
LEFT JOIN t3 ON t1.user_id = t3.user_id
GROUP BY 1
"""


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency distribution of the funnel: for users completing
    view→click→purchase, exact rank-based quartiles of the
    view-to-purchase time per first-view-date cohort. Same chained
    conditional-min funnel as ``funnel_view_click_purchase`` (inner
    joins — converters only); quartiles are ORDER STATISTICS
    (element ``ceil(q·n)`` by ``(delta, user_id)``), not interpolated,
    so the integer microsecond deltas stay exact. The quantile window
    partitions on the cohort date — bounded cardinality, no global
    sort."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    conv = (
        t1.join(t3, "user_id")
        .select(
            "user_id",
            F.date_format("t_view", "yyyy-MM-dd").alias("cohort_date"),
            (F.unix_micros("t_purchase") - F.unix_micros("t_view")).alias("delta_us"),
        )
    )
    w = Window.partitionBy("cohort_date").orderBy(
        F.col("delta_us").asc(), F.col("user_id").asc()
    )
    nw = Window.partitionBy("cohort_date")
    ranked = conv.select(
        "cohort_date",
        "delta_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(nw).alias("n"),
    )

    def q_at(q, name):
        return F.min(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * F.lit(q)).cast("bigint"),
                F.col("delta_us"),
            )
        ).alias(name)

    return ranked.groupBy("cohort_date").agg(
        F.max("n").alias("n_converted"),
        q_at(0.25, "p25_us"),
        q_at(0.50, "p50_us"),
        q_at(0.75, "p75_us"),
    )


FUNNEL_TIME_TO_CONVERT_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t_view
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
  GROUP BY e.user_id
),
conv AS (
  SELECT t1.user_id,
         strftime(t1.t_view, '%Y-%m-%d') AS cohort_date,
         epoch_us(t3.t_purchase) - epoch_us(t1.t_view) AS delta_us
  FROM t1 JOIN t3 ON t1.user_id = t3.user_id
),
ranked AS (
  SELECT cohort_date, delta_us,
         ROW_NUMBER() OVER (PARTITION BY cohort_date
                            ORDER BY delta_us, user_id) AS rn,
         COUNT(*) OVER (PARTITION BY cohort_date) AS n
  FROM conv
)
SELECT cohort_date,
       MAX(n) AS n_converted,
       MIN(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN delta_us END) AS p25_us,
       MIN(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN delta_us END) AS p50_us,
       MIN(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN delta_us END) AS p75_us
FROM ranked GROUP BY cohort_date
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    date; for each later day-offset, how many of that cohort were
    active — the operator behind every retention dashboard. One min-agg
    for cohort assignment, one keyed join back to activity, one
    distinct-count per (cohort, offset) cell. Offsets capped at 7 so
    the matrix (and the driver compare) stays bounded; at scale the cap
    also bounds the join output to |activity| rows regardless of
    history depth."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    activity = e.distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    cells = (
        activity.join(cohorts, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort_d"))
        .filter(F.col("day_offset") <= 7)
    )
    return (
        cells.groupBy(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_date"),
            "day_offset",
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


RETENTION_COHORTS_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
cohorts AS (
  SELECT user_id, MIN(d) AS cohort_d FROM activity GROUP BY user_id
)
SELECT strftime(c.cohort_d, '%Y-%m-%d') AS cohort_date,
       CAST(date_diff('day', c.cohort_d, a.d) AS INTEGER) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
WHERE date_diff('day', c.cohort_d, a.d) <= 7
GROUP BY 1, 2
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event transition counts — the Markov-chain view of
    user behavior (what follows a view? what precedes an error?). One
    lag window partitioned BY USER and ordered by (ts, event_id) — the
    event_id tiebreak makes simultaneous events deterministic in both
    engines — then a hash aggregation on the (prev, next) pair. The
    window never crosses user partitions, so this scales exactly like
    any per-entity sessionization."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    return (
        pairs.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


EVENT_TRANSITION_MATRIX_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def event_trigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 sequence mining: counts of (e1, e2, e3) event-type
    trigrams per user timeline — the behavioral-motif extension of the
    order-2 transition matrix above. Both lags share ONE user window;
    output is at most |types|³ rows regardless of input size."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        e.withColumn("p1", F.lag("event_type", 1).over(w))
        .withColumn("p2", F.lag("event_type", 2).over(w))
        .filter(F.col("p2").isNotNull())
    )
    return (
        seq.groupBy(
            F.col("p2").alias("e1"),
            F.col("p1").alias("e2"),
            F.col("event_type").alias("e3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


EVENT_TRIGRAM_COUNTS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT p2 AS e1, p1 AS e2, event_type AS e3, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE p2 IS NOT NULL
GROUP BY 1, 2, 3
"""


def sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: encode each (user, day) timeline as a
    compact string of event-type initials (deterministically ordered by
    (ts, event_id)) and match behavioral patterns with plain regexes —
    ordered-subsequence detection (view … click … purchase), repeated
    errors, single-event bounces. Encoding collapses the row-pattern
    problem to per-group string ops: one (user, day) aggregation builds
    the sequence, then every pattern is a JVM-side ``rlike`` — no
    iterative joins, no per-pattern window passes, and adding a pattern
    costs one column. Daily sequences are bounded by per-user daily
    activity, so the encoded string stays small by construction."""
    e = load_table(spark, sf_dir, "events")
    per_day = (
        e.select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd").alias("d"),
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c")).alias(
                "ev"
            ),
        )
        .groupBy("user_id", "d")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("ev")), lambda s: s["c"]), ""
            ).alias("seq")
        )
    )
    return per_day.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.sum(F.col("seq").rlike("v.*c.*p").cast("int")).cast("bigint").alias(
            "n_browse_then_buy"
        ),
        F.sum(F.col("seq").rlike("e.*e").cast("int")).cast("bigint").alias(
            "n_repeat_errors"
        ),
        F.sum((F.length("seq") == 1).cast("int")).cast("bigint").alias("n_bounces"),
    )


SEQUENCE_PATTERN_MATCH_SQL = """
WITH per_day AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS d,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
)
SELECT d, COUNT(*) AS n_user_days,
       CAST(SUM(CASE WHEN regexp_matches(seq, 'v.*c.*p') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_browse_then_buy,
       CAST(SUM(CASE WHEN regexp_matches(seq, 'e.*e') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat_errors,
       CAST(SUM(CASE WHEN length(seq) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces
FROM per_day GROUP BY d
"""


_CHURN_SPLIT = "2024-01-24 00:00:00"  # observation window | outcome window
_CHURN_VALUE_MIN = 50  # qualifying-purchase threshold for the retention label


def churn_label_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set assembly for churn prediction — the label-builder
    shape every supervised pipeline runs: FEATURES from the observation
    window (activity counts, purchase counts, exact decimal spend,
    active days, recency at the split), LABEL from the disjoint outcome
    window (churned = no qualifying purchase after the split), joined with a left
    anti-ish pattern (left join + null flag, so retained users keep
    their outcome row). The time split — never a random split — is what
    prevents leakage in temporal prediction; features can only see
    pre-split data by construction. One agg per window + one keyed
    left join."""
    e = load_table(spark, sf_dir, "events")
    split = F.lit(_CHURN_SPLIT).cast("timestamp")
    w1 = e.filter(F.col("ts") < split)
    feats = w1.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.countDistinct(F.to_date("ts")).alias("n_active_days"),
        F.datediff(F.to_date(split), F.max(F.to_date("ts"))).alias("recency_days"),
    )
    # retention event: a QUALIFYING purchase (value > threshold) in the
    # outcome window — raw activity is near-universal in the synthetic
    # corpus, so labels would be degenerate; a value-gated conversion
    # keeps both classes populated at every scale factor
    active2 = (
        e.filter(
            (F.col("ts") >= split)
            & (F.col("event_type") == "purchase")
            & (F.col("value") > _CHURN_VALUE_MIN)
        )
        .select("user_id")
        .distinct()
        .withColumn("seen_after", F.lit(1))
    )
    return feats.join(active2, "user_id", "left").select(
        "user_id",
        "n_events",
        "n_purchases",
        "total_value",
        "n_active_days",
        "recency_days",
        F.col("seen_after").isNull().alias("churned"),
    )


CHURN_LABEL_FEATURES_SQL = f"""
WITH w1 AS (SELECT * FROM events WHERE ts < TIMESTAMP '{_CHURN_SPLIT}'),
feats AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         COUNT(DISTINCT CAST(ts AS DATE)) AS n_active_days,
         CAST(date_diff('day', MAX(CAST(ts AS DATE)),
                        CAST(TIMESTAMP '{_CHURN_SPLIT}' AS DATE)) AS INTEGER) AS recency_days
  FROM w1 GROUP BY user_id
),
active2 AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '{_CHURN_SPLIT}'
    AND event_type = 'purchase' AND value > {_CHURN_VALUE_MIN}
)
SELECT f.user_id, f.n_events, f.n_purchases, f.total_value,
       f.n_active_days, f.recency_days,
       a.user_id IS NULL AS churned
FROM feats f LEFT JOIN active2 a ON f.user_id = a.user_id
"""


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by their first-signup
    date, purchase revenue accumulated per week-since-signup — the
    retention economics readout (`retention_cohorts` counts activity;
    this follows the money). Per-cohort running revenue is a window
    over at most weeks-in-range rows AFTER the (cohort, week) hash agg,
    so the cumulative pass never touches event grain; sums stay DECIMAL
    until the output edge."""
    e = load_table(spark, sf_dir, "events")
    firsts = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").cast("date").alias("cohort_date"))
    )
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("ts").cast("date") >= F.col("cohort_date"))
        .select(
            "user_id",
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_date")) / F.lit(7)
            )
            .cast("long")
            .alias("week"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    g = purch.groupBy("cohort", "week").agg(
        F.countDistinct("user_id").alias("n_buyers"),
        F.sum("v").alias("rev"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "cohort",
        "week",
        "n_buyers",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    )


COHORT_LTV_SQL = """
WITH firsts AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_date
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
purch AS (
  SELECT f.user_id, strftime(f.cohort_date, '%Y-%m-%d') AS cohort,
         CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) // 7 AS BIGINT) AS week,
         CAST(e.value AS DECIMAL(18,6)) AS v
  FROM firsts f JOIN events e ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= f.cohort_date
),
g AS (
  SELECT cohort, week, COUNT(DISTINCT user_id) AS n_buyers, SUM(v) AS rev
  FROM purch GROUP BY cohort, week
)
SELECT cohort, week, n_buyers,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY week
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS cum_revenue
FROM g
"""


ACTIVE_WINDOW_DAYS = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day (the DAU/WAU grade
    metric) WITHOUT a spine self-join: each event contributes its user
    to the 7 day-buckets it keeps alive (a bounded ×7 generator, distinct
    BEFORE the explode so the expansion is per (user, day), not per
    event), then one (day, user) distinct count. At 100 TB that's a
    fixed fan-out plus one hash agg — no per-day range join over the
    fact table. Days with no events in range simply don't appear (the
    spine-join gap-fill variant is ``hourly_gapfill``)."""
    e = load_table(spark, sf_dir, "events")
    user_days = e.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    contrib = user_days.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(ACTIVE_WINDOW_DAYS - 1))
        ).alias("off"),
        "d",
        "user_id",
    ).select(
        F.date_format(F.date_add(F.col("d"), F.col("off")), "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    days = e.select(F.date_format("ts", "yyyy-MM-dd").alias("day")).distinct()
    return (
        contrib.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )


ROLLING_ACTIVE_USERS_SQL = f"""
WITH user_days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
contrib AS (
  SELECT DISTINCT strftime(d + INTERVAL (g.o) DAY, '%Y-%m-%d') AS day, user_id
  FROM user_days, UNNEST(generate_series(0, {ACTIVE_WINDOW_DAYS - 1})) AS g(o)
),
days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events)
SELECT c.day, COUNT(DISTINCT c.user_id) AS active_7d
FROM contrib c JOIN days dd ON c.day = dd.day
GROUP BY c.day
"""


QUERIES = {
    "hourly_stats": hourly_stats,
    "user_daily_metrics": user_daily_metrics,
    "risk_scores": risk_scores,
    "daily_summary": daily_summary,
    "top_risk_alerts": top_risk_alerts,
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "funnel_time_to_convert": funnel_time_to_convert,
    "sequence_pattern_match": sequence_pattern_match,
    "churn_label_features": churn_label_features,
    "retention_cohorts": retention_cohorts,
    "event_transition_matrix": event_transition_matrix,
    "event_trigram_counts": event_trigram_counts,
    "rolling_active_users": rolling_active_users,
    "cohort_ltv": cohort_ltv,
}

ORACLES = {
    "hourly_stats": HOURLY_STATS_SQL,
    "user_daily_metrics": USER_DAILY_METRICS_SQL,
    "risk_scores": RISK_SCORES_SQL,
    "daily_summary": DAILY_SUMMARY_SQL,
    "top_risk_alerts": TOP_RISK_ALERTS_SQL,
    "funnel_view_click_purchase": FUNNEL_SQL,
    "funnel_time_to_convert": FUNNEL_TIME_TO_CONVERT_SQL,
    "sequence_pattern_match": SEQUENCE_PATTERN_MATCH_SQL,
    "churn_label_features": CHURN_LABEL_FEATURES_SQL,
    "retention_cohorts": RETENTION_COHORTS_SQL,
    "event_transition_matrix": EVENT_TRANSITION_MATRIX_SQL,
    "event_trigram_counts": EVENT_TRIGRAM_COUNTS_SQL,
    "rolling_active_users": ROLLING_ACTIVE_USERS_SQL,
    "cohort_ltv": COHORT_LTV_SQL,
}
