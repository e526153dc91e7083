"""Window-function surface (SURVEY §2.5, §2.6, §2.8).

- ``dedup_keep_first``      <- deterministic row_number keep-first dedup, the
  engine's replacement for the reference's arbitrary ``dropDuplicates`` (D2,
  ``silver_batch_job.py:142-144``) and the repair dedup (W2,
  ``dq/deduplicate_bronze.py:80-88``) — SURVEY §7.3 documents the
  reference's NOT-IN delete bug; row_number semantics fix it.
- ``daily_lag_trend``       <- the declared-but-unimplemented trend columns
  (``gold_schema.py:67-69,110-112``): lag day-over-day pct + 7-day moving avg.
- ``running_total_per_user`` <- cumulative frame (rowsBetween) over exact
  decimal sums.
- ``rank_customers_by_balance`` <- rank/dense_rank with real ties.
- ``top3_orders_per_customer``  <- per-group top-k via row_number filter.
- ``user_sessionization``   <- lag-gap sessionization (gap > 30 min), the
  batch equivalent of streaming session windows.

Scale: every window partitions by a high-cardinality key (user_id,
c_custkey) so state is distributed; no global unpartitioned ordering
except the bounded per-day trend frame (≤ days-in-range rows after
pre-aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .wiki import events_with_time

_EVENTS_TIME_SQL = """
    SELECT *, strftime(ts, '%Y-%m-%d') AS event_date,
           CAST(hour(ts) AS INTEGER) AS event_hour
    FROM events
"""


def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = events_with_time(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_date", "event_type", "value")
    )


DEDUP_KEEP_FIRST_SQL = f"""
SELECT event_id, user_id, event_date, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM ({_EVENTS_TIME_SQL})
)
WHERE rn = 1
"""


def daily_lag_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = events_with_time(spark, sf_dir)
    daily = e.groupBy("event_date").agg(F.count(F.lit(1)).alias("total_events"))
    # global-order window is over the per-day AGGREGATE — one row per
    # calendar day, bounded by elapsed time, not data volume; lag/moving
    # averages over dates are inherently totally ordered
    w = Window.orderBy("event_date")
    prev = F.lag("total_events", 1).over(w)
    mov = Window.orderBy("event_date").rowsBetween(-6, 0)
    return daily.select(
        "event_date",
        "total_events",
        prev.alias("prev_day_events"),
        (F.lit(100.0) * (F.col("total_events") - prev) / prev).alias("day_over_day_pct"),
        F.avg("total_events").over(mov).alias("events_7d_avg"),
    )


DAILY_LAG_TREND_SQL = f"""
WITH daily AS (
  SELECT event_date, COUNT(*) AS total_events
  FROM ({_EVENTS_TIME_SQL}) GROUP BY event_date
)
SELECT event_date, total_events,
       LAG(total_events, 1) OVER (ORDER BY event_date) AS prev_day_events,
       CAST(100.0 AS DOUBLE) * (total_events - LAG(total_events, 1) OVER (ORDER BY event_date))
           / LAG(total_events, 1) OVER (ORDER BY event_date) AS day_over_day_pct,
       AVG(total_events) OVER (ORDER BY event_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS events_7d_avg
FROM daily
"""


def running_total_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_events"),
    )


RUNNING_TOTAL_PER_USER_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
       COUNT(*) OVER w AS running_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def rank_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


RANK_CUSTOMERS_BY_BALANCE_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_rank,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_dense_rank
FROM customer
"""


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.col("rn").alias("price_rank"),
        )
    )


TOP3_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS price_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
"""


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_us = F.lag(F.unix_micros("ts"), 1).over(w)
    new_session = F.when(
        prev_us.isNull() | ((F.unix_micros("ts") - prev_us) > SESSION_GAP_US), 1
    ).otherwise(0)
    flagged = e.withColumn("new_session", new_session)
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        (F.count(F.lit(1)) / F.sum("new_session")).alias("avg_events_per_session"),
    )


USER_SESSIONIZATION_SQL = f"""
WITH flagged AS (
  SELECT user_id,
         CASE WHEN LAG(epoch_us(ts), 1) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events,
       COUNT(*) / CAST(SUM(new_session) AS DOUBLE) AS avg_events_per_session
FROM flagged GROUP BY user_id
"""


def wma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted 7-point moving average of ``value`` per user —
    the trend smoother the reference's declared-but-unimplemented trend
    columns (``gold_schema.py:67-69``) gesture at, generalized to a
    weighted kernel. One keyed window (partition user_id, ordered by
    ts with event_id tiebreak) supplies all seven lags in a single
    shuffle + sort; the kernel dot product runs in DECIMAL with integer
    weights (exact — no float on any intermediate), divided once at the
    output edge. Rows without a full 7-event history are dropped, so
    every emitted value is a true 7-term average."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    v = F.col("value").cast("decimal(18,6)")
    lags = [v] + [F.lag(v, k).over(w) for k in range(1, 7)]
    num = sum(
        (F.lit(7 - k).cast("decimal(2,0)") * lag for k, lag in enumerate(lags)),
        F.lit(0).cast("decimal(30,6)"),
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("wma7", num.cast("double") / F.lit(28.0))
        .filter(F.col("rn") >= 7)
        .select("user_id", "event_id", "wma7")
    )


WMA_USER_VALUE_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, CAST(value AS DECIMAL(18,6)) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         lag(CAST(value AS DECIMAL(18,6)), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v1,
         lag(CAST(value AS DECIMAL(18,6)), 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v2,
         lag(CAST(value AS DECIMAL(18,6)), 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v3,
         lag(CAST(value AS DECIMAL(18,6)), 4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v4,
         lag(CAST(value AS DECIMAL(18,6)), 5) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v5,
         lag(CAST(value AS DECIMAL(18,6)), 6) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v6
  FROM events
)
SELECT user_id, event_id,
       CAST(7*v + 6*v1 + 5*v2 + 4*v3 + 3*v4 + 2*v5 + 1*v6 AS DOUBLE) / 28.0 AS wma7
FROM ordered WHERE rn >= 7
"""


def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions over per-nation balance order:
    ntile(4) quartile assignment, percent_rank and cume_dist — the
    remaining rank-family operators (rank/dense_rank/row_number live in
    ``rank_customers_by_balance``). Partitioned by nation so no window
    sees more than one nation's customers (never a global sort);
    (c_acctbal, c_custkey) ordering makes every rank deterministic
    under ties."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


CUSTOMER_BALANCE_QUARTILES_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       ntile(4) OVER w AS balance_quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
"""


def rolling_1h_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (event-time interval) frame — the frame kind every other
    window here doesn't use: per user, the trailing-1-hour sum/count
    bounded by VALUE distance, not row count, so sparse and dense hours
    aggregate correctly. The order key is exact epoch microseconds
    (Spark's rangeBetween needs a numeric key; micros match DuckDB's
    INTERVAL arithmetic on microsecond timestamps with no truncation).
    Sum in DECIMAL: the frame's float order-independence is the same
    discipline as every other money sum here."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


ROLLING_1H_USER_VALUE_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h
FROM events
"""


def running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-aggregate over a running window — an operator neither
    engine supports natively (no DISTINCT inside window functions):
    both sides build the running set explicitly (``collect_set`` /
    ``list_distinct(list(...))``) and take its size. Per-user state is
    bounded by |event types|, so the set never grows past a constant."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_seen"),
    )


RUNNING_DISTINCT_TYPES_SQL = """
SELECT event_id, user_id,
       CAST(len(list_distinct(list(event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS INTEGER) AS n_types_seen
FROM events
"""


def twap_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day) — the TWAP/TWAB
    pattern: each observation is weighted by how long it was current
    (microseconds until the next same-day event, via one lead()).
    Numerator is DECIMAL × exact integer micros (order-free sum); the
    single division happens in double at the output edge. The day's
    last observation has no forward interval and is excluded — the
    standard right-open TWAP convention."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    w = Window.partitionBy("user_id", day.alias("d")).orderBy(
        F.col("ts"), F.col("event_id")
    )
    t = F.unix_micros("ts")
    seq = e.select(
        "user_id",
        day.alias("event_date"),
        F.col("value").cast("decimal(18,6)").alias("v"),
        t.alias("t"),
        F.lead(t).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    dt = F.col("t_next") - F.col("t")
    return seq.groupBy("user_id", "event_date").agg(
        (
            F.sum(F.col("v") * dt).cast("double")
            / F.sum(dt).cast("double")
        )
        .cast("double")
        .alias("twap")
    )


# VARCHAR round-trips: see STATS_CORR_OLS_SQL — DuckDB's direct
# DECIMAL/HUGEINT -> DOUBLE casts double-round past 2^53 unscaled.
TWAP_USER_DAILY_SQL = """
WITH seq AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(value AS DECIMAL(18,6)) AS v,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                                  ORDER BY ts, event_id) AS t_next
  FROM events
)
SELECT user_id, event_date,
       CAST(CAST(CAST(SUM(v * (t_next - t)) AS VARCHAR) AS DOUBLE)
            / CAST(CAST(SUM(t_next - t) AS VARCHAR) AS DOUBLE) AS DOUBLE) AS twap
FROM seq WHERE t_next IS NOT NULL
GROUP BY user_id, event_date
"""


CONCURRENCY_WINDOW_US = 1_800_000_000  # each event "live" for 30 minutes


def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line maximum overlap: how many 30-minute event windows are
    simultaneously live at the day's busiest instant. Classic interval
    stabbing as declarative ops: every event contributes a +1 at its
    start and a -1 at start+30min, a date-partitioned running sum
    sweeps the (time, start-before-end) order, and the per-day max is
    the peak. No interval self-join (the naive form is O(n²) stabbing
    pairs); the partition key is the calendar day, so no global sort.

    DAY-SCOPED by design: both endpoints of a window land in the
    partition of its START day, so a window straddling midnight does
    not carry into the next day's count — the day-partition locality
    that avoids a global sweep is bought with that boundary
    approximation (exact for any workload whose windows close within
    the day; a production variant would inject per-day carryover
    offsets from the previous day's still-open windows). The oracle
    shares the same day-scoped definition."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    t = F.unix_micros("ts")
    starts = e.select(day, t.alias("t"), F.lit(1).alias("delta"), F.lit(0).alias("tie"))
    ends = e.select(
        day,
        (t + CONCURRENCY_WINDOW_US).alias("t"),
        F.lit(-1).alias("delta"),
        F.lit(1).alias("tie"),
    )
    pts = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_date")
        .orderBy("t", "tie", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("live", F.sum("delta").over(w))
        .groupBy("event_date")
        .agg(F.max("live").cast("long").alias("peak_concurrency"))
    )


PEAK_CONCURRENCY_DAILY_SQL = f"""
WITH pts AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date, epoch_us(ts) AS t,
         1 AS delta, 0 AS tie
  FROM events
  UNION ALL
  SELECT strftime(ts, '%Y-%m-%d'), epoch_us(ts) + {CONCURRENCY_WINDOW_US}, -1, 1
  FROM events
),
swept AS (
  SELECT event_date,
         SUM(delta) OVER (PARTITION BY event_date ORDER BY t, tie, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM pts
)
SELECT event_date, CAST(MAX(live) AS BIGINT) AS peak_concurrency
FROM swept GROUP BY event_date
"""


QUERIES = {
    "dedup_keep_first": dedup_keep_first,
    "wma_user_value": wma_user_value,
    "customer_balance_quartiles": customer_balance_quartiles,
    "rolling_1h_user_value": rolling_1h_user_value,
    "running_distinct_types": running_distinct_types,
    "twap_user_daily": twap_user_daily,
    "peak_concurrency_daily": peak_concurrency_daily,
    "daily_lag_trend": daily_lag_trend,
    "running_total_per_user": running_total_per_user,
    "rank_customers_by_balance": rank_customers_by_balance,
    "top3_orders_per_customer": top3_orders_per_customer,
    "user_sessionization": user_sessionization,
}

ORACLES = {
    "dedup_keep_first": DEDUP_KEEP_FIRST_SQL,
    "wma_user_value": WMA_USER_VALUE_SQL,
    "customer_balance_quartiles": CUSTOMER_BALANCE_QUARTILES_SQL,
    "rolling_1h_user_value": ROLLING_1H_USER_VALUE_SQL,
    "running_distinct_types": RUNNING_DISTINCT_TYPES_SQL,
    "twap_user_daily": TWAP_USER_DAILY_SQL,
    "peak_concurrency_daily": PEAK_CONCURRENCY_DAILY_SQL,
    "daily_lag_trend": DAILY_LAG_TREND_SQL,
    "running_total_per_user": RUNNING_TOTAL_PER_USER_SQL,
    "rank_customers_by_balance": RANK_CUSTOMERS_BY_BALANCE_SQL,
    "top3_orders_per_customer": TOP3_ORDERS_PER_CUSTOMER_SQL,
    "user_sessionization": USER_SESSIONIZATION_SQL,
}
