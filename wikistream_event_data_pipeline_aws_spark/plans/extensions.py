"""Operator-surface extensions the reference leaves implicit
(SURVEY §2.4 note: pivot as the idiomatic form of A1's SUM(CASE) edit-
type breakdown; §2.7: set-op family; §2.9: map/array functions for the
declared MapType columns; plus grouping-sets rollup/cube and a salted
skew join, the scale technique for hot keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# the ONE event-type vocabulary (shared with the DQ containment check):
# a third hand copy here let the pivot schema drift independently
from .dq import ALLOWED_EVENT_TYPES as EVENT_TYPES


# -- pivot --------------------------------------------------------------------


def pivot_type_counts_by_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit pivot values (explicit list keeps
    the schema static and skips the distinct-values pre-scan job —
    mandatory at scale)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    return (
        e.groupBy("event_date")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


PIVOT_TYPE_COUNTS_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS event_date,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events
GROUP BY 1
"""


# -- rollup / cube ------------------------------------------------------------


def rollup_date_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    return (
        e.rollup("event_date", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
    )


ROLLUP_DATE_TYPE_SQL = """
WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type FROM events)
SELECT event_date, event_type, COUNT(*) AS n,
       CAST(GROUPING(event_date) * 2 + GROUPING(event_type) AS BIGINT) AS gid
FROM e GROUP BY ROLLUP (event_date, event_type)
"""


def cube_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("event_hour", F.hour("ts"))
    return (
        e.cube("event_type", "event_hour")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
    )


CUBE_TYPE_HOUR_SQL = """
WITH e AS (SELECT event_type, CAST(hour(ts) AS INTEGER) AS event_hour FROM events)
SELECT event_type, event_hour, COUNT(*) AS n,
       CAST(GROUPING(event_type) * 2 + GROUPING(event_hour) AS BIGINT) AS gid
FROM e GROUP BY CUBE (event_type, event_hour)
"""


# -- map / array ops on the props JSON column ---------------------------------


def map_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON -> MapType -> map_keys + explode to (key, value) rows
    (the map-function surface the reference declares but never exercises,
    SURVEY §2.9)."""
    e = load_table(spark, sf_dir, "events")
    m = e.withColumn("props_map", F.from_json("props", "map<string,int>"))
    return (
        m.withColumn("n_keys", F.size(F.map_keys("props_map")))
        .select("event_id", "n_keys", F.explode("props_map").alias("key", "val"))
        .select("event_id", "n_keys", "key", "val")
    )


MAP_EXPLODE_PROPS_SQL = """
SELECT event_id,
       CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
       unnest(json_keys(props)) AS key,
       CAST(json_extract(props, '$.' || unnest(json_keys(props))) AS INTEGER) AS val
FROM events
"""


# -- salted skew join ---------------------------------------------------------

N_SALTS = 8
TYPE_WEIGHTS = {"click": 1, "view": 1, "purchase": 5, "signup": 3, "error": 0}


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join made safe by salting: the fact side's join key is
    split into N_SALTS sub-keys and the dim side replicated across them,
    so no single reducer owns a hot key. The result is provably identical
    to the plain join (the oracle IS the plain join).

    At local scale a broadcast join would win — the point here is the
    shuffle-join shape that survives a 100x skewed key at cluster scale.
    The SHUFFLE_HASH hint pins that shape: without it Catalyst sees no
    stats on the Python-built dim, sizes the *fact* side as the smaller
    relation, and broadcasts 100k fact rows through the driver (measured
    9.4s vs 1.3s at sf0.1).
    """
    e = load_table(spark, sf_dir, "events")
    # VALUES keeps the dim JVM-side; createDataFrame would wrap it in a
    # Python RDD whose scan pays a pyspark-worker roundtrip per run
    dim = spark.sql(
        "SELECT event_type, CAST(weight AS INT) AS weight FROM (VALUES "
        + ", ".join(f"('{t}', {w})" for t, w in TYPE_WEIGHTS.items())
        + ") AS t(event_type, weight)"
    )
    salted_e = e.withColumn("__salt", F.pmod(F.hash("event_id"), F.lit(N_SALTS)))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    joined = salted_e.join(salted_dim.hint("shuffle_hash"), ["event_type", "__salt"])
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (F.col("value").cast("decimal(18,2)") * F.col("weight"))
        ).cast("double").alias("weighted_value"),
    )


_DIM_VALUES = ", ".join(f"('{t}', {w})" for t, w in TYPE_WEIGHTS.items())

JOIN_SALTED_SKEW_SQL = f"""
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * d.weight) AS DOUBLE) AS weighted_value
FROM events e
JOIN (VALUES {_DIM_VALUES}) AS d(event_type, weight)
  ON e.event_type = d.event_type
GROUP BY e.event_type
"""


# -- grouping sets ------------------------------------------------------------


def grouping_sets_type_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    per-type totals, per-date totals, and the grand total in one pass —
    Spark expands to a single Expand + hash-agg, one shuffle."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    return e.groupingSets(
        [["event_type"], ["event_date"], []], "event_type", "event_date"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("unique_users"),
        F.grouping_id().alias("gid"),
    )


GROUPING_SETS_TYPE_DATE_SQL = """
WITH e AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date, user_id FROM events)
SELECT event_type, event_date, COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS unique_users,
       CAST(GROUPING(event_type) * 2 + GROUPING(event_date) AS BIGINT) AS gid
FROM e GROUP BY GROUPING SETS ((event_type), (event_date), ())
"""


# -- as-of (point-in-time) join -----------------------------------------------


def asof_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join: every event picks up the value of the same
    user's latest click at-or-before its timestamp (NULL before the
    first click). Implemented as union + last(ignorenulls) window —
    one key shuffle, no range-join pair blow-up (operators/asof.py);
    the oracle is DuckDB's native ASOF LEFT JOIN."""
    from ..operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("last_click_value")
    )
    joined = asof_join(
        e, clicks, keys=["user_id"], ts_col="ts", payload_cols=["last_click_value"]
    )
    return joined.select("event_id", "user_id", "event_type", "last_click_value")


ASOF_LATEST_CLICK_SQL = """
SELECT e.event_id, e.user_id, e.event_type, c.last_click_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts, value AS last_click_value FROM events WHERE event_type = 'click'
) c ON e.user_id = c.user_id AND e.ts >= c.ts
"""


def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of FORWARD join: every event picks up the value of the same
    user's earliest purchase at-or-after its timestamp (NULL after the
    last purchase) — the mirror of ``asof_latest_click`` via
    ``operators/asof.asof_join_forward`` (union + first(ignorenulls)
    over a current-row..unbounded-following frame, one key shuffle);
    the oracle is DuckDB's native forward ASOF (``e.ts <= p.ts``)."""
    from ..operators.asof import asof_join_forward

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("next_purchase_value")
    )
    joined = asof_join_forward(
        e, purchases, keys=["user_id"], ts_col="ts",
        payload_cols=["next_purchase_value"],
    )
    return joined.select("event_id", "user_id", "event_type", "next_purchase_value")


ASOF_NEXT_PURCHASE_SQL = """
SELECT e.event_id, e.user_id, e.event_type, p.next_purchase_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts, value AS next_purchase_value FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts <= p.ts
"""


# -- banded range (interval) join ---------------------------------------------

_HOUR_US = 3_600_000_000


def range_join_next_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many events the same user produced in the
    following hour. Runs through the banded range join
    (operators/rangejoin.py) — equi-join on (user, time-bucket) with an
    exact microsecond interval filter, never a per-key cross product;
    the oracle is the naive inequality join."""
    from ..operators.rangejoin import banded_range_join

    e = load_table(spark, sf_dir, "events")
    left = e.select("event_id", "user_id", "ts")
    right = e.select(
        "user_id", F.col("ts").alias("rts"), F.col("event_id").alias("next_event_id")
    )
    pairs = banded_range_join(
        left, right, keys=["user_id"], left_ts="ts", right_ts="rts",
        lower_us=0, upper_us=_HOUR_US, how="left",
    )
    return pairs.groupBy("event_id").agg(
        F.count("next_event_id").alias("n_following")
    )


RANGE_JOIN_NEXT_HOUR_SQL = f"""
SELECT a.event_id, COUNT(b.event_id) AS n_following
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) > epoch_us(a.ts)
 AND epoch_us(b.ts) <= epoch_us(a.ts) + {_HOUR_US}
GROUP BY a.event_id
"""


# -- regression aggregate ------------------------------------------------------

_TREND_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01, the corpus epoch


def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of value over time — the regression
    aggregate (regr_slope family) computed exactly: x is whole seconds
    from a fixed corpus epoch, y is decimal-cast cents, all four sums
    are integer-exact and order-independent, and only the final
    slope/mean combination runs in (deterministic) double arithmetic.
    One map-side-combined groupBy — the same shuffle as any hash agg."""
    e = load_table(spark, sf_dir, "events")
    x = F.expr(f"(unix_micros(ts) - {_TREND_EPOCH_US}L) div 1000000")
    y = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    t = e.select("user_id", x.alias("x"), y.alias("y"))
    a = t.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_events").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    den = n * sxx - sx * sx
    return a.select(
        "user_id",
        "n_events",
        F.when(den != 0, (n * sxy - sx * sy) / den).alias("slope_cents_per_sec"),
        (sy / n).alias("mean_cents"),
    )


USER_VALUE_TREND_SQL = f"""
WITH t AS (
  SELECT user_id,
         (epoch_us(ts) - {_TREND_EPOCH_US}) // 1000000 AS x,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM events
),
a AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
  FROM t GROUP BY user_id
)
SELECT user_id, n_events,
       CASE WHEN CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) != 0
            THEN (CAST(n_events AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       END AS slope_cents_per_sec,
       CAST(sy AS DOUBLE) / CAST(n_events AS DOUBLE) AS mean_cents
FROM a
"""


# -- bloom-filter semi-join (runtime-filter pushdown semantics) ---------------

BLOOM_M = 8192  # bits
BLOOM_K = 3  # hash functions


def bloom_semi_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-filter for a selective join, made relational so
    an independent engine verifies the exact false-positive set.

    The build side (BUILDING-segment customers) hashes each key into
    ``k`` bit positions; the distinct position set (<= m rows however
    large the build side grows) is broadcast and the probe side
    (orders) passes only if ALL of its k positions are present —
    exactly the membership rule of Spark's own runtime bloom pushdown
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``, SURVEY §4),
    which at 100 TB prunes the fact scan before the shuffle. The true
    semi-join rides along to count false positives; output is the
    one-row selectivity report.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    from ..operators.textops import hex_hash

    def positions(df: DataFrame, key: str) -> DataFrame:
        ks = F.col(key).cast("string")
        arr = F.array(*[(hex_hash(ks, seed=f"bloom{j}") % BLOOM_M) for j in range(BLOOM_K)])
        return df.select(F.col(key), F.explode(arr).alias("pos")).distinct()

    # fence the two shared subtrees (repo discipline for multiply-
    # consumed lineage): the build side feeds bits AND truth, and the
    # orders-keys distinct — the dominant fact-side shuffle — feeds the
    # probe AND the truth join; unfenced, each ran twice per execution
    build = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .localCheckpoint(eager=False)
    )
    okeys = o.select("o_custkey").distinct().localCheckpoint(eager=False)
    bits = positions(build, "c_custkey").select("pos").distinct().withColumn(
        "hit", F.lit(1)
    )
    probe = positions(okeys, "o_custkey")
    probed = (
        probe.join(F.broadcast(bits), "pos", "left")
        .groupBy("o_custkey")
        .agg(
            (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("hit"), F.lit(0)))).alias(
                "bloom_pass"
            )
        )
    )
    truth = okeys.join(
        build.withColumnRenamed("c_custkey", "o_custkey").withColumn(
            "true_match", F.lit(1)
        ),
        "o_custkey",
        "left",
    )
    joined = probed.join(truth, "o_custkey")
    return joined.agg(
        F.count(F.lit(1)).alias("n_probe_keys"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.coalesce(F.col("true_match"), F.lit(0))).alias("n_true_match"),
        F.sum(
            F.when(F.col("bloom_pass") & F.col("true_match").isNull(), 1).otherwise(0)
        ).alias("n_false_positive"),
    ).select(
        "n_probe_keys",
        "n_bloom_pass",
        "n_true_match",
        "n_false_positive",
        (
            F.col("n_false_positive").cast("double")
            / (F.col("n_probe_keys") - F.col("n_true_match")).cast("double")
        ).alias("fp_rate"),
    )


def _bloom_pos_sql(table: str, key: str) -> str:
    return f"""
  SELECT DISTINCT {key},
         CAST(concat('0x', substr(md5(concat('bloom', CAST(j AS VARCHAR), CAST({key} AS VARCHAR))), 1, 15)) AS BIGINT) % {BLOOM_M} AS pos
  FROM {table}, range({BLOOM_K}) t(j)
"""


BLOOM_SEMI_JOIN_STATS_SQL = f"""
WITH build AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
bits AS (SELECT DISTINCT pos FROM ({_bloom_pos_sql("build", "c_custkey")})),
probe_keys AS (SELECT DISTINCT o_custkey FROM orders),
probe AS ({_bloom_pos_sql("probe_keys", "o_custkey")}),
probed AS (
  SELECT o_custkey,
         COUNT(*) = SUM(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) AS bloom_pass
  FROM probe LEFT JOIN bits ON probe.pos = bits.pos
  GROUP BY o_custkey
),
truth AS (
  SELECT pk.o_custkey,
         CASE WHEN b.c_custkey IS NOT NULL THEN 1 END AS true_match
  FROM probe_keys pk LEFT JOIN build b ON pk.o_custkey = b.c_custkey
),
joined AS (SELECT p.o_custkey, bloom_pass, true_match FROM probed p JOIN truth USING (o_custkey))
SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(COALESCE(true_match, 0)) AS BIGINT) AS n_true_match,
       CAST(SUM(CASE WHEN bloom_pass AND true_match IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
       CAST(SUM(CASE WHEN bloom_pass AND true_match IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) - SUM(COALESCE(true_match, 0)) AS DOUBLE) AS fp_rate
FROM joined
"""


_IVM_CUTOFF_DAY = 20


def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a gold aggregate: the base
    window's partial aggregates merge with a late batch's partials —
    sum/count states combine associatively, so the refreshed view never
    rescans the base window. At 100 TB this is the difference between
    re-aggregating a month and aggregating one late day; it is also the
    algebra behind map-side combine and streaming state merge. Only
    mergeable metrics participate (counts, exact decimal-cents sums —
    NOT countDistinct, whose state is a set; the HLL sketch family is
    the mergeable stand-in there). The oracle recomputes the whole
    window flat, so the merge path is value-checked against the
    recompute it replaces."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")

    def partials(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
                "event_type",
                cents.alias("cents"),
            )
            .groupBy("event_date", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("sum_cents"),
            )
        )

    base = partials(e.filter(F.dayofmonth("ts") <= _IVM_CUTOFF_DAY))
    late = partials(e.filter(F.dayofmonth("ts") > _IVM_CUTOFF_DAY))
    return (
        base.unionByName(late)
        .groupBy("event_date", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
        )
        .select(
            "event_date",
            "event_type",
            "n_events",
            (F.col("sum_cents").cast("double") / 100).alias("sum_value"),
        )
    )


INCREMENTAL_AGG_MERGE_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS event_date,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100
         AS sum_value
FROM events
GROUP BY 1, 2
"""


def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic for shuffle planning: the per-key frequency
    distribution of the join/agg key (user_id), reduced to the numbers
    that decide between a plain hash join, AQE skew splitting, and
    salting — key count, max/mean frequency, the skew ratio, and the
    hottest key (deterministic argmax: max count, then max key). One
    keyed aggregation plus one scalar aggregation; the per-key table
    never leaves the executors."""
    e = load_table(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.min("cnt").alias("min_cnt"),
        (F.max("cnt") * F.count(F.lit(1)) / F.sum("cnt")).cast("double").alias(
            "skew_ratio"
        ),
        F.max(F.struct("cnt", "user_id"))["user_id"].alias("hottest_key"),
    )


SKEW_PROFILE_SQL = """
WITH per_key AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       MAX(cnt) AS max_cnt,
       MIN(cnt) AS min_cnt,
       CAST(MAX(cnt) * COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS skew_ratio,
       (SELECT user_id FROM per_key ORDER BY cnt DESC, user_id DESC LIMIT 1)
         AS hottest_key
FROM per_key
"""


DECAY_KMAX = 5  # decay floor: weights below 2^-KMAX clamp to 2^-KMAX
DECAY_TOP = 20


def decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement score: per user, Σ value·2^(−age_weeks)
    with the half-life fixed at one week — the ranking signal a
    freshness-aware feed/featurization job maintains. Exponential decay
    is float-hostile (pow() has no cross-engine bit guarantee), so the
    weight is PIECEWISE-CONSTANT per week and a POWER OF TWO: every
    term is ``value · 2^(KMAX − k)`` in exact DECIMAL (shiftleft — no
    float until the end), the aggregate is order-free, and the single
    closing division by 2^KMAX is exact-denominator. Ages beyond KMAX
    weeks clamp to the floor weight rather than vanishing (documented
    trade: keeps the shift exponent bounded). One hash agg + broadcast
    max-date; top-{DECAY_TOP} via TakeOrderedAndProject."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "value"
    )
    mx = e.agg(F.max("d").alias("max_d"))
    t = e.join(F.broadcast(mx)).select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.least(
            F.expr("datediff(max_d, d) div 7"), F.lit(DECAY_KMAX).cast("long")
        ).alias("k"),
    )
    scaled = t.select(
        "user_id",
        (
            F.col("v")
            * F.expr(f"CAST(shiftleft(1L, {DECAY_KMAX} - k) AS DECIMAL(18,0))")
        ).alias("term"),
    )
    agg = scaled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("term").alias("scaled_sum"),
    )
    return (
        agg.select(
            "user_id",
            "n_events",
            (F.col("scaled_sum").cast("double") / F.lit(float(1 << DECAY_KMAX))).alias(
                "decayed_value"
            ),
        )
        .orderBy(F.col("decayed_value").desc(), F.col("user_id").asc())
        .limit(DECAY_TOP)
    )


DECAYED_USER_VALUE_SQL = f"""
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, value FROM events),
mx AS (SELECT MAX(d) AS max_d FROM e),
t AS (
  SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v,
         LEAST(date_diff('day', d, (SELECT max_d FROM mx)) // 7,
               {DECAY_KMAX}) AS k
  FROM e
),
agg AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(v * CAST(1::BIGINT << ({DECAY_KMAX} - k) AS DECIMAL(18,0))) AS scaled_sum
  FROM t GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(CAST(scaled_sum AS VARCHAR) AS DOUBLE) / {float(1 << DECAY_KMAX)!r}
         AS decayed_value
FROM agg
ORDER BY decayed_value DESC, user_id ASC LIMIT {DECAY_TOP}
"""


def sql_udf_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language UDF (Spark 4 ``CREATE FUNCTION ... RETURN expr``) —
    the §2.9 scalar surface's reusable form: unlike a Python UDF the
    body is INLINED by Catalyst at plan time (no serialization
    boundary, codegen and pushdown apply — the plan test asserts zero
    EvalPython nodes), so shared business logic ("the value band") can
    live as a catalog function without the 10-100x Python-boundary tax.
    The oracle inlines the identical CASE by hand."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION sg_value_band(v DOUBLE)
           RETURNS STRING
           RETURN CASE WHEN v >= 100 THEN 'high'
                       WHEN v >= 10 THEN 'mid'
                       WHEN v >= 0 THEN 'low'
                       ELSE 'negative' END"""
    )
    load_table(spark, sf_dir, "events").createOrReplaceTempView("sg_events_udf")
    return spark.sql(
        """SELECT event_type, sg_value_band(value) AS band,
                  COUNT(*) AS n_events,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           FROM sg_events_udf GROUP BY event_type, sg_value_band(value)"""
    )


SQL_UDF_VALUE_BANDS_SQL = """
WITH banded AS (
  SELECT event_type,
         CASE WHEN value >= 100 THEN 'high'
              WHEN value >= 10 THEN 'mid'
              WHEN value >= 0 THEN 'low'
              ELSE 'negative' END AS band,
         value
  FROM events
)
SELECT event_type, band, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM banded GROUP BY event_type, band
"""


QUERIES = {
    "incremental_agg_merge": incremental_agg_merge,
    "decayed_user_value": decayed_user_value,
    "skew_profile": skew_profile,
    "pivot_type_counts_by_date": pivot_type_counts_by_date,
    "rollup_date_type": rollup_date_type,
    "cube_type_hour": cube_type_hour,
    "map_explode_props": map_explode_props,
    "join_salted_skew": join_salted_skew,
    "grouping_sets_type_date": grouping_sets_type_date,
    "asof_latest_click": asof_latest_click,
    "asof_next_purchase": asof_next_purchase,
    "range_join_next_hour": range_join_next_hour,
    "user_value_trend": user_value_trend,
    "bloom_semi_join_stats": bloom_semi_join_stats,
    "sql_udf_value_bands": sql_udf_value_bands,
}

ORACLES = {
    "incremental_agg_merge": INCREMENTAL_AGG_MERGE_SQL,
    "decayed_user_value": DECAYED_USER_VALUE_SQL,
    "skew_profile": SKEW_PROFILE_SQL,
    "pivot_type_counts_by_date": PIVOT_TYPE_COUNTS_SQL,
    "rollup_date_type": ROLLUP_DATE_TYPE_SQL,
    "cube_type_hour": CUBE_TYPE_HOUR_SQL,
    "map_explode_props": MAP_EXPLODE_PROPS_SQL,
    "join_salted_skew": JOIN_SALTED_SKEW_SQL,
    "grouping_sets_type_date": GROUPING_SETS_TYPE_DATE_SQL,
    "asof_latest_click": ASOF_LATEST_CLICK_SQL,
    "asof_next_purchase": ASOF_NEXT_PURCHASE_SQL,
    "range_join_next_hour": RANGE_JOIN_NEXT_HOUR_SQL,
    "user_value_trend": USER_VALUE_TREND_SQL,
    "bloom_semi_join_stats": BLOOM_SEMI_JOIN_STATS_SQL,
    "sql_udf_value_bands": SQL_UDF_VALUE_BANDS_SQL,
}
