"""Remaining relational-surface operators: UNPIVOT (wide→long) and
null-safe equi-joins.

- ``metric_unpivot``: the inverse of ``pivot_type_counts_by_date``
  (plans/json_ops.py) — a wide per-day metric row unpivoted to tidy
  (date, metric, value) triples via ``stack``. Zero shuffle beyond the
  producing aggregation: stack is a generator projection, each input
  row expands to exactly |metrics| rows on the same partition.
- ``join_null_safe_buckets``: reconciling two aggregates whose group
  key is legitimately NULL (here: an out-of-range sentinel bucket) —
  a plain equi-join silently DROPS the NULL group on both sides;
  ``eqNullSafe`` / ``IS NOT DISTINCT FROM`` matches them. Spark still
  executes it as a hash join (null-safe equality is a valid equi-key),
  so the plan shuffles on the key like any other join — no nested-loop
  penalty for correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .wiki import events_with_time

SPLIT_TS = "2024-01-16 00:00:00"


def metric_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = events_with_time(spark, sf_dir)
    wide = e.groupBy("event_date").agg(
        F.sum((F.col("event_type") == "view").cast("int")).alias("n_views"),
        F.sum((F.col("event_type") == "click").cast("int")).alias("n_clicks"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("n_purchases"),
    )
    return wide.select(
        "event_date",
        F.expr(
            "stack(3, 'n_views', n_views, 'n_clicks', n_clicks,"
            " 'n_purchases', n_purchases) AS (metric, metric_count)"
        ),
    )


METRIC_UNPIVOT_SQL = """
WITH wide AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
  FROM events GROUP BY 1
)
SELECT event_date, metric, metric_count FROM wide
UNPIVOT (metric_count FOR metric IN (n_views, n_clicks, n_purchases))
"""


def _bucketed() -> F.Column:
    """Unbound bucket expression over the in-scope ``value`` column
    (NULL = out-of-range sentinel bucket)."""
    return F.when(F.col("value") >= 50, F.lit(None).cast("bigint")).otherwise(
        F.floor(F.col("value") / 10).cast("bigint")
    )


def join_null_safe_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    split = F.lit(SPLIT_TS).cast("timestamp")
    first = (
        e.filter(F.col("ts") < split)
        .groupBy(_bucketed().alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    second = (
        e.filter(F.col("ts") >= split)
        .groupBy(_bucketed().alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_second"))
    )
    return (
        first.join(second, first["bucket"].eqNullSafe(second["bucket"]))
        .select(first["bucket"].alias("bucket"), "n_first", "n_second")
    )


JOIN_NULL_SAFE_BUCKETS_SQL = f"""
WITH first_half AS (
  SELECT CASE WHEN value >= 50 THEN NULL
              ELSE CAST(floor(value / 10) AS BIGINT) END AS bucket,
         COUNT(*) AS n_first
  FROM events WHERE ts < TIMESTAMP '{SPLIT_TS}' GROUP BY 1
),
second_half AS (
  SELECT CASE WHEN value >= 50 THEN NULL
              ELSE CAST(floor(value / 10) AS BIGINT) END AS bucket,
         COUNT(*) AS n_second
  FROM events WHERE ts >= TIMESTAMP '{SPLIT_TS}' GROUP BY 1
)
SELECT f.bucket, f.n_first, s.n_second
FROM first_half f JOIN second_half s ON f.bucket IS NOT DISTINCT FROM s.bucket
"""


_IVM_CUT = "1997-06-01 00:00:00"  # orders before = base, after = delta


def _ivm_rel(spark: SparkSession, sf_dir: str):
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c_base = c.filter(F.col("c_custkey") % 10 != 0)
    c_delta = c.filter(F.col("c_custkey") % 10 == 0)
    cut = F.lit(_IVM_CUT).cast("timestamp")
    o_base = o.filter(F.col("o_orderdate") < cut)
    o_delta = o.filter(F.col("o_orderdate") >= cut)
    return c_base, c_delta, o_base, o_delta


def _ivm_arm(cust: DataFrame, orders: DataFrame, arm: str) -> DataFrame:
    j = cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
    sig = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("c_custkey").cast("string"), F.col("o_orderkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return j.select(sig.alias("sig")).agg(
        F.lit(arm).alias("arm"),
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum("sig"), F.lit(0)).alias("checksum"),
    )


def incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view — the delta algebra
    a lakehouse materialized view runs instead of recomputing:
    for insert-only deltas, Δ(C ⋈ O) = ΔC⋈O ∪ C⋈ΔO ∪ ΔC⋈ΔO. One row
    per maintenance arm plus the old and new full views, each carrying
    a row count and an order-free BIGINT row checksum, so the output
    itself PROVES the algebra: checksum(view_new) = checksum(view_old)
    + Σ checksum(arms) — verified by the invariant test and the oracle
    alike. At 100 TB the three delta arms touch |Δ|-proportional data
    (the base-side probes are keyed equi-joins that prune to delta
    keys); the full views here exist only as the audit yardstick."""
    c_base, c_delta, o_base, o_delta = _ivm_rel(spark, sf_dir)
    c_full = c_base.unionByName(c_delta)
    o_full = o_base.unionByName(o_delta)
    arms = [
        _ivm_arm(c_base, o_base, "view_old"),
        _ivm_arm(c_delta, o_base, "arm_dc_o"),
        _ivm_arm(c_base, o_delta, "arm_c_do"),
        _ivm_arm(c_delta, o_delta, "arm_dc_do"),
        _ivm_arm(c_full, o_full, "view_new"),
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


_IVM_SIG = (
    "CAST(concat('0x', substr(md5(concat_ws('|', CAST(c_custkey AS VARCHAR), "
    "CAST(o_orderkey AS VARCHAR))), 1, 8)) AS BIGINT)"
)


def _ivm_arm_sql(cust: str, orders: str, arm: str) -> str:
    return f"""
SELECT '{arm}' AS arm, COUNT(*) AS n_rows,
       CAST(COALESCE(SUM({_IVM_SIG}), 0) AS BIGINT) AS checksum
FROM ({cust}) c JOIN ({orders}) o ON c.c_custkey = o.o_custkey
"""


_IVM_CB = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 10 != 0"
_IVM_CD = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 10 = 0"
_IVM_CF = "SELECT c_custkey, c_mktsegment FROM customer"
_IVM_OB = f"SELECT o_orderkey, o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '{_IVM_CUT}'"
_IVM_OD = f"SELECT o_orderkey, o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{_IVM_CUT}'"
_IVM_OF = "SELECT o_orderkey, o_custkey FROM orders"

INCREMENTAL_JOIN_DELTA_SQL = "\nUNION ALL\n".join(
    [
        _ivm_arm_sql(_IVM_CB, _IVM_OB, "view_old"),
        _ivm_arm_sql(_IVM_CD, _IVM_OB, "arm_dc_o"),
        _ivm_arm_sql(_IVM_CB, _IVM_OD, "arm_c_do"),
        _ivm_arm_sql(_IVM_CD, _IVM_OD, "arm_dc_do"),
        _ivm_arm_sql(_IVM_CF, _IVM_OF, "view_new"),
    ]
)


# Longest-prefix-match rule table: (prefix, label). Nested prefixes on
# purpose — '1' < '10' < '104' — so specificity resolution is exercised.
_LPM_RULES = (
    ("", "default"),
    ("1", "seg_1"),
    ("10", "seg_10"),
    ("104", "seg_104"),
    ("7", "seg_7"),
    ("9", "seg_9"),
    ("99", "seg_99"),
)
_LPM_MAX_LEN = max(len(p) for p, _ in _LPM_RULES)


def join_longest_prefix_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match dimension resolution — the hierarchical
    rules join (IP→network, category path→policy, MCC prefix→fee tier)
    that naive SQL writes as a ``LIKE`` theta-join (a cross product).
    The scalable lowering: each row expands to its ≤ L+1 candidate
    prefixes (a bounded generator, no shuffle), equi-joins the
    broadcast rule table on the prefix, and keeps the most specific
    match per row with ``max_by(label, prefix_len)`` — one hash agg,
    ties impossible since prefix lengths are distinct per row. Output
    rolls up to per-rule match counts. At 100 TB: |rows|·(L+1)
    candidate grain, broadcast rules, zero inequality joins."""
    rules = spark.createDataFrame(
        [(p, lbl, len(p)) for p, lbl in _LPM_RULES],
        "prefix string, label string, plen int",
    )
    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").cast("string").alias("uid")
    )
    # array_distinct dedupes short uids' repeated prefixes PER ROW
    # (substr('42',1,2) == substr('42',1,3)) — a free projection, where a
    # relational .distinct() here would shuffle |rows|·(L+1) candidates
    cands = e.select(
        "event_id",
        F.explode(
            F.array_distinct(
                F.array(
                    *[F.substring("uid", 1, n) for n in range(0, _LPM_MAX_LEN + 1)]
                )
            )
        ).alias("prefix"),
    )
    matched = cands.join(F.broadcast(rules), "prefix")
    resolved = matched.groupBy("event_id").agg(
        F.expr("max_by(label, plen)").alias("label")
    )
    return resolved.groupBy("label").agg(F.count(F.lit(1)).alias("n_events"))


def _lpm_rules_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT '{p}' AS prefix, '{lbl}' AS label, {len(p)} AS plen"
        for p, lbl in _LPM_RULES
    )


JOIN_LONGEST_PREFIX_MATCH_SQL = f"""
WITH rules AS ({_lpm_rules_sql()}),
e AS (SELECT event_id, CAST(user_id AS VARCHAR) AS uid FROM events),
cands AS (
  SELECT DISTINCT event_id, substr(uid, 1, n.n) AS prefix
  FROM e, (SELECT unnest(generate_series(0, {_LPM_MAX_LEN})) AS n) n
),
matched AS (
  SELECT c.event_id, r.label, r.plen
  FROM cands c JOIN rules r ON c.prefix = r.prefix
),
resolved AS (
  SELECT event_id, arg_max(label, plen) AS label FROM matched GROUP BY event_id
)
SELECT label, COUNT(*) AS n_events FROM resolved GROUP BY label
"""


def lateral_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL surface — the per-row
    "top-N of my children" idiom ANSI added so this stops being a
    window-function workaround): for each BUILDING-segment customer in
    a deterministic 1-in-10 slice, the two highest-price orders.
    Catalyst decorrelates the LIMIT-inside-LATERAL into a partitioned
    window under the hood — same physical plan family as
    ``top3_orders_per_customer``, which is exactly the point: the
    surface is new, the scale story is the proven one. DuckDB shares
    the LATERAL semantics, so the oracle is the identical query."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("sg_lat_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sg_lat_ord")
    return spark.sql(LATERAL_TOPN_SQL_BODY.format(cust="sg_lat_cust", ord="sg_lat_ord"))


LATERAL_TOPN_SQL_BODY = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM (SELECT c_custkey FROM {cust}
      WHERE c_mktsegment = 'BUILDING' AND c_custkey % 10 = 0) c,
LATERAL (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
  FROM {ord}
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 2
) t
"""

LATERAL_TOPN_ORDERS_SQL = LATERAL_TOPN_SQL_BODY.format(cust="customer", ord="orders")


QUERIES = {
    "metric_unpivot": metric_unpivot,
    "join_null_safe_buckets": join_null_safe_buckets,
    "incremental_join_delta": incremental_join_delta,
    "join_longest_prefix_match": join_longest_prefix_match,
    "lateral_topn_orders": lateral_topn_orders,
}

ORACLES = {
    "metric_unpivot": METRIC_UNPIVOT_SQL,
    "join_null_safe_buckets": JOIN_NULL_SAFE_BUCKETS_SQL,
    "incremental_join_delta": INCREMENTAL_JOIN_DELTA_SQL,
    "join_longest_prefix_match": JOIN_LONGEST_PREFIX_MATCH_SQL,
    "lateral_topn_orders": LATERAL_TOPN_ORDERS_SQL,
}
