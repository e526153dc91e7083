"""TPC-H-style join/agg/sort surface over the synthetic star schema.

The reference's join surface is thin (SURVEY.md §2.3 — one left join,
MERGE equi-matches, an anti-join-shaped delete), so per SURVEY the new
engine exercises the standard join/agg primitives those decompose into
on the TPC-H testdata: inner/left/semi/anti joins, multi-way joins with
broadcast dims, grouped aggregation with HAVING, and deterministic
top-k (reference O1, ``gold_batch_job.py:728-735``).

Scale notes: dims (region/nation/customer/supplier/part) get explicit
``broadcast()`` hints — at 100 TB the fact tables shuffle only for the
groupBy, never to co-locate against a dim. Order-by+limit plans compile
to TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


# -- Q1-style pricing summary -------------------------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty = _dec("l_quantity")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", 4, 2)
    tax = _dec("l_tax", 4, 2)
    disc_price = price * (F.lit(1).cast("decimal(4,2)") - disc)
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + tax)
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

# -- Q3-style shipping priority (3-way join + top-k) --------------------------


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", 4, 2)
    revenue = F.sum(price * (F.lit(1).cast("decimal(4,2)") - disc)).cast("double")
    return (
        # customer scales with SF (150k rows x SF) — no broadcast hint;
        # AQE converts the join at runtime when the filtered side is small
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# -- Q5-style local-supplier revenue (5-way join, broadcast dims) -------------


def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", 4, 2)
    return (
        # only true dims (region 5 rows, nation 25 rows — SF-invariant) get
        # broadcast hints; customer/supplier grow with SF and must stay on
        # the shuffle path (AQE may still broadcast them at small SF)
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(price * (F.lit(1).cast("decimal(4,2)") - disc))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


LOCAL_SUPPLIER_REVENUE_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""

# -- semi / anti joins (J2 MERGE decomposition primitives) --------------------


def orders_of_building_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join = SQL EXISTS (reference MERGE matched-branch shape)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


ORDERS_OF_BUILDING_CUSTOMERS_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
WHERE EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
GROUP BY o_orderstatus
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join = SQL NOT EXISTS (reference insert-only MERGE fallback,
    SURVEY S7: left-anti vs target keys then append)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""

# -- J1 analog: left outer equi-join of two per-key aggregates ----------------


def customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join of an aggregate onto a dim, preserving unmatched rows
    (reference J1, ``gold_batch_job.py:398-399``)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("lifetime_value"),
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_order_date"),
    )
    joined = cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
    return joined.select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("lifetime_value"), F.lit(0.0)).alias("lifetime_value"),
        F.coalesce(F.col("last_order_date"), F.lit("never")).alias("last_order_date"),
    )


CUSTOMER_ORDER_PROFILE_SQL = """
SELECT c_custkey, c_mktsegment,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(lifetime_value, CAST(0.0 AS DOUBLE)) AS lifetime_value,
       COALESCE(last_order_date, 'never') AS last_order_date
FROM customer
LEFT JOIN (
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS lifetime_value,
           MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_order_date
    FROM orders GROUP BY o_custkey
) po ON c_custkey = po.o_custkey
"""

# -- Q4-style order priority check (semi join + agg + HAVING shape) -----------


def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORDER_PRIORITY_COUNT_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


# -- Q6-style forecast revenue (pure scan-side filter + scalar agg) -----------


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate is scan-pushable (shipdate range,
    discount band, quantity cap), so the whole query is a pruned
    parquet scan + one map-side-combined scalar aggregate — at 100 TB
    this reads only the row groups whose min/max stats intersect the
    filters and shuffles d partial sums, nothing else. Products are
    computed in DECIMAL so the sum is order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", 4, 2)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price * disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# -- Q14-style promotion effect (fact ⋈ broadcast part dim) -------------------


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: one month of lineitem joined to the part dim
    (broadcast — part is the classic small dim), conditional revenue
    ratio. Exercises the ``part`` table and the SUM(CASE)/SUM ratio
    pattern with decimal-exact numerators."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", 4, 2)
    disc_price = price * (F.lit(1).cast("decimal(4,2)") - disc)
    zero = F.lit(0).cast("decimal(17,4)")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price).otherwise(zero)
    ).cast("double")
    total = F.sum(disc_price).cast("double")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            promo.alias("promo_revenue"),
            total.alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
                "promo_pct"
            ),
        )
    )


PROMO_REVENUE_SQL = """
WITH j AS (
  SELECT CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS disc_price,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
)
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc_price ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(disc_price) AS DOUBLE) AS total_revenue,
       CAST(100.0 AS DOUBLE)
         * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc_price ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
         / CAST(SUM(disc_price) AS DOUBLE) AS promo_pct
FROM j
"""


QUERIES = {
    "tpch_pricing_summary": pricing_summary,
    "tpch_shipping_priority": shipping_priority,
    "tpch_local_supplier_revenue": local_supplier_revenue,
    "join_semi_building_orders": orders_of_building_customers,
    "join_anti_customers_without_orders": customers_without_orders,
    "join_left_customer_order_profile": customer_order_profile,
    "tpch_order_priority_count": order_priority_count,
    "tpch_forecast_revenue": forecast_revenue,
    "tpch_promo_revenue": promo_revenue,
}

ORACLES = {
    "tpch_pricing_summary": PRICING_SUMMARY_SQL,
    "tpch_shipping_priority": SHIPPING_PRIORITY_SQL,
    "tpch_local_supplier_revenue": LOCAL_SUPPLIER_REVENUE_SQL,
    "join_semi_building_orders": ORDERS_OF_BUILDING_CUSTOMERS_SQL,
    "join_anti_customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "join_left_customer_order_profile": CUSTOMER_ORDER_PROFILE_SQL,
    "tpch_order_priority_count": ORDER_PRIORITY_COUNT_SQL,
    "tpch_forecast_revenue": FORECAST_REVENUE_SQL,
    "tpch_promo_revenue": PROMO_REVENUE_SQL,
}
