"""Graph analytics beyond connected components (operators/clusters.py):
triangle counting + global clustering coefficient over the part
co-occurrence graph (parts appearing in the same order — the
market-basket projection of lineitem).

Triangle counting is the canonical distributed-join graph kernel,
implemented degree-ordered (a.k.a. compact-forward): each undirected
edge is oriented from its lower-rank endpoint, where rank is the
lexicographic pair ``(degree, id)`` — a total order. Every triangle
{a, b, c} with rank a < b < c then appears exactly once as the wedge
(a→b, a→c) closed by the oriented edge b→c, so the two-hop join
enumerates wedges only from each triangle's MINIMUM-rank vertex. That
bounds per-vertex fan-out by O(sqrt(|E|)) regardless of raw degree
skew (a hub of degree 1M with the max rank contributes ZERO wedges),
which is the difference between ~1.4B and ~1M materialized wedges on
the unwindowed sf0.1 graph. Every join remains a keyed equi-join
(vertex ids) — hash-partitioned shuffles, no cross join, no driver
state; AQE skew-join splitting handles residual hot buckets.

The analysis is windowed to a shipdate range exactly as TPC-H windows
its scans; the window bounds the *edge count*, the degree orientation
bounds the *wedge count* — the two guards compose. Wedges (open
two-paths) come from an integer-exact degree aggregation; the
clustering coefficient 3T/wedges is the only floating-point op. The
DuckDB oracle keeps the naive id-ordered two-hop formulation: the
triangle count is plan-invariant, so oracle parity doubles as the
orientation-correctness check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


_WIN_LO = "1996-01-01"
_WIN_HI = "1998-01-01"


def _oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient canonical undirected edges ``(pa < pb)`` from the
    lower-``(deg, id)``-rank endpoint.

    Returns ``(src, dst, ddeg)`` where ``ddeg`` is dst's degree — carried
    so the wedge join can order the two out-neighbours by rank without a
    further join. Two shuffle joins against the degree table (which is
    |V|-sized and may exceed broadcast limits at scale — deliberately not
    broadcast).
    """
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        edges.join(deg.select(F.col("node").alias("pa"), F.col("deg").alias("da")), "pa")
        .join(deg.select(F.col("node").alias("pb"), F.col("deg").alias("db")), "pb")
    )
    # pa < pb canonically, so a (da, id) tie keeps pa as the source.
    a_first = (F.col("da") < F.col("db")) | (F.col("da") == F.col("db"))
    return ed.select(
        F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("ddeg"),
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_WIN_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_WIN_HI).cast("timestamp"))
    )
    pp = li.select("l_orderkey", "l_partkey").distinct()
    a, b = pp.alias("a"), pp.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
    )
    oe = _oriented_edges(edges)
    e1, e2, e3 = oe.alias("e1"), oe.alias("e2"), oe.alias("e3")
    # Wedge (u; v, w) from the minimum-rank vertex u only, with the two
    # out-neighbours rank-ordered v < w, closed by the oriented edge v→w:
    # counts each triangle exactly once (see module docstring).
    rank_vw = (F.col("e1.ddeg") < F.col("e2.ddeg")) | (
        (F.col("e1.ddeg") == F.col("e2.ddeg")) & (F.col("e1.dst") < F.col("e2.dst"))
    )
    tri = (
        e1.join(e2, (F.col("e1.src") == F.col("e2.src")) & rank_vw)
        .join(
            e3,
            (F.col("e1.dst") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wedge = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("long").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        wedge.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("clustering_coeff"),
        )
    )


GRAPH_TRIANGLE_COUNT_SQL = f"""
WITH pp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_WIN_LO} 00:00:00'
    AND l_shipdate < TIMESTAMP '{_WIN_HI} 00:00:00'
),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e
  ) GROUP BY node
),
wedge AS (
  SELECT COUNT(*) AS n_nodes,
         CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
            JOIN e e3 ON e1.pa = e3.pa AND e2.pb = e3.pb
),
ne AS (SELECT COUNT(*) AS n_edges FROM e)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CAST(3.0 AS DOUBLE) * CAST(n_triangles AS DOUBLE)
         / CAST(n_wedges AS DOUBLE) AS clustering_coeff
FROM wedge, ne, tri
"""


QUERIES = {
    "graph_triangle_count": graph_triangle_count,
}

ORACLES = {
    "graph_triangle_count": GRAPH_TRIANGLE_COUNT_SQL,
}
