"""Deterministic sketch operators (north-star "novel sketch" scope).

``hll_distinct_events`` is a real HyperLogLog built from engine-neutral
primitives so that — unusually for a sketch — its output is exactly
value-hash-checkable against an independent engine:

* the hash is the repo's md5-derived 60-bit uniform (``hex_hash``), so
  both engines see identical bits;
* register index = low 10 bits, rho = leading-zero count of the
  remaining 50 bits + 1, computed as ``51 - length(ltrim('0',
  bin(rest)))`` — pure integer/string ops, no floating log;
* the harmonic denominator ``sum(2^-M)`` is kept EXACT by scaling to
  ``sum(2^(62-M))`` in DECIMAL(38,0) (max register 51 keeps every term
  integral), with empty registers folded in arithmetically;
* only the final estimate divides two deterministic doubles.

Scale shape: one narrow projection, one 1024-key hash aggregation
(map-side combined — at most m rows cross the wire per partition),
one scalar agg. This is the mergeable-sketch pattern: per-partition
register vectors combine by element-wise max, which is exactly what
the partial/final Max aggregation already does. The exact
``countDistinct`` rides along only to report the sketch's observed
relative error; a production caller would drop it (it is the
expensive half of the query).

Reference scope: the reference profiles distinct counts exactly
(spark/jobs equivalents use COUNT(DISTINCT)); the sketch is the 100 TB
path where exact distinct is a full extra shuffle of every key.

Deliberate omission: the small-range linear-counting correction
(``m * ln(m/V)`` when the raw estimate is under 2.5m) needs ``ln``,
which is not bit-identical across engines — adding it would break the
zero-tolerance oracle. The raw estimate plus the reported
``rel_error`` keeps the regime visible instead (at sf0.001 the corpus
sits in that regime; at sf0.01+ the raw estimate is within ~0.1%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.textops import hex_hash

HLL_M = 1024  # registers (p=10)
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# alpha * m^2 * 2^62 — the whole numerator as ONE double literal so both
# engines parse the identical constant
_NUM = repr(_ALPHA * HLL_M * HLL_M * float(1 << 62))
_POW62 = 1 << 62


def hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    h = hex_hash(F.col("event_id").cast("string"), seed="hll")
    t = e.select(h.alias("h")).select(
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("rest"),
    )
    rho = F.lit(51) - F.length(F.expr("ltrim('0', conv(rest, 10, 2))"))
    regs = t.select("bucket", rho.alias("rho")).groupBy("bucket").agg(
        F.max("rho").alias("M")
    )
    a = regs.agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.expr("CAST(shiftleft(1L, 62 - M) AS DECIMAL(38,0))")).alias("s_obs"),
    )
    x = e.agg(F.countDistinct("event_id").alias("n_exact"))
    s_total = F.expr(
        f"s_obs + CAST({HLL_M}L - n_obs AS DECIMAL(38,0))"
        f" * CAST({_POW62} AS DECIMAL(38,0))"
    )
    est = F.lit(float(_NUM)) / s_total.cast("double")
    n_exact_d = F.col("n_exact").cast("double")
    return a.crossJoin(x).select(
        F.lit(HLL_M).cast("long").alias("m"),
        F.col("n_obs").alias("n_nonzero_registers"),
        F.col("n_exact").alias("n_exact_distinct"),
        est.alias("hll_estimate"),
        ((est - n_exact_d) / n_exact_d).alias("rel_error"),
    )


HLL_DISTINCT_EVENTS_SQL = f"""
WITH h AS (
  SELECT CAST(concat('0x', substr(md5(concat('hll', CAST(event_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
  FROM events
),
t AS (SELECT h % {HLL_M} AS bucket, h // {HLL_M} AS rest FROM h),
r AS (
  SELECT bucket, MAX(51 - length(ltrim(bin(rest), '0'))) AS M
  FROM t GROUP BY bucket
),
a AS (
  SELECT COUNT(*) AS n_obs,
         SUM(CAST(1::BIGINT << (62 - M) AS DECIMAL(38,0))) AS s_obs
  FROM r
),
x AS (SELECT COUNT(DISTINCT event_id) AS n_exact FROM events)
SELECT CAST({HLL_M} AS BIGINT) AS m,
       n_obs AS n_nonzero_registers,
       n_exact AS n_exact_distinct,
       {_NUM} / CAST(s_obs + CAST({HLL_M} - n_obs AS DECIMAL(38,0))
                     * CAST({_POW62} AS DECIMAL(38,0)) AS DOUBLE) AS hll_estimate,
       ({_NUM} / CAST(s_obs + CAST({HLL_M} - n_obs AS DECIMAL(38,0))
                      * CAST({_POW62} AS DECIMAL(38,0)) AS DOUBLE)
        - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_error
FROM a, x
"""


QUERIES = {
    "hll_distinct_events": hll_distinct_events,
}

ORACLES = {
    "hll_distinct_events": HLL_DISTINCT_EVENTS_SQL,
}
