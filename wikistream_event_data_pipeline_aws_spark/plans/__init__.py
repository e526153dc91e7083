"""Named batch query plans.

Each module exposes query builder functions ``(spark, sf_dir) -> DataFrame``
and an ``ORACLES`` dict mapping query name -> equivalent DuckDB SQL
(or None for non-SQL-expressible operators). ``registry.py`` collects
them for ``__spark_entry__``.

Oracle-parity discipline (SURVEY.md §7.3 traps):
- never SUM/AVG raw doubles (aggregation order would make results
  nondeterministic): cast to DECIMAL first, convert back to DOUBLE in
  the final projection with an identical expression tree on both sides;
- float literals in oracle SQL are written ``CAST(x AS DOUBLE)`` so
  DuckDB doesn't fall into DECIMAL arithmetic where Spark uses double;
- integer CASE/SUM results are CAST(... AS BIGINT) in oracle SQL so
  DuckDB's HUGEINT sums match Spark's LongType;
- time keys are emitted as strings/ints (date strings, hour ints), not
  raw timestamps, to avoid timezone/precision drift in the comparator.
"""
