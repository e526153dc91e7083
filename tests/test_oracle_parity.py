"""Replay the driver's t2 correctness check locally for every
registered query that has an oracle: exact value parity expected."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_con


def _pairs():
    import __spark_entry__ as entry

    qs = entry.queries()
    os_ = entry.oracle_sql()
    return [(name, qs[name], os_[name]) for name in sorted(qs) if name in os_]


def _ids():
    return [name for name, _, _ in _pairs()]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=_ids())
def test_query_matches_oracle(spark, sf_dir, name, fn, sql):
    con = duckdb_con(sf_dir)
    sdf = fn(spark, sf_dir)
    odf = con.execute(sql).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0
