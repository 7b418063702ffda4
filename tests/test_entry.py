"""Driver-contract tests: entry() smoke, queries()/oracle_sql() parity, and
a fast full sweep of every query at sf0.001 (schema sanity + rows)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


def test_entry_smoke(spark, sf_dir):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"month", "c_name", "transaction_count", "total_amount"}


def test_every_query_has_matching_oracle_aliases():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # every oracle key must refer to a real query; queries without oracle are
    # allowed (weaker rows-only check) but should be the exception
    assert set(o) <= set(q)
    missing = set(q) - set(o)
    assert len(missing) <= max(2, len(q) // 4), f"too many oracle-less queries: {missing}"


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_at_smallest_sf(spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, sf_dir)
    # schema must be resolvable and the query executable end-to-end
    assert df.columns, name
    df.limit(3).collect()
