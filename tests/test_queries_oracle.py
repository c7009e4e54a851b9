"""Every registered query vs its DuckDB oracle at sf0.01 — the same check
the driver's correctness gate performs (order-insensitive exact value
comparison)."""

from __future__ import annotations

import pytest

# the aggregate registry, NOT queries: parametrize evaluates at import
# time, and importing only the base module would silently shrink the
# oracle sweep to whatever other test files happened to import first
from pdxbldgimport_spark import registry as Q
from tests.conftest import SF_ORACLE, compare


@pytest.mark.parametrize("name", sorted(Q.ORACLES))
def test_query_matches_oracle(name, spark, duck):
    df = Q.QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, Q.ORACLES[name])


def test_all_queries_run_and_nonempty(spark):
    for name, fn in Q.QUERIES.items():
        n = fn(spark, SF_ORACLE).count()
        assert n >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
