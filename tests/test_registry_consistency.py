"""Registry / bench wiring guards — cheap checks that would have
caught the r4 driver-record truncation class of problem at commit
time: every bench sweep name must be a registered query, every
registered query must carry an oracle (or be a known rows-only
exception), and the front-ordering list must be duplicate-free."""

from __future__ import annotations


def test_bench_sweep_names_are_registered():
    import bench
    from pdxbldgimport_spark import registry as Q

    missing = [n for n in bench.BENCH_QUERIES if n not in Q.QUERIES]
    assert not missing, missing
    dupes = {
        n for n in bench.BENCH_QUERIES if bench.BENCH_QUERIES.count(n) > 1
    }
    assert not dupes, dupes


def test_front_order_is_duplicate_free_and_registered():
    from pdxbldgimport_spark import registry as R

    assert len(R._FRONT) == len(set(R._FRONT))
    missing = [n for n in R._FRONT if n not in R.QUERIES]
    assert not missing, missing


def test_every_query_has_an_oracle():
    from pdxbldgimport_spark import registry as Q

    # genuinely non-SQL-expressible entries are allowed to be
    # rows-only, but the set must be explicit — additions here are a
    # review decision, not an accident
    rows_only_allowed: set = set()
    no_oracle = {
        n for n in Q.QUERIES if n not in Q.ORACLES
    } - rows_only_allowed
    assert not no_oracle, no_oracle


def test_entry_surface_exports_all_queries():
    import importlib.util
    import sys

    import os

    entry_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    spec = importlib.util.spec_from_file_location(
        "spark_entry_check", entry_path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry_check"] = mod
    spec.loader.exec_module(mod)
    from pdxbldgimport_spark import registry as Q

    assert set(mod.queries().keys()) == set(Q.QUERIES.keys())
    assert set(mod.oracle_sql().keys()) == set(Q.ORACLES.keys())
