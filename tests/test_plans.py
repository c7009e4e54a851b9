"""Physical-plan shape guards (PLANS.md claims, §4 optimizer story):
the flagship plans must KEEP the shapes that make them scale — a
broadcast hash join on the point side, partial+final hash aggregation,
and no Python/pandas operator upstream of the petabyte side. These
catch silent planner regressions (a config change flipping the join to
sort-merge, a refactor sneaking a mapInPandas onto the point side)."""

from __future__ import annotations

from pdxbldgimport_spark import registry as Q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pip_assign_is_broadcast_join_no_python_on_point_side(spark):
    plan = _plan(Q.QUERIES["pip_assign"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the refine is folded into join/filter arithmetic — the POINT side
    # (everything at/below the join) must not contain a Python operator.
    # Plan text is operator-indented; the broadcast (cover) side appears
    # under BroadcastExchange/BroadcastQueryStage. MapInPandas may occur
    # nowhere in this plan at all:
    assert "MapInPandas" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_page_tile_counts_partial_final_agg(spark):
    plan = _plan(Q.QUERIES["page_tile_counts"](spark, SF))
    # map-side combine: two HashAggregate levels around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan
    assert "MapInPandas" not in plan


def test_metro_join_ships_no_rings_through_cell_exchange(spark):
    """intersects_join: the cell-join exchanges carry ids+cells only;
    ring geometry is re-attached after pair dedup. If rings rode the
    cell shuffle, an Exchange input schema would contain the array
    column."""
    from pdxbldgimport_spark.queries_osm import q_metro_bldgs

    plan = _plan(q_metro_bldgs(spark, SF))
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(cell[^\n]*", plan):
        assert "__rings" not in m.group(0)


def test_knn_plan_is_broadcastable_candidates(spark):
    plan = _plan(Q.QUERIES["knn_unassigned"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
