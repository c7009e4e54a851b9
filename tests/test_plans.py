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


def test_knn_plan_broadcast_is_size_conditional(spark):
    """The kNN candidate ring is broadcast ONLY under the size gate: a
    small candidate side broadcasts (zero point-side shuffle before the
    window); a side over the gate must NOT force a broadcast — at 100×
    the exploded ring is billions of rows and a forced broadcast OOMs.
    Both shapes asserted so neither regression (forced broadcast, or
    never-broadcast) survives."""
    import pandas as pd

    from pdxbldgimport_spark.operators.knn import knn_join

    # small candidates at sf0.001 → under the gate → broadcast plan
    plan = _plan(Q.QUERIES["knn_unassigned"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    pts = spark.createDataFrame(
        pd.DataFrame({"page_id": [1, 2], "lon": [-122.5, -122.6], "lat": [45.4, 45.5]})
    )
    cents = spark.createDataFrame(
        pd.DataFrame(
            {"fp_id": [1], "centroid_lon": [-122.5], "centroid_lat": [45.4]}
        )
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        forced = _plan(
            knn_join(pts, cents, "page_id", "fp_id", broadcast_max_ring_rows=0)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in forced  # gate respected → shuffle join
