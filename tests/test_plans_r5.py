"""Plan guards for the round-5 closing-sweep operators: the shapes
that make them scale must survive planner/config drift — pushed-down
scans for the pure filter-aggs, broadcast (never shuffled/NLJ) dims,
no Python anywhere, and no single-task windows in the rank paths."""

from __future__ import annotations

from pdxbldgimport_spark import registry as Q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_forecast_revenue_pushdown_no_join(spark):
    plan = _plan(Q.QUERIES["forecast_revenue"](spark, SF))
    # Q6 is scan → filter → one partial/final agg: no join, filters
    # reach the parquet scan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThan" in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_discount_revenue_broadcasts_part_dim(spark):
    plan = _plan(Q.QUERIES["discount_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "NestedLoop" not in plan


def test_zrange_bbox_count_is_scan_filter_agg(spark):
    plan = _plan(Q.QUERIES["zrange_bbox_count"](spark, SF))
    # the whole query is codegen filter + count: no join, no window,
    # no Python — the range OR-chain and the refine live in one stage
    assert "Join" not in plan
    assert "Window" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_hilbert_layout_lookup_is_broadcast(spark):
    plan = _plan(Q.QUERIES["hilbert_layout"](spark, SF))
    # the 65k cell->key lookup joins as a broadcast; the rank path is
    # the bucket-offset decomposition — windows exist but none may be
    # the dreaded global single-partition sort-window over the corpus
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_quadkey_encode_no_shuffle_no_python(spark):
    plan = _plan(Q.QUERIES["quadkey_encode"](spark, SF))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "HashAggregate" not in plan  # pure per-row encode
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_orders_rfm_no_global_window(spark):
    plan = _plan(Q.QUERIES["orders_rfm"](spark, SF))
    # quintiles come from global_rank's bucketed decomposition: every
    # Window in the plan is partitioned (bucket or the 1-row offset
    # table) — the raw-corpus schema must never appear in an
    # unpartitioned window's child. Proxy guard: no NTILE anywhere.
    assert "ntile" not in plan.lower()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_host_ppr_iterations_are_hash_joins(spark):
    plan = _plan(Q.QUERIES["host_ppr"](spark, SF))
    assert "NestedLoop" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_tile_contour_cases_grid_joins_broadcast(spark):
    plan = _plan(Q.QUERIES["tile_contour_cases"](spark, SF))
    # the corner shifts join the GRID-bounded relation — broadcast
    # hash joins, never a sort-merge over the corpus
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_segment_crossings_broadcast_ring_pure_codegen(spark):
    plan = _plan(Q.QUERIES["segment_crossings"](spark, SF))
    # ring side is gate-size → broadcast hash join on cell; the
    # orientation straddle refine is codegen arithmetic — no nested
    # loop, no Python, no sort-merge over the pair space
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
    assert "SortMergeJoin" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_tile_hillshade_grid_joins_broadcast_no_python(spark):
    plan = _plan(Q.QUERIES["tile_hillshade"](spark, SF))
    # neighbor reads join the GRID-bounded relation — broadcast hash
    # joins; the Horn gradient is a partial+final SUM, pure codegen
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_hexbin_counts_pure_codegen_single_agg(spark):
    plan = _plan(Q.QUERIES["hexbin_counts"](spark, SF))
    # per-row axial/cube-round arithmetic + one partial/final hash agg:
    # no join, no window, no Python anywhere
    assert "Join" not in plan
    assert "Window" not in plan
    assert "HashAggregate" in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_hex_smooth_broadcast_joins_no_python(spark):
    plan = _plan(Q.QUERIES["hex_smooth"](spark, SF))
    # neighbor reads and the assembly join the HEX-bounded relation —
    # broadcast hash joins only, no sort-merge, no Python
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
