"""Resume-from-checkpoint tests (SURVEY.md §5 resume strategy; north_rule
per-partition lineage + metrics): run the checkpointed pipeline, kill
state at stage k, resume, assert identical outputs and correct
skip/rebuild sets. One pipeline build shared across assertions — stage
writes have high fixed job latency in this sandbox."""

from __future__ import annotations

import json
import os
import shutil

from pdxbldgimport_spark.plans.manifest import StageRunner, run_pipeline

SF = "/root/testdata/sf0.001"


def _payloads(spark, root):
    df = spark.read.parquet(os.path.join(root, "tile_export", "data"))
    return sorted(
        (r["qtrsec"], r["n_features"], r["payload"]) for r in df.collect()
    )


def test_pipeline_resume_lifecycle(spark, tmp_path):
    root = str(tmp_path / "ckpt")

    # 1. cold run: everything builds
    rep1 = run_pipeline(spark, SF, root)
    assert rep1["skipped"] == [] and len(rep1["built"]) == 11
    out1 = _payloads(spark, root)
    assert out1  # produced tiles

    # 2. manifest carries per-partition lineage + metrics
    with open(os.path.join(root, "pdx_bldgs", "manifest.json")) as f:
        m = json.load(f)
    assert m["row_count"] == sum(m["partition_rows"].values())
    assert m["n_partitions"] == len(m["partition_rows"]) >= 1
    assert m["deps"] == ["pdx_bldg_view", "house_and_garage"]
    assert m["wall_s"] > 0

    # 3. warm run: everything fresh → all skipped, outputs unchanged
    rep2 = run_pipeline(spark, SF, root)
    assert rep2["built"] == [] and len(rep2["skipped"]) == 11
    assert _payloads(spark, root) == out1

    # 3b. ingest manifests carry the planning stats the joins consume
    with open(os.path.join(root, "pages_ingest", "manifest.json")) as f:
        pm = json.load(f)
    assert "hot_cells" in pm and pm["hot_threshold"] > 0
    with open(os.path.join(root, "footprints_ingest", "manifest.json")) as f:
        fm = json.load(f)
    assert fm["row_count"] > 0

    # 4. crash mid-run: stages after 'addr_bldg_counts' never committed
    # (manifest write is atomic — a killed stage leaves no manifest)
    for stage in ["house_and_garage", "pdx_bldg_view", "pdx_bldgs", "tile_export"]:
        shutil.rmtree(os.path.join(root, stage))
    rep3 = run_pipeline(spark, SF, root)
    assert set(rep3["skipped"]) == {
        "pages_ingest", "footprints_ingest", "pip_assign", "knn_unassigned",
        "cbldg_enriched", "pdx_addrs", "addr_bldg_counts",
    }
    assert rep3["built"] == [
        "house_and_garage", "pdx_bldg_view", "pdx_bldgs", "tile_export",
    ]
    assert _payloads(spark, root) == out1


def _build_a(spark, n):
    # shared factories so every run presents IDENTICAL build source —
    # the code token (getsource of the callable) is part of the
    # staleness fingerprint, and getsource on an inline lambda captures
    # its whole enclosing statement (r1/r2 variable names included)
    return lambda: spark.range(n)


def _build_b(a):
    return lambda: a.selectExpr("id * 2 AS id2")


def test_stage_runner_detects_stale_inputs(spark, tmp_path):
    """inputs_token change (source snapshot moved) invalidates every
    stage — the updated_at-newer-than semantics of the reference DAG."""
    root = str(tmp_path / "ckpt")
    r1 = StageRunner(spark, root, inputs_token="v1")
    a = r1.stage("a", [], _build_a(spark, 10))
    r1.stage("b", ["a"], _build_b(a))
    assert r1.run_report() == {"built": ["a", "b"], "skipped": []}

    r2 = StageRunner(spark, root, inputs_token="v1")
    a = r2.stage("a", [], _build_a(spark, 10))  # fresh → skipped
    r2.stage("b", ["a"], _build_b(a))
    assert r2.run_report() == {"built": [], "skipped": ["a", "b"]}

    r3 = StageRunner(spark, root, inputs_token="v2")  # inputs changed
    a = r3.stage("a", [], _build_a(spark, 20))
    r3.stage("b", ["a"], _build_b(a))
    assert r3.run_report() == {"built": ["a", "b"], "skipped": []}
    assert spark.read.parquet(os.path.join(root, "b", "data")).count() == 20


def test_stage_runner_detects_stale_code(spark, tmp_path):
    """Editing a stage's build logic (same name, same inputs) must
    invalidate its checkpoint — the engine-fingerprint ADVICE item."""
    root = str(tmp_path / "ckpt")
    r1 = StageRunner(spark, root, inputs_token="v1")
    r1.stage("a", [], lambda: spark.range(10))
    assert r1.run_report() == {"built": ["a"], "skipped": []}

    r2 = StageRunner(spark, root, inputs_token="v1")
    r2.stage("a", [], lambda: spark.range(10).selectExpr("id + 1 AS id"))
    assert r2.run_report() == {"built": ["a"], "skipped": []}  # code changed
    got = spark.read.parquet(os.path.join(root, "a", "data"))
    assert got.agg({"id": "min"}).collect()[0][0] == 1
