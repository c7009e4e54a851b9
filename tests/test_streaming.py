"""Structured-Streaming ingest tests: exactly-once incremental counts
across arriving dumps + checkpoint resume, and stateful streaming url
dedup (first-seen wins across micro-batches)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdxbldgimport_spark.queries import views
from pdxbldgimport_spark.streaming import ingest as S

SF = "/root/testdata/sf0.001"


def _dump(pages, path, lo, hi):
    pages.where(f"page_id >= {lo} AND page_id < {hi}").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_incremental_tile_counts_match_batch(spark, tmp_path):
    views(spark, SF)
    pages = spark.table("pages")
    schema = pages.schema
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    # dump 1 arrives → drain
    _dump(pages, f"{src}/d1", 0, 4000)
    S.stream_tile_counts(spark, f"{src}/*", schema, ckpt, out)
    got1 = {r["tile_id"]: r["page_count"] for r in S.read_tile_counts(spark, out).collect()}
    want1 = {
        r["tile_id"]: r["cnt"]
        for r in pages.where("page_id < 4000")
        .groupBy(S.tile_expr(F.col("lon"), F.col("lat")).alias("tile_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got1 == want1

    # dump 2 arrives → resume from checkpoint, only the new file processed
    _dump(pages, f"{src}/d2", 4000, 9000)
    S.stream_tile_counts(spark, f"{src}/*", schema, ckpt, out)
    got2 = {r["tile_id"]: r["page_count"] for r in S.read_tile_counts(spark, out).collect()}
    want2 = {
        r["tile_id"]: r["cnt"]
        for r in pages.where("page_id < 9000")
        .groupBy(S.tile_expr(F.col("lon"), F.col("lat")).alias("tile_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got2 == want2
    # exactly-once: partials for dump 1 were not re-emitted on resume
    total_partials = spark.read.parquet(out).agg(F.sum("cnt")).collect()[0][0]
    assert total_partials == sum(want2.values())


def test_tile_counts_survive_sink_commit_crash(spark, tmp_path):
    """foreachBatch is at-least-once: crash AFTER the sink write but
    BEFORE the checkpoint commit replays the batch on resume. Simulate
    the exact window by deleting the newest ckpt/commits entry (the sink
    output stays on disk), then resume — the replayed batch must land on
    its deterministic batch_id dir, not append a second copy."""
    views(spark, SF)
    pages = spark.table("pages")
    schema = pages.schema
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    _dump(pages, f"{src}/d1", 0, 4000)
    S.stream_tile_counts(spark, f"{src}/*", schema, ckpt, out)
    want = {r["tile_id"]: r["page_count"] for r in S.read_tile_counts(spark, out).collect()}

    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))  # crash window
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):  # hadoop checksum shadow of the commit file
        os.remove(crc)

    S.stream_tile_counts(spark, f"{src}/*", schema, ckpt, out)  # resume → replay
    got = {r["tile_id"]: r["page_count"] for r in S.read_tile_counts(spark, out).collect()}
    assert got == want  # idempotent replay: totals not inflated


def test_streaming_url_dedup_first_seen_wins(spark, tmp_path):
    views(spark, SF)
    pages = spark.table("pages")
    schema = pages.schema
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    _dump(pages, f"{src}/d1", 0, 3000)
    S.stream_distinct_urls(spark, f"{src}/*", schema, ckpt, out)
    n1 = spark.read.parquet(out).count()
    assert n1 == 3000  # urls are unique per page in the synth world

    # dump 2 overlaps dump 1 (0-3000 re-sent plus 3000-5000 new)
    _dump(pages, f"{src}/d2", 0, 5000)
    S.stream_distinct_urls(spark, f"{src}/*", schema, ckpt, out)
    got = spark.read.parquet(out)
    assert got.count() == 5000  # overlap deduped by the state store
    assert got.select("url").distinct().count() == 5000
