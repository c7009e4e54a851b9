"""Structured-Streaming incremental ingest.

The reference is pure batch (SURVEY.md §2.9) — its "incremental" story
is the rake timestamp DAG. This module is the engine's streaming
extension for continuously-arriving page dumps (the Common-Crawl-style
input of BASELINE.json): new parquet files landing in a directory are
processed exactly once (file-source offsets + checkpoint), maintaining

- per-tile page counts (`stream_tile_counts`): map-side partial counts
  appended per micro-batch; readers sum partials — the streaming analog
  of A4 (tasks/metro_quarter_secs.rake:19-27) that never rewrites state;
- first-seen url dedup (`stream_distinct_urls`): streaming
  ``dropDuplicates`` backed by the state store — the byte-identical
  text-per-url invariant enforced at ingest.

Both run with ``trigger(availableNow=True)`` (drain-everything-then-stop)
so batch tests and cron-style incremental runs share one code path; a
killed run resumes from ``checkpointLocation`` without reprocessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..geo import cells as C
from ..operators.pip_join import tile_expr


def pages_stream(spark: SparkSession, src_dir: str, schema) -> DataFrame:
    """File-source stream of page dumps (one parquet file per dump)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )


def stream_tile_counts(
    spark: SparkSession, src_dir: str, schema, ckpt_dir: str, out_dir: str
) -> None:
    """Maintain per-tile page counts incrementally. Each micro-batch
    writes its partial counts (tile_id, cnt) to a DETERMINISTIC location
    keyed by batch_id (``out_dir/batch_id=<id>``, overwrite): foreachBatch
    is only at-least-once — a crash between the sink write and the
    checkpoint offset commit replays the batch on resume — so the replay
    must land on the same path, not append a second copy. Readers fold
    partials across batch dirs. Map-side combine keeps the shuffle tiny
    at any rate."""
    stream = pages_stream(spark, src_dir, schema).select(
        tile_expr(F.col("lon"), F.col("lat"), C.RES_TILE).alias("tile_id")
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        (
            batch.groupBy("tile_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_tile_counts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold the partial-count ledger into current totals. ``batch_id``
    partition discovery is incidental — a replayed batch overwrote its
    own dir, so summing across batch dirs never double-counts."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("tile_id")
        .agg(F.sum("cnt").alias("page_count"))
    )


def stream_distinct_urls(
    spark: SparkSession, src_dir: str, schema, ckpt_dir: str, out_dir: str
) -> None:
    """First-seen-wins url dedup across micro-batches — streaming
    ``dropDuplicates`` keeps seen keys in the state store, so a url
    arriving again in a later dump (or after a resume) is dropped."""
    stream = (
        pages_stream(spark, src_dir, schema)
        .select("url", "page_id", "text")
        .dropDuplicates(["url"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
