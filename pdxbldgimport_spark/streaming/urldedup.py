"""Watermarked streaming ingest dedup by canonical URL.

The third streaming shape a continuously-ingesting crawl pipeline needs
(next to the stateful sessionizer and the built-in windowed rollup):
arriving pages are canonicalized MAP-SIDE (stateless string rewriting,
no state), then aggregated per (event-time window, canonical URL) with
a watermark — Spark owns the per-key state, finalizes a key's group
exactly once when the watermark passes the window end, and drops
later-than-watermark stragglers, keeping state O(open windows × keys in
them) instead of O(all URLs ever seen).

Deterministic first-seen-wins: the surviving page per canonical group is
MIN(page_id) — unlike streaming ``dropDuplicates`` (whose survivor
depends on partition arrival order), the aggregated min is
order-independent, so the drained output hash-matches the batch oracle.

Exactly-once story: append-mode + file sink + checkpoint, same as
windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

WATERMARK = "1 hour"
WINDOW = "24 hours"


def stream_url_dedup(
    spark: SparkSession,
    src_glob: str,
    schema,
    ckpt_dir: str,
    out_dir: str,
    watermark: str = WATERMARK,
    window: str = WINDOW,
    max_files_per_trigger: int | None = 1,
) -> dict | None:
    """Drain available page dumps; finalized (window, canonical_url)
    groups append to ``out_dir`` with n_pages + min page_id."""
    from ..queries_web import canonical_url_expr

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pg = (
        reader.parquet(src_glob)
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            "page_id",
            canonical_url_expr("url").alias("canonical_url"),
        )
        .withWatermark("ts", watermark)
    )
    # group on the full window struct (see windows.py: extracting .start
    # inside the groupBy severs the watermark link)
    agg = (
        pg.groupBy(F.window("ts", window), "canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("page_id").alias("first_page_id"),
        )
        .select("canonical_url", "n_pages", "first_page_id")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q.lastProgress


def read_url_groups(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
