"""Storage-bucketed co-located joins — the table-layout lever that
removes the join exchange entirely at 10^12 rows.

Every repeated doc-keyed join in this engine (pages ⋈ embeddings,
pages ⋈ dedup labels, assignment ⋈ metrics) pays one hash exchange per
side per query when the tables are laid out unbucketed. Writing both
sides bucketed by the join key (Spark ``bucketBy`` here; Iceberg
``bucket(N, doc_id)`` partition transform in production — the
north_star's table format) makes the SCAN itself satisfy the join's
required distribution: Catalyst plans the join with NO Exchange on
either side, so the petabyte never re-shuffles no matter how many
queries join on that key. This module is the minimal, test-guarded
demonstration (tests/test_bucketing.py asserts the exchange-free plan
side by side with the exchanged unbucketed twin).

Cluster notes: bucket counts must MATCH across tables meant to co-join
(or divide evenly with ``spark.sql.bucketing.coalesceBucketsInJoin``);
``sortBy`` within buckets additionally removes the join's Sort. The
reference analog is its persistent keyed PostGIS tables + indexes built
once at load (add_spatial_index sites) and reused by every later query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external parquet table bucketed (and
    bucket-sorted) by ``bucket_col`` — the layout-time cost that every
    later equi-join on that key amortizes."""
    w = (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.mode("overwrite").saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
