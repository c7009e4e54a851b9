"""Bucketed-layout co-located join: writing both sides bucketed by the
join key removes the join Exchange entirely (the Iceberg bucket()
story at 10^12 rows), while the unbucketed twin of the same join
shuffles both sides. Results must be identical either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdxbldgimport_spark.plans.bucketing import drop_table, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def no_broadcast(spark):
    """Force the shuffle-join planner so the Exchange presence/absence
    is attributable to the table layout, not to broadcast thresholds."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, tmp_path, no_broadcast):
    left = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("v")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 31).alias("w")
    )
    try:
        write_bucketed(left, "bkt_left", str(tmp_path / "l"), "doc_id", 8)
        write_bucketed(right, "bkt_right", str(tmp_path / "r"), "doc_id", 8)

        joined = spark.table("bkt_left").join(
            spark.table("bkt_right"), "doc_id"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # unbucketed twin: same data, plain parquet — the join must
        # exchange both sides
        left.write.mode("overwrite").parquet(str(tmp_path / "lu"))
        right.write.mode("overwrite").parquet(str(tmp_path / "ru"))
        plain = spark.read.parquet(str(tmp_path / "lu")).join(
            spark.read.parquet(str(tmp_path / "ru")), "doc_id"
        )
        assert "Exchange" in _plan(plain)

        # identical results either way
        a = sorted(joined.collect())
        b = sorted(plain.collect())
        assert a == b and len(a) == 5000
    finally:
        drop_table(spark, "bkt_left")
        drop_table(spark, "bkt_right")
