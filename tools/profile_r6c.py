"""Session-3 profiling, part 2: manual count-distinct decomposition for
table_profile and html_tag_stats. A/B at $SPARK_GRAFT_SF_DIR, noop sink,
min-of-2; PROF_REP_MULT re-renders pages for sf1.0-volume html tests."""
from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from pdxbldgimport_spark import queries as base  # noqa: E402
from pdxbldgimport_spark.queries_relational import _PROFILE_COLS  # noqa: E402
from pdxbldgimport_spark.queries_crawl import _TAG_RE  # noqa: E402
from pdxbldgimport_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run(label, df, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        noop(df)
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.2f}s", flush=True)


def cksum(label, df):
    h = df.select(
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    print(f"{label}: n={h['n']} h={h['h']}", flush=True)


def profile(spark):
    n = len(_PROFILE_COLS)
    stack_args = ", ".join(
        f"'{c}', {sp}" for c, (sp, _) in _PROFILE_COLS.items())
    u = spark.table("lineitem").select(
        F.expr(f"stack({n}, {stack_args}) AS (col, val)"))
    old = u.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"))
    g1 = u.groupBy("col", "val").agg(F.count(F.lit(1)).alias("cnt"))
    new = g1.groupBy("col").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), F.col("cnt"))
              .otherwise(F.lit(0))).alias("n_null"),
        F.count("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"))
    run("table_profile OLD (countDistinct)", old)
    run("table_profile NEW (2-stage)", new)
    cksum("profile old", old)
    cksum("profile new", new)


def tags(spark):
    t = spark.table("pages").select(
        "page_id",
        F.explode(F.regexp_extract_all(
            F.col("html").cast("string"), F.lit(_TAG_RE), F.lit(1)))
        .alias("tag"))
    old = t.groupBy(F.lower("tag").alias("tag")).agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("page_id").cast("long").alias("n_pages"))
    g1 = t.groupBy(F.lower("tag").alias("tag"), F.col("page_id")).agg(
        F.count(F.lit(1)).alias("cnt"))
    new = g1.groupBy("tag").agg(
        F.sum("cnt").cast("long").alias("n_occurrences"),
        F.count(F.lit(1)).cast("long").alias("n_pages"))
    run("html_tag_stats OLD", old)
    run("html_tag_stats NEW (2-stage)", new)
    cksum("tags old", old)
    cksum("tags new", new)


def main():
    spark = get_spark(app_name="profile_r6c", cores=32)
    base.views(spark, SF_DIR)
    mult = int(os.environ.get("PROF_REP_MULT", "1"))
    if mult > 1:
        from pdxbldgimport_spark import synth
        params = dict(synth._CONST)
        params.update(synth._DIALECT["spark"])
        big_rep = int(params["REP"]) * mult
        params["REP"] = str(big_rep)
        params["CROSS_REP"] = (
            f"CROSS JOIN (SELECT id AS r FROM range({big_rep})) r")
        spark.sql(synth._force_double(
            synth._PAGES.format(**params))).createOrReplaceTempView("pages")
        print(f"pages re-rendered at REP x{mult}", flush=True)
    which = sys.argv[1:] or ["profile", "tags"]
    if "profile" in which:
        profile(spark)
    if "tags" in which:
        tags(spark)
    spark.stop()


if __name__ == "__main__":
    main()
