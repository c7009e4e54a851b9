"""A/B: regexp_count vs size(regexp_extract_all) for pii_scrub at sf1.0."""
from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from pdxbldgimport_spark import queries as base  # noqa: E402
from pdxbldgimport_spark.queries_crawl import (  # noqa: E402
    PII_EMAIL, PII_IP, PII_PHONE,
)
from pdxbldgimport_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="pii_ab", cores=32)
    base.views(spark, SF_DIR)
    t = spark.table("pages_pii")

    def scrub():
        return F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
                PII_PHONE, "<PHONE>"),
            PII_IP, "<IP>")

    def run(label, df):
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            noop(df)
            best = min(best, time.time() - t0)
        print(f"{label}: {best:.2f}s", flush=True)

    def counts_old(pat):
        return F.size(F.regexp_extract_all(F.col("text"), F.lit(pat),
                                           F.lit(0))).cast("long")

    def counts_new(pat):
        return F.regexp_count(F.col("text"), F.lit(pat)).cast("long")

    run("scrub only (3 replace + md5 + len)", t.select(
        "page_id", F.md5(scrub().cast("binary")).alias("m"),
        F.length(scrub()).cast("long").alias("l")))
    run("counts only OLD (3 extract_all)", t.select(
        "page_id", *[counts_old(p).alias(f"c{i}") for i, p in
                     enumerate([PII_EMAIL, PII_PHONE, PII_IP])]))
    run("counts only NEW (3 regexp_count)", t.select(
        "page_id", *[counts_new(p).alias(f"c{i}") for i, p in
                     enumerate([PII_EMAIL, PII_PHONE, PII_IP])]))
    spark.stop()


if __name__ == "__main__":
    main()
