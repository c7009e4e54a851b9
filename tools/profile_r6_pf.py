"""Round-6 profiling: dissect dedup_prefix_filter at a given SF.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/profile_r6_pf.py
Prints per-stage wall times and cardinalities (noop sinks, guide §1.4).
"""
from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import Window as Wnd, functions as F  # noqa: E402

from pdxbldgimport_spark import queries as base  # noqa: E402
from pdxbldgimport_spark.queries import stage  # noqa: E402
from pdxbldgimport_spark.queries_text import (  # noqa: E402
    PF_T10,
    _dsh_df,
)
from pdxbldgimport_spark.session import get_spark, session_token  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s" + (f"  -> {out}" if out is not None else ""),
          flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="profile_pf", cores=CPUS)
    base.views(spark, SF_DIR)
    sc = spark.sparkContext

    t("documents count", lambda: spark.table("documents").count())

    sc.setJobDescription("pf: dsh materialize")
    dsh = t("dsh materialize (stage)", lambda: _dsh_df(spark, SF_DIR))
    t("dsh count", lambda: dsh.count())

    sc.setJobDescription("pf: sizes")
    sizes = stage(
        spark,
        (session_token(spark), SF_DIR, "pf_sizes"),
        lambda: dsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")),
    )
    t("sizes count", lambda: sizes.count())

    from pdxbldgimport_spark.operators.ranking import global_rank

    def _build_pref():
        dfreq = dsh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        ranked = global_rank(
            dfreq, F.col("df"), [F.col("df"), F.col("sh")], "r"
        ).select("sh", "r")
        wdoc = Wnd.partitionBy("doc_id").orderBy("r")
        return (
            dsh.join(ranked, "sh")
            .withColumn("p", F.row_number().over(wdoc))
            .join(sizes, "doc_id")
            .where(
                F.col("p")
                <= F.col("n") - F.expr(f"({PF_T10} * n + 9) div 10") + 1
            )
            .select("doc_id", "sh", "n")
        )

    sc.setJobDescription("pf: prefix build")
    pref = t(
        "pref materialize (stage)",
        lambda: stage(
            spark, (session_token(spark), SF_DIR, "pf_prefix"), _build_pref
        ),
    )
    t("pref count", lambda: pref.count())

    a = pref.select(F.col("doc_id").alias("doc_a"), "sh",
                    F.col("n").alias("na"))
    b = pref.select(F.col("doc_id").alias("doc_b"), "sh",
                    F.col("n").alias("nb"))
    raw = a.join(b, "sh").where(
        (F.col("doc_a") < F.col("doc_b"))
        & (F.least("na", "nb") * 10 >= PF_T10 * F.greatest("na", "nb"))
    )
    sc.setJobDescription("pf: raw candidate pairs count")
    t("raw pair count (post length-filter)", lambda: raw.count())

    cand = raw.select("doc_a", "doc_b").distinct()
    sc.setJobDescription("pf: cand distinct")
    t0 = time.time()
    cand_c = cand.count()
    print(f"cand distinct count: {time.time()-t0:.2f}s -> {cand_c}",
          flush=True)

    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    t("cand_docs count", lambda: cand_docs.count())

    # full verify chain as in the query (re-deriving cand each time, as
    # the real query does — nothing staged below pref)
    dsh_cand = dsh.join(cand_docs, "doc_id", "left_semi")
    x = dsh_cand.select(F.col("doc_id").alias("doc_a"), "sh")
    y = dsh_cand.select(F.col("doc_id").alias("doc_b"), "sh")
    final = (
        cand.join(x, "doc_a")
        .join(y, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_n"))
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n").alias("nb")), "doc_b")
        .withColumn("union_n",
                    F.col("na") + F.col("nb") - F.col("inter_n"))
        .where(F.col("inter_n") * 10 >= PF_T10 * F.col("union_n"))
        .select("doc_a", "doc_b", "inter_n", "union_n")
    )
    sc.setJobDescription("pf: full query (cand join + verify) noop")
    t("FULL query noop (1st)", lambda: noop(final))
    t("FULL query noop (2nd)", lambda: noop(final))

    spark.stop()


if __name__ == "__main__":
    main()
