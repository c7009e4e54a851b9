"""Round-6: prototype faster dedup_prefix_filter verify; compare vs old.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/profile_r6_pf2.py
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
from pdxbldgimport_spark.queries_text import PF_T10, _dsh_df  # noqa: E402
from pdxbldgimport_spark.operators.ranking import global_rank  # noqa: E402
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
    spark = get_spark(app_name="profile_pf2", cores=CPUS)
    base.views(spark, SF_DIR)
    sc = spark.sparkContext
    tok = session_token(spark)

    dsh = _dsh_df(spark, SF_DIR)
    sizes = stage(
        spark, (tok, SF_DIR, "pf_sizes"),
        lambda: dsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")),
    )

    # pref WITH position p retained, plus the rank table for id mapping
    def _build_ranked():
        dfreq = dsh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        return global_rank(
            dfreq, F.col("df"), [F.col("df"), F.col("sh")], "r"
        ).select("sh", "r")

    ranked = stage(spark, (tok, SF_DIR, "pf_ranked"), _build_ranked)

    def _build_pref():
        wdoc = Wnd.partitionBy("doc_id").orderBy("r")
        return (
            dsh.join(ranked, "sh")
            .withColumn("p", F.row_number().over(wdoc))
            .join(sizes, "doc_id")
            .where(
                F.col("p")
                <= F.col("n") - F.expr(f"({PF_T10} * n + 9) div 10") + 1
            )
            .select("doc_id", "sh", "n", "p")
        )

    sc.setJobDescription("pf2: stages")
    pref = t("pref+p materialize", lambda: stage(
        spark, (tok, SF_DIR, "pf_prefix_p"), _build_pref))

    doc_arr = t("doc_arr materialize", lambda: stage(
        spark, (tok, SF_DIR, "pf_docarr"),
        lambda: dsh.join(ranked, "sh")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("r")).alias("shs")),
    ))

    a = pref.select(F.col("doc_id").alias("doc_a"), "sh",
                    F.col("n").alias("na"), F.col("p").alias("pa"))
    b = pref.select(F.col("doc_id").alias("doc_b"), "sh",
                    F.col("n").alias("nb"), F.col("p").alias("pb"))
    raw = a.join(b, "sh").where(
        (F.col("doc_a") < F.col("doc_b"))
        & (F.least("na", "nb") * 10 >= PF_T10 * F.greatest("na", "nb"))
    )
    # positional filter: inter <= min(na-pa, nb-pb)+1 for any shared
    # prefix shingle; pair qualifies only if 16*bound >= 6*(na+nb)
    pos = raw.where(
        (F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb"))
         + F.lit(1)) * (10 + PF_T10)
        >= PF_T10 * (F.col("na") + F.col("nb"))
    )
    sc.setJobDescription("pf2: positional filter selectivity")
    t("raw pairs (no pos filter)", lambda: raw.count())
    t("raw pairs (pos filter)", lambda: pos.count())

    cand = pos.select("doc_a", "doc_b", "na", "nb").distinct()
    sc.setJobDescription("pf2: cand distinct")
    t("cand distinct count", lambda: cand.count())

    arr_a = doc_arr.select(F.col("doc_id").alias("doc_a"),
                           F.col("shs").alias("sa"))
    arr_b = doc_arr.select(F.col("doc_id").alias("doc_b"),
                           F.col("shs").alias("sb"))
    final_new = (
        cand.join(F.broadcast(arr_a), "doc_a")
        .join(F.broadcast(arr_b), "doc_b")
        .withColumn(
            "inter_n",
            F.size(F.array_intersect("sa", "sb")).cast("long"),
        )
        .withColumn("union_n",
                    F.col("na") + F.col("nb") - F.col("inter_n"))
        .where(F.col("inter_n") * 10 >= PF_T10 * F.col("union_n"))
        .select("doc_a", "doc_b", "inter_n", "union_n")
    )
    sc.setJobDescription("pf2: NEW full verify noop")
    t("NEW verify noop (1st)", lambda: noop(final_new))
    t("NEW verify noop (2nd)", lambda: noop(final_new))

    # equality vs OLD result: order-insensitive checksum
    def chk(df):
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("doc_a", "doc_b", "inter_n", "union_n")
                  .cast("long")).alias("h"),
        ).collect()[0]

    sc.setJobDescription("pf2: NEW checksum")
    print("NEW checksum:", chk(final_new), flush=True)

    # OLD verify for comparison (checksum only, no timing needed)
    cand_old = (
        a.select("doc_a", "sh", "na").join(
            b.select("doc_b", "sh", "nb"), "sh")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.least("na", "nb") * 10 >= PF_T10 * F.greatest("na", "nb"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    cand_docs = (
        cand_old.select(F.col("doc_a").alias("doc_id"))
        .union(cand_old.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    dsh_cand = dsh.join(cand_docs, "doc_id", "left_semi")
    x = dsh_cand.select(F.col("doc_id").alias("doc_a"), "sh")
    y = dsh_cand.select(F.col("doc_id").alias("doc_b"), "sh")
    final_old = (
        cand_old.join(x, "doc_a")
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
    sc.setJobDescription("pf2: OLD checksum")
    print("OLD checksum:", chk(final_old), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
