"""Session-3 profiling, part 3: Expand-rewrite elimination for the
mixed count/countDistinct aggregates (host_stats, bm25 totals,
path_prefix_rollup, vocab_topk, text_repetition shingle stats,
url_param_stats). A/B with checksums; PROF_REP_MULT scales pages."""
from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from pdxbldgimport_spark import queries as base  # noqa: E402
from pdxbldgimport_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def ab(name, old, new, n=2):
    for label, df in (("OLD", old), ("NEW", new)):
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            noop(df)
            best = min(best, time.time() - t0)
        print(f"{name} {label}: {best:.2f}s", flush=True)
    for label, df in (("old", old), ("new", new)):
        h = df.select(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n")).collect()[0]
        print(f"{name} {label}: n={h['n']} h={h['h']}", flush=True)


def host_stats(spark):
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"(?i)https?://([^/?#]+)", 1)),
        r":[0-9]+$", "").alias("host")
    t = spark.table("pages")
    old = t.groupBy(host).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(F.length("text")).alias("text_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("warc_ts").alias("first_ts"),
        F.max("warc_ts").alias("last_ts"))
    g1 = t.groupBy(host, F.col("doc_id"), F.col("lang")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.length("text")).alias("chars"),
        F.min("warc_ts").alias("f"),
        F.max("warc_ts").alias("l"))
    new = g1.groupBy("host").agg(
        F.sum("cnt").alias("n_pages"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("chars").alias("text_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("f").alias("first_ts"),
        F.max("l").alias("last_ts"))
    ab("host_stats", old.select(*sorted(old.columns)),
       new.select(*sorted(old.columns)))


def vocab(spark):
    from pdxbldgimport_spark.queries_text import _tokens
    toks = _tokens(spark).select("doc_id", "w")
    old = toks.groupBy("w").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"))
    g1 = toks.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    new = g1.groupBy("w").agg(
        F.sum("cnt").alias("tf"),
        F.count(F.lit(1)).alias("df"))
    ab("vocab", old, new.select(*old.columns))


def repetition(spark):
    from pdxbldgimport_spark.queries_text import _shingles
    sh = _shingles(spark)
    old = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.countDistinct("sh").alias("n_dsh"))
    g1 = sh.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("cnt"))
    new = g1.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_sh"),
        F.count(F.lit(1)).alias("n_dsh"))
    ab("repetition", old, new.select(*old.columns))


def ppr(spark):
    # just the final agg shape over the real prefix relation
    from pdxbldgimport_spark import registry as Q
    _ = Q  # real query timed via bench_extra; here test the agg alone
    t = spark.table("pages").select(
        F.lower(F.regexp_extract("url", r"(?i)https?://([^/?#]+)", 1))
        .alias("host"),
        "doc_id",
        F.regexp_extract("url", r"https?://[^/]+(/[^?#]*)?", 1)
        .alias("path"))
    pref = t.select("host", "doc_id",
                    F.substring_index("path", "/", 2).alias("prefix"))
    old = pref.groupBy("host", "prefix").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("doc_id").alias("n_docs"))
    g1 = pref.groupBy("host", "prefix", "doc_id").agg(
        F.count(F.lit(1)).alias("cnt"))
    new = g1.groupBy("host", "prefix").agg(
        F.sum("cnt").alias("n_pages"),
        F.count(F.lit(1)).alias("n_docs"))
    ab("ppr-shape", old, new.select(*old.columns))


def url_params(spark):
    qs = (spark.table("pages")
          .where(F.col("url").contains("?"))
          .select("page_id",
                  F.regexp_extract("url", r"\?([^#]*)", 1).alias("q"))
          .where(F.col("q") != ""))
    kv = qs.select("page_id",
                   F.explode(F.split("q", "&")).alias("pair")).where(
        F.col("pair") != "")
    split_at = F.instr("pair", "=")
    sel = kv.select(
        F.split("pair", "=").getItem(0).alias("param_key"),
        F.when(split_at > 0,
               F.expr("substr(pair, instr(pair, '=') + 1)"))
        .otherwise(F.lit("")).alias("val"))
    old = sel.groupBy("param_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("val").cast("long").alias("n_values"))
    g1 = sel.groupBy("param_key", "val").agg(F.count(F.lit(1)).alias("cnt"))
    new = g1.groupBy("param_key").agg(
        F.sum("cnt").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_values"))
    ab("url_params", old, new.select(*old.columns))


def main():
    spark = get_spark(app_name="profile_r6d", cores=32)
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
    which = sys.argv[1:] or ["host_stats", "vocab", "repetition", "ppr",
                             "url_params"]
    for name in which:
        globals()[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
