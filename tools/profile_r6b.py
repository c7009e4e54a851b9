"""Session-3 profiling: pii instr-guards, zrange conjunct order, links
extraction split. All A/B at $SPARK_GRAFT_SF_DIR (default sf1.0), noop
sink, min-of-2 per leg."""
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
from pdxbldgimport_spark.queries_web import (  # noqa: E402
    LINK_TAG_RE, RAW_HOST_RE, canonical_url_expr,
)
from pdxbldgimport_spark import queries_spatial as qs  # noqa: E402
from pdxbldgimport_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run(label, df, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        noop(df)
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.2f}s", flush=True)


def pii(spark):
    t = spark.table("pages_pii")
    # hit rates of the implied-literal guards
    rates = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.instr("text", "@") > 0).cast("long")).alias("at"),
        F.sum((F.instr("text", "(") > 0).cast("long")).alias("paren"),
        F.sum((F.instr("text", ".") > 0).cast("long")).alias("dot"),
        F.sum(F.col("text").rlike("[0-9]\\.").cast("long")).alias("digdot"),
    ).collect()[0]
    print("guard rates:", rates.asDict(), flush=True)

    def scrub_old():
        return F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
                PII_PHONE, "<PHONE>"),
            PII_IP, "<IP>")

    def guarded(inner, guard_char, pat, repl):
        return F.when(F.instr("text", guard_char) == 0, inner).otherwise(
            F.regexp_replace(inner, pat, repl))

    def scrub_new():
        s1 = guarded(F.col("text"), "@", PII_EMAIL, "<EMAIL>")
        s2 = guarded(s1, "(", PII_PHONE, "<PHONE>")
        return guarded(s2, ".", PII_IP, "<IP>")

    def cnt_old(pat):
        return F.regexp_count(F.col("text"), F.lit(pat)).cast("long")

    def cnt_new(pat, guard_char):
        return F.when(F.instr("text", guard_char) == 0, F.lit(0)).otherwise(
            F.regexp_count(F.col("text"), F.lit(pat))).cast("long")

    old = t.select(
        "page_id",
        cnt_old(PII_EMAIL).alias("n_email"),
        cnt_old(PII_PHONE).alias("n_phone"),
        cnt_old(PII_IP).alias("n_ip"),
        F.md5(scrub_old().cast("binary")).alias("scrub_md5"),
        F.length(scrub_old()).cast("long").alias("scrub_len"))
    new = t.select(
        "page_id",
        cnt_new(PII_EMAIL, "@").alias("n_email"),
        cnt_new(PII_PHONE, "(").alias("n_phone"),
        cnt_new(PII_IP, ".").alias("n_ip"),
        F.md5(scrub_new().cast("binary")).alias("scrub_md5"),
        F.length(scrub_new()).cast("long").alias("scrub_len"))
    run("pii OLD (unguarded)", old)
    run("pii NEW (instr-guarded)", new)
    # equality: order-insensitive checksum over every output column
    for label, df in (("old", old), ("new", new)):
        h = df.select(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n")).collect()[0]
        print(f"pii {label}: n={h['n']} h={h['h']}", flush=True)


def zrange(spark):
    g0 = spark.table("pages").select(
        F.expr(qs._ix_sql("lon", qs.RES_Z)).alias("ix"),
        F.expr(qs._iy_sql("lat", qs.RES_Z)).alias("iy"),
    )
    range_pred = " OR ".join(
        f"(zkey div {4 ** (qs.RES_Z - lvl)}) IN ({', '.join(map(str, pre))})"
        for lvl, pre in sorted(qs.ZR_SQUARES.items()))

    # OLD: checkpoint all pages, morton all, filter
    g = g0.localCheckpoint(eager=False)
    z = g.select("ix", "iy",
                 F.expr(qs._morton_sql("ix", "iy", qs.RES_Z, "div"))
                 .alias("zkey"))
    old = (z.where(F.expr(range_pred))
           .where(F.col("ix").between(qs.ZR_X0, qs.ZR_X1)
                  & F.col("iy").between(qs.ZR_Y0, qs.ZR_Y1))
           .agg(F.count(F.lit(1)).cast("long").alias("n_pages")))

    # NEW: bbox filter first (fused into scan), checkpoint survivors only
    g2 = g0.where(F.col("ix").between(qs.ZR_X0, qs.ZR_X1)
                  & F.col("iy").between(qs.ZR_Y0, qs.ZR_Y1))
    g2 = g2.localCheckpoint(eager=False)
    z2 = g2.select("ix", "iy",
                   F.expr(qs._morton_sql("ix", "iy", qs.RES_Z, "div"))
                   .alias("zkey"))
    new = (z2.where(F.expr(range_pred))
           .agg(F.count(F.lit(1)).cast("long").alias("n_pages")))

    run("zrange OLD (checkpoint-all)", old)
    run("zrange NEW (bbox-first)", new)
    print("zrange counts:", old.collect()[0][0], new.collect()[0][0],
          flush=True)


def links(spark):
    pat = LINK_TAG_RE
    tags = spark.table("pages").select(
        "page_id",
        F.lower(F.regexp_extract("url", RAW_HOST_RE, 1)).alias("src_host"),
        F.posexplode(F.regexp_extract_all(
            F.col("html").cast("string"), F.lit(pat), F.lit(0)))
        .alias("pos", "tag"))
    run("links A: extract_all+explode only", tags)
    old = tags.select(
        "page_id", "src_host", "pos",
        canonical_url_expr(F.regexp_extract("tag", pat, 1)).alias("dst_url"),
        F.regexp_extract("tag", pat, 2).alias("anchor"))
    run("links B: full OLD (2 regex/tag)", old)
    # per-tag parse via the unique '">' split point: url has no '"',
    # anchor no '<', so instr(tag, '\">') is the closing quote.
    cut = F.instr("tag", '">')
    raw_url = F.expr("substring(tag, 10, instr(tag, '\"' || '>') - 10)")
    raw_anchor = F.expr(
        "substring(tag, instr(tag, '\"' || '>') + 2, "
        "length(tag) - instr(tag, '\"' || '>') - 5)")
    new = tags.select(
        "page_id", "src_host", "pos",
        canonical_url_expr(raw_url).alias("dst_url"),
        raw_anchor.alias("anchor"))
    run("links C: full NEW (substr/tag)", new)
    for label, df in (("old", old), ("new", new)):
        h = df.select(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n")).collect()[0]
        print(f"links {label}: n={h['n']} h={h['h']}", flush=True)
    _ = cut


def main():
    spark = get_spark(app_name="profile_r6b", cores=32)
    base.views(spark, SF_DIR)
    mult = int(os.environ.get("PROF_REP_MULT", "1"))
    if mult > 1:
        # sf1.0-volume stand-in: re-render pages (and its dependent
        # pages_pii) with REP×mult pages per document — the same
        # volume-scaling trick bench.py's REP_MULT uses for the headline.
        from pdxbldgimport_spark import synth
        params = dict(synth._CONST)
        params.update(synth._DIALECT["spark"])
        big_rep = int(params["REP"]) * mult
        params["REP"] = str(big_rep)
        params["CROSS_REP"] = (
            f"CROSS JOIN (SELECT id AS r FROM range({big_rep})) r")
        spark.sql(synth._force_double(
            synth._PAGES.format(**params))).createOrReplaceTempView("pages")
        spark.sql(synth._force_double(
            synth._PAGES_PII.format(**params))
        ).createOrReplaceTempView("pages_pii")
        print(f"pages re-rendered at REP x{mult}:",
              spark.table("pages").count(), "rows", flush=True)
    which = sys.argv[1:] or ["pii", "zrange", "links"]
    if "pii" in which:
        pii(spark)
    if "zrange" in which:
        zrange(spark)
    if "links" in which:
        links(spark)
    spark.stop()


if __name__ == "__main__":
    main()
