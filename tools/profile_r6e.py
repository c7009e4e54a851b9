"""Session-3 profiling, part 4: canonical_url_expr with the fixed-string
regex passes replaced by string ops (substring_index / endswith /
startswith) and the utm strip instr-guarded. Warm interleaved A/B +
checksums at PROF_REP_MULT-scaled page volume."""
from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from pdxbldgimport_spark import queries as base  # noqa: E402
from pdxbldgimport_spark.queries_web import (  # noqa: E402
    LINK_TAG_RE,
    RAW_HOST_RE,
    canonical_url_expr,
)
from pdxbldgimport_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def canon_new(url_col) -> F.Column:
    """String-op spelling of canonical_url_expr. Exact under the synth
    invariant that URLs contain no newline (the '#.*' / '\\?.*' regexes
    stop at \\n; substring_index does not)."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    auth_raw = F.regexp_extract(url, "^[A-Za-z]+://[^/?#]*", 0)
    rest0 = url.substr(F.length(auth_raw) + F.lit(1), F.length(url))
    auth0 = F.lower(auth_raw)
    auth = (
        F.when(auth0.endswith(":443"),
               auth0.substr(F.lit(1), F.length(auth0) - 4))
        .when(auth0.endswith(":80"),
              auth0.substr(F.lit(1), F.length(auth0) - 3))
        .otherwise(auth0)
    )
    rest = F.substring_index(rest0, "#", 1)          # '#.*' strip
    path0 = F.substring_index(rest, "?", 1)          # '\?.*' strip
    path = F.when(
        path0.endswith("/"),
        path0.substr(F.lit(1), F.length(path0) - 1)  # one '/$'
    ).otherwise(path0)
    qpos = F.instr(rest, "?")
    q0 = F.when(qpos == 0, F.lit("")).otherwise(
        rest.substr(qpos + F.lit(1), F.length(rest)))
    q1 = F.when(F.instr(q0, "utm_") == 0, q0).otherwise(
        F.regexp_replace(q0, "(^|&)utm_[^&]*", ""))
    q = F.when(q1.startswith("&"),
               F.regexp_replace(q1, "^&+", "")).otherwise(q1)
    return F.concat(
        auth, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run(df):
    t0 = time.time()
    noop(df)
    return time.time() - t0


def main():
    spark = get_spark(app_name="profile_r6e", cores=32)
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

    # shape 1: dedup_url_canonical (canonical over every page url + agg)
    def shape1(canon):
        return (spark.table("pages")
                .groupBy(canon("url").alias("canonical_url"))
                .agg(F.count(F.lit(1)).alias("n_pages"),
                     F.min("page_id").alias("first_page_id")))

    # shape 2: outlink flow (canonical over every extracted href)
    def shape2(canon):
        pat = LINK_TAG_RE
        tags = spark.table("pages").select(
            "page_id",
            F.lower(F.regexp_extract("url", RAW_HOST_RE, 1)).alias("sh"),
            F.posexplode(F.regexp_extract_all(
                F.col("html").cast("string"), F.lit(pat), F.lit(0)))
            .alias("pos", "tag"))
        cq = "locate('\">', tag, 10)"
        return tags.select(
            "page_id", "sh", "pos",
            canon(F.expr(f"substring(tag, 10, {cq} - 10)")).alias("dst"))

    for label, shape in (("pages-canon", shape1), ("links-canon", shape2)):
        old, new = shape(canonical_url_expr), shape(canon_new)
        run(new); run(old)  # warm both
        no, nn = [], []
        for _ in range(4):
            nn.append(run(new)); no.append(run(old))
        print(f"{label} new: {[round(x,2) for x in nn]} min {min(nn):.2f}",
              flush=True)
        print(f"{label} old: {[round(x,2) for x in no]} min {min(no):.2f}",
              flush=True)
        for tag, df in (("old", old), ("new", new)):
            h = df.select(
                F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))
                .alias("h"),
                F.count(F.lit(1)).alias("n")).collect()[0]
            print(f"{label} {tag}: n={h['n']} h={h['h']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
