"""One salted-shuffle PIP leg at >=1B pages (VERDICT-r5 item #4): time
the broadcast headline path and the forced broadcast_max_polys=0
fallback on the same REP-multiplied points, probe-annotated, and append
the record to BENCH/pairs_r6.jsonl.

Usage: SPARK_GRAFT_CPUS=32 PIP_LEG_REP_MULT=3200 python tools/pip_fallback_leg.py
(3200 x 320k sf0.1 pages = 1.024B points; generator-backed, not
materialized). The broadcast index build is untimed, same as bench.py's
headline discipline.
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F, types as T  # noqa: E402

from pdxbldgimport_spark import queries as base  # noqa: E402
from pdxbldgimport_spark import synth  # noqa: E402
from pdxbldgimport_spark.geo import cells as C  # noqa: E402
from pdxbldgimport_spark.operators.pip_join import pip_join, tile_expr  # noqa: E402
from pdxbldgimport_spark.session import get_spark, session_token  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REP_MULT = int(os.environ.get("PIP_LEG_REP_MULT", "3200"))
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))


def _probe(spark) -> float:
    rows = 250_000_000 * CPUS
    t0 = time.time()
    spark.range(rows).selectExpr("sum(id % 7 + id % 13)").collect()
    return round(time.time() - t0, 3)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="pip_fallback_leg", cores=CPUS)
    from pdxbldgimport_spark.shipping import ship

    ship(spark)
    base.views(spark, SF_DIR)

    params = dict(synth._CONST)
    params.update(synth._DIALECT["spark"])
    big_rep = int(params["REP"]) * REP_MULT
    params["REP"] = str(big_rep)
    params["CROSS_REP"] = f"CROSS JOIN (SELECT id AS r FROM range({big_rep})) r"
    pages = spark.sql(synth._force_double(synth._PAGES.format(**params)))
    n_pages = pages.count()
    print(f"# n_pages={n_pages}", file=sys.stderr, flush=True)

    pts = pages.select(
        "page_id", "lon", "lat",
        tile_expr(F.col("lon"), F.col("lat"), C.RES_TILE).alias("tile_id"),
    )
    carry = [("tile_id", T.LongType())]

    # untimed prep, identical to bench.py's headline discipline
    bc = base.prepared_fp_cover(spark, SF_DIR)
    fps = base.prepared_footprints(spark, SF_DIR).select("fp_id", "rings")
    n_fp = fps.count()

    def leg(label, build):
        spark.sparkContext.setJobDescription(f"pip_leg: {label}")
        best = float("inf")
        for _ in range(max(RUNS, 1)):
            t0 = time.time()
            _noop(build())
            best = min(best, time.time() - t0)
        print(f"# {label}: {best:.2f}s", file=sys.stderr, flush=True)
        return round(best, 3)

    probe0 = _probe(spark)
    bsec = leg("broadcast", lambda: pip_join(
        pts, None, "page_id", "fp_id", prebuilt=bc, carry=carry))
    ssec = leg("forced_shuffle", lambda: pip_join(
        pts, fps, "page_id", "fp_id", broadcast_max_polys=0,
        polys_count=n_fp, carry=carry))
    probe1 = _probe(spark)

    rec = {
        "kind": "pip_forced_shuffle_leg",
        "cpus": CPUS,
        "rep_mult": REP_MULT,
        "n_pages": n_pages,
        "n_footprints": n_fp,
        "broadcast_sec": bsec,
        "forced_shuffle_sec": ssec,
        "ratio": round(ssec / bsec, 2) if bsec else None,
        "probe_before_sec": probe0,
        "probe_after_sec": probe1,
        "runs_per_timing": max(RUNS, 1),
        "sf": SF_DIR,
        "t_wall": round(time.time(), 1),
        "token": session_token(spark),
    }
    out = os.path.join(_REPO, "BENCH", "pairs_r6.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
