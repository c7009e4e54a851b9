"""Round-6 auxiliary benchmark (bench.py itself is frozen for
measurement): times an arbitrary subset of registered queries with the
SAME methodology as bench.py — noop sink, min of SPARK_GRAFT_RUNS
attempts, stage warmup shared per session — and prints one JSON line.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
    (no args = the full bench.py BENCH_QUERIES list)
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pdxbldgimport_spark import registry as Q  # noqa: E402
from pdxbldgimport_spark import queries as base  # noqa: E402
from pdxbldgimport_spark.session import get_spark  # noqa: E402
from pdxbldgimport_spark.shipping import ship  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    if not names:
        import bench

        names = bench.BENCH_QUERIES
    spark = get_spark(app_name="bench_extra", cores=CPUS)
    ship(spark)
    base.views(spark, SF_DIR)
    _run(spark.table("pages").select("page_id").limit(1000))
    timings = {}
    for name in names:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = float("inf")
        for _ in range(max(RUNS, 1)):
            t0 = time.time()
            _run(fn(spark, SF_DIR))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"queries": timings, "sf": SF_DIR, "cpus": CPUS,
                      "runs_per_timing": max(RUNS, 1)}))


if __name__ == "__main__":
    main()
