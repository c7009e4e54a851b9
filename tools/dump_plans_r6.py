"""Dump .explain('formatted') for named queries to plans/r06/<q>_<tag>.txt.

Usage: python tools/dump_plans_r6.py before q1 q2 ...
       python tools/dump_plans_r6.py after q1 q2 ...
Runs at sf0.1 (plan shape is SF-independent; AQE initial plans).
"""
from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pdxbldgimport_spark import registry as Q  # noqa: E402
from pdxbldgimport_spark import queries as base  # noqa: E402
from pdxbldgimport_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    outdir = os.path.join(_REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name=f"plans_{tag}", cores=8)
    base.views(spark, SF_DIR)
    for name in names:
        try:
            df = Q.QUERIES[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {exc}"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
