"""Round-6: validate + microbench conv-based h60 vs polynomial h60."""
from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from pdxbldgimport_spark.queries_text import _h60_sql  # noqa: E402
from pdxbldgimport_spark.session import get_spark  # noqa: E402

N = 20_000_000


def conv60(md5_expr: str, off: int = 0) -> str:
    return (f"CAST(conv(reverse(substr({md5_expr}, {off + 1}, 15)), 16, 10)"
            f" AS BIGINT)")


def main():
    spark = get_spark(app_name="h60_bench", cores=32)
    base = spark.range(0, N, 1, 32).selectExpr(
        "md5(cast(cast(id as string) as binary)) AS m"
    )
    old = _h60_sql("m", "instr", 0)
    old15 = _h60_sql("m", "instr", 15)

    # exact equality on 20M hashes, both offsets
    neq = base.selectExpr(
        f"({old}) AS a", f"({conv60('m', 0)}) AS b",
        f"({old15}) AS a2", f"({conv60('m', 15)}) AS b2",
    ).where("a <> b OR a2 <> b2").count()
    print("mismatches:", neq, flush=True)

    def t(label, expr):
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            base.selectExpr(f"sum(({expr}) % 1000) AS s").collect()
            best = min(best, time.time() - t0)
        print(f"{label}: {best:.2f}s", flush=True)

    t("baseline (md5 only, sum(length(m)))", "length(m)")
    t("polynomial h60", old)
    t("conv h60", conv60("m", 0))
    spark.stop()


if __name__ == "__main__":
    main()
