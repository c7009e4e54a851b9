"""Ad-hoc engine-vs-DuckDB oracle check (dev loop; the round driver runs the same comparison via __spark_entry__). Usage: python tools/oracle_check.py [sf_dir] [query ...]."""
import sys

sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
NAMES = sys.argv[2:] or [
    "fill_only_merge", "changesets", "pdx_bldgs", "knn_unassigned",
    "taxlot_stats", "metro_bldgs", "tile_export", "multi_addrs",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

spark = get_spark(cores=8)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


fails = 0
for name in NAMES:
    try:
        sp = Q.QUERIES[name](spark, SF).toPandas()
        orc = con.execute(Q.ORACLES[name]).df()
        a, b = canon(sp), canon(orc)
        if len(a) != len(b):
            print(f"{name}: ROWS {len(a)} vs {len(b)}")
            fails += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"{name}: SCHEMA {list(a.columns)} vs {list(b.columns)}")
            fails += 1
            continue
        b = b.astype(a.dtypes.to_dict(), errors="ignore")
        eq = a.equals(b)
        if not eq:
            diff = (a != b) & ~(a.isna() & b.isna())
            print(f"{name}: VALUES mismatch, {int(diff.any(axis=1).sum())} rows differ")
            print(a[diff.any(axis=1)].head(3))
            print(b[diff.any(axis=1)].head(3))
            fails += 1
        else:
            print(f"{name}: OK ({len(a)} rows)")
    except Exception as e:
        print(f"{name}: ERR {type(e).__name__}: {str(e)[:400]}")
        fails += 1

print("FAILS:", fails)
sys.exit(1 if fails else 0)
