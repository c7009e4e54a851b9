"""Targeted oracle check: python tools/verify_subset.py q1 q2 ...
Same comparison as .claude/skills/verify/driver_sim.py, subset only."""
import sys

sys.path.insert(0, "/root/repo")
import hashlib  # noqa: E402

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from pdxbldgimport_spark.session import get_spark  # noqa: E402
from pdxbldgimport_spark.synth import TABLES  # noqa: E402

spark = get_spark(cores=8)
con = duckdb.connect()
for t in TABLES:
    con.sql(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
    )


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


fails = 0
oracles = e.oracle_sql()
qs = e.queries()
for name in sys.argv[1:]:
    sp = qs[name](spark, "/root/testdata/sf0.01").toPandas()
    du = con.sql(oracles[name]).df()
    if len(sp) != len(du) or sorted(sp.columns) != sorted(du.columns):
        print(f"{name}: ROWS/SCHEMA {len(sp)} vs {len(du)}")
        fails += 1
        continue
    a, b = canon(sp), canon(du)
    ha = hashlib.md5(a.to_csv(index=False).encode()).hexdigest()
    hb = hashlib.md5(b.to_csv(index=False).encode()).hexdigest()
    print(f"{name}: {'OK' if ha == hb else 'HASH MISMATCH'} ({len(sp)})")
    fails += 0 if ha == hb else 1
print("FAILS:", fails)
sys.exit(1 if fails else 0)
