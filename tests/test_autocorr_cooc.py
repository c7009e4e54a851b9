"""Brute-force certification of the autocorrelation/co-occurrence pair:
events_autocorr_lag1 vs a numpy zero-filled hourly series (with the
zero-filling made load-bearing), and supplier_cooccurrence vs a pure-
Python per-order pair count with the above-mean rule — independent of
both engines' SQL formulations."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import numpy as np
import pandas as pd

from pdxbldgimport_spark import registry as Q
from tests.conftest import SF_SMOKE


def test_events_autocorr_lag1_matches_numpy(spark):
    eng = (
        Q.QUERIES["events_autocorr_lag1"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    h = (ev.ts.dt.floor("h").astype("int64") // 3_600_000_000).astype("int64")
    h0, h1 = int(h.min()), int(h.max())
    rows = []
    for et, grp in pd.DataFrame({"t": ev.event_type, "h": h}).groupby("t"):
        series = np.zeros(h1 - h0 + 1, dtype="int64")
        for hh, c in grp.h.value_counts().items():
            series[hh - h0] = c
        x, y = series[:-1], series[1:]
        rows.append(
            {
                "event_type": et,
                "n_pairs": len(x),
                "sum_x": int(x.sum()),
                "sum_y": int(y.sum()),
                "sum_x2": int((x * x).sum()),
                "sum_y2": int((y * y).sum()),
                "sum_xy": int((x * y).sum()),
            }
        )
        # zero-filling must be load-bearing: the type must have empty
        # hours inside the global span
        assert (series == 0).any()
    ref = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        eng.astype({c: "int64" for c in ref.columns if c != "event_type"}),
        ref,
    )
    # the derived r must be a valid correlation for every type
    for _, r in ref.iterrows():
        n = r.n_pairs
        num = n * r.sum_xy - r.sum_x * r.sum_y
        den = np.sqrt(
            float(n * r.sum_x2 - r.sum_x**2) * float(n * r.sum_y2 - r.sum_y**2)
        )
        assert den > 0 and -1.0 <= num / den <= 1.0


def test_supplier_cooccurrence_matches_python(spark):
    eng = (
        Q.QUERIES["supplier_cooccurrence"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["s_a", "s_b"])
        .reset_index(drop=True)
    )
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    os_ = li[["l_orderkey", "l_suppkey"]].drop_duplicates()
    c: Counter = Counter()
    for _, grp in os_.groupby("l_orderkey"):
        for a, b in combinations(sorted(set(grp.l_suppkey)), 2):
            c[(a, b)] += 1
    np_, tot = len(c), sum(c.values())
    ref = (
        pd.DataFrame(
            [
                {"s_a": a, "s_b": b, "n_orders": n}
                for (a, b), n in c.items()
                if n * np_ > tot
            ]
        )
        .sort_values(["s_a", "s_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng.astype("int64"), ref.astype("int64"))
    # the above-mean rule must BIND: strictly between none and all
    assert 0 < len(ref) < np_
