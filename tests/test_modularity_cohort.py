"""Brute-force certification of the modularity/cohort batch:
host_modularity vs a pure-Python LPA + stats pass, orders_cohort_value
vs a pandas cohort triangle, and media_loudness_windows vs a per-audio
Python window scan — all independent of both engines' SQL
formulations."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.queries import views
from tests.conftest import SF_SMOKE
from tests.test_robust_graph import _duck_pages


def test_host_modularity_matches_python_lpa_stats(spark):
    from pdxbldgimport_spark.queries_web import LPA_ITERS
    from pdxbldgimport_spark.synth import NP

    eng = (
        Q.QUERIES["host_modularity"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("community")
        .reset_index(drop=True)
    )
    pages = _duck_pages("pid, page_id")
    w = Counter()
    for pid, page_id in zip(pages.pid, pages.page_id):
        a, b = int(pid), int((page_id * 13 + 7) % NP)
        w[(a, b)] += 1
        w[(b, a)] += 1
    nbrs = defaultdict(list)
    for (a, b), wt in w.items():
        nbrs[a].append((b, wt))
    lab = {h: h for h in nbrs}
    for _ in range(LPA_ITERS):
        nxt = {}
        for h, edges in nbrs.items():
            tw = Counter()
            for b, wt in edges:
                tw[lab[b]] += wt
            nxt[h] = min(tw, key=lambda l: (-tw[l], l))
        lab = nxt
    deg = {h: sum(wt for _, wt in edges) for h, edges in nbrs.items()}
    stats: dict[int, list[int]] = {}
    for h in nbrs:
        c = stats.setdefault(lab[h], [0, 0, 0])
        c[0] += 1
        c[1] += deg[h]
    for (a, b), wt in w.items():
        if lab[a] == lab[b]:
            stats[lab[a]][2] += wt
    ref = (
        pd.DataFrame(
            [
                {"community": c, "n_hosts": s[0], "vol": s[1], "w_in": s[2]}
                for c, s in stats.items()
            ]
        )
        .sort_values("community")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng.astype("int64"), ref.astype("int64"))
    # derived Q must be a valid modularity and the partition non-trivial
    two_m = sum(deg.values())
    q = sum(s[2] / two_m - (s[1] / two_m) ** 2 for s in stats.values())
    assert -1.0 <= q <= 1.0 and len(stats) > 1
    assert any(s[2] > 0 for s in stats.values())


def test_orders_cohort_value_matches_pandas(spark):
    eng = (
        Q.QUERIES["orders_cohort_value"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["cohort_q", "offset_q"])
        .reset_index(drop=True)
    )
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    yq = (o.o_orderdate.dt.year * 4 + (o.o_orderdate.dt.month - 1) // 3).astype(
        "int64"
    )
    val_c = np.floor(o.o_totalprice * 100.0).astype("int64")
    df = pd.DataFrame({"cust": o.o_custkey, "yq": yq, "val_c": val_c})
    df["cohort_q"] = df.cust.map(df.groupby("cust").yq.min())
    df["offset_q"] = df.yq - df.cohort_q
    ref = (
        df.groupby(["cohort_q", "offset_q"])
        .agg(n_orders=("val_c", "size"), value_c=("val_c", "sum"))
        .reset_index()
        .sort_values(["cohort_q", "offset_q"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng.astype("int64"), ref.astype("int64"))
    # the triangle must have depth: some cohort re-orders quarters later
    assert ref.offset_q.max() >= 4


def test_media_loudness_windows_matches_python(spark):
    from pdxbldgimport_spark.queries_multimodal import LOUD_MSQ, LOUD_WIN

    views(spark, SF_SMOKE)
    eng = {
        r["doc_id"]: (r["n_windows"], r["n_loud"], r["max_energy"])
        for r in Q.QUERIES["media_loudness_windows"](spark, SF_SMOKE).collect()
    }
    auds = (
        spark.table("media")
        .where("kind = 'audio'")
        .select("doc_id", "payload")
        .collect()
    )
    assert len(auds) == len(eng) > 0
    any_loud = any_quiet = False
    for r in auds:
        b = np.frombuffer(r["payload"], np.uint8).astype("int64")
        wins = [b[i : i + LOUD_WIN] for i in range(0, len(b), LOUD_WIN)]
        es = [int((w * w).sum()) for w in wins]
        loud = sum(1 for w, e in zip(wins, es) if e > LOUD_MSQ * len(w))
        assert eng[r["doc_id"]] == (len(wins), loud, max(es))
        any_loud |= loud > 0
        any_quiet |= loud < len(wins)
    # the threshold must straddle the corpus: both arms live
    assert any_loud and any_quiet
