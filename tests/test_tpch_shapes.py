"""Brute-force certification of the Q4/Q14/Q2/assortativity batch:
priority_orders vs a pandas EXISTS evaluation, promo_share vs exact
integer-ppm pandas arithmetic, min_cost_supplier vs a pandas argmin
with the suppkey tie-break, and host_assortativity vs a pure-Python
edge/degree statistics pass — all independent of both engines' SQL
formulations."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from pdxbldgimport_spark import registry as Q
from tests.conftest import SF_SMOKE
from tests.test_robust_graph import _duck_pages

_RAW_HOST = re.compile(r"^[A-Za-z]+://([^/:?#]+)")


def test_priority_orders_matches_pandas_exists(spark):
    from pdxbldgimport_spark.queries_relational import (
        Q4_SHIP_HORIZON,
        Q4_WINDOW,
    )

    eng = (
        Q.QUERIES["priority_orders"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    orders = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    late = set(li[li.l_shipdate >= Q4_SHIP_HORIZON.split()[0]].l_orderkey)
    w = orders[
        (orders.o_orderdate >= Q4_WINDOW[0].split()[0])
        & (orders.o_orderdate < Q4_WINDOW[1].split()[0])
    ]
    sel = w[w.o_orderkey.isin(late)]
    ref = (
        sel.groupby("o_orderpriority")
        .size()
        .rename("n_orders")
        .reset_index()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        eng.astype({"n_orders": "int64"}), ref.astype({"n_orders": "int64"})
    )
    # the EXISTS must filter something, or the semi-join is dead weight
    assert len(sel) < len(w)


def test_promo_share_matches_integer_pandas(spark):
    eng = (
        Q.QUERIES["promo_share"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    part = pd.read_parquet(SF_SMOKE + "/part.parquet")
    cents = np.floor(li.l_extendedprice * 100.0).astype("int64")
    disc_ppm = np.floor(li.l_discount * 1_000_000.0).astype("int64")
    disc_c = (cents * (1_000_000 - disc_ppm)) // 1_000_000
    promo = li.l_partkey.map(
        part.set_index("p_partkey").p_type.eq("PROMO")
    ).astype(bool)
    df = pd.DataFrame(
        {
            "month": li.l_shipdate.dt.to_period("M").dt.to_timestamp(),
            "disc_c": disc_c,
            "promo_c": np.where(promo, disc_c, 0),
        }
    )
    g = df.groupby("month", as_index=False).sum()
    g["share_ppm"] = g.promo_c * 1_000_000 // g.disc_c
    ref = (
        g.rename(columns={"disc_c": "total_c"})
        [["month", "promo_c", "total_c", "share_ppm"]]
        .sort_values("month")
        .reset_index(drop=True)
    )
    eng["month"] = pd.to_datetime(eng.month)
    pd.testing.assert_frame_equal(
        eng.astype({"promo_c": "int64", "total_c": "int64", "share_ppm": "int64"}),
        ref.astype({"promo_c": "int64", "total_c": "int64", "share_ppm": "int64"}),
    )
    # both arms of the CASE must be live in most months
    assert (ref.promo_c > 0).any() and (ref.promo_c < ref.total_c).all()


def test_min_cost_supplier_matches_pandas_argmin(spark):
    eng = (
        Q.QUERIES["min_cost_supplier"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    sup = pd.read_parquet(SF_SMOKE + "/supplier.parquet")
    c = np.floor(li.l_extendedprice * 100.0).astype("int64")
    ps = (
        pd.DataFrame({"p": li.l_partkey, "s": li.l_suppkey, "c": c})
        .groupby(["p", "s"], as_index=False)
        .c.min()
    )
    # argmin with (min_c, suppkey) lexicographic tie-break
    ps = ps.sort_values(["p", "c", "s"]).drop_duplicates("p", keep="first")
    ref = (
        ps.merge(sup[["s_suppkey", "s_name"]], left_on="s", right_on="s_suppkey")
        .rename(columns={"p": "p_partkey", "c": "min_c"})
        [["p_partkey", "s_suppkey", "s_name", "min_c"]]
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        eng.astype({"min_c": "int64"}), ref.astype({"min_c": "int64"})
    )
    # multi-supplier parts dominate the synth world, so the argmin is
    # a real selection, not a pass-through
    assert ref.p_partkey.nunique() < len(
        pd.DataFrame({"p": li.l_partkey, "s": li.l_suppkey}).drop_duplicates()
    )


def test_host_assortativity_matches_python_stats(spark):
    eng = Q.QUERIES["host_assortativity"](spark, SF_SMOKE).toPandas()
    pages = _duck_pages("url, decode(html) AS h")
    und = set()
    for u, h in zip(pages.url, pages.h):
        a = _RAW_HOST.match(u).group(1).lower()
        for href in re.findall(r'<a href="([^"]+)">', h):
            b = _RAW_HOST.match(href).group(1).lower()
            if a != b:
                und.add((min(a, b), max(a, b)))
    deg: dict[str, int] = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = len(und)
    sum_dudv = sum(deg[u] * deg[v] for u, v in und)
    sum_d = sum(deg[u] + deg[v] for u, v in und)
    sum_d2 = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in und)
    row = eng.iloc[0]
    assert (
        int(row.m),
        int(row.sum_dudv),
        int(row.sum_d),
        int(row.sum_d2),
    ) == (m, sum_dudv, sum_d, sum_d2)
    # the derived coefficient must be a valid correlation
    r = (4 * m * sum_dudv - sum_d**2) / (2 * m * sum_d2 - sum_d**2)
    assert -1.0 <= r <= 1.0
