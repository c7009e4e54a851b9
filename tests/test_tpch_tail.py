"""Brute-force certification of the TPC-H completion batch (Q6/Q7/
Q12/Q18/Q19/Q11/Q20 shapes): each engine result vs an independent
pandas/numpy evaluation over the raw parquet — no SQL in the
reference path, so a shared dialect mistake can't hide.

Liveness is asserted wherever the shape depends on a filter doing
work (Q18's HAVING, Q19's disjunction, Q11's above-mean cutoff,
Q20's fair-share cutoff): a 0-row green gate would be vacuous.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pdxbldgimport_spark import registry as Q
from tests.conftest import SF_SMOKE


def _li():
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    li["cents"] = np.floor(li.l_extendedprice * 100.0).astype("int64")
    li["qty_c"] = np.floor(li.l_quantity * 100.0).astype("int64")
    li["disc_ppm"] = np.floor(li.l_discount * 1_000_000.0).astype("int64")
    li["disc_c"] = (li.cents * (1_000_000 - li.disc_ppm)) // 1_000_000
    return li


def test_forecast_revenue_matches_pandas(spark):
    eng = Q.QUERIES["forecast_revenue"](spark, SF_SMOKE).toPandas()
    li = _li()
    sel = li[
        (li.l_shipdate >= "1997-01-01")
        & (li.l_shipdate < "1998-01-01")
        & (li.l_discount >= 0.04)
        & (li.l_discount <= 0.06)
        & (li.l_quantity < 24)
    ]
    rev = int(((sel.cents * sel.disc_ppm) // 1_000_000).sum())
    assert len(eng) == 1
    assert int(eng.revenue_c[0]) == rev
    assert int(eng.n_rows[0]) == len(sel)
    assert 0 < len(sel) < len(li)  # every predicate must bite


def test_nation_volume_matches_pandas(spark):
    eng = (
        Q.QUERIES["nation_volume"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    li = _li()
    supp = pd.read_parquet(SF_SMOKE + "/supplier.parquet")
    orders = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    cust = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    nat = pd.read_parquet(SF_SMOKE + "/nation.parquet")
    j = (
        li.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
    )
    j = j[
        (j.s_nationkey < 4)
        & (j.c_nationkey < 4)
        & (j.s_nationkey != j.c_nationkey)
    ]
    names = nat.set_index("n_nationkey").n_name
    ref = (
        pd.DataFrame(
            {
                "supp_nation": j.s_nationkey.map(names),
                "cust_nation": j.c_nationkey.map(names),
                "l_year": j.l_shipdate.dt.year.astype("int64"),
                "disc_c": j.disc_c,
            }
        )
        .groupby(["supp_nation", "cust_nation", "l_year"], as_index=False)
        .agg(revenue_c=("disc_c", "sum"), n_items=("disc_c", "size"))
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    assert len(ref) > 0
    pd.testing.assert_frame_equal(
        eng.astype({"revenue_c": "int64", "n_items": "int64"}),
        ref.astype({"revenue_c": "int64", "n_items": "int64"}),
    )


def test_late_shipments_matches_pandas(spark):
    eng = (
        Q.QUERIES["late_shipments"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    orders = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    late = j.l_shipdate > j.o_orderdate + pd.Timedelta(days=60)
    ref = (
        pd.DataFrame({"o_orderpriority": j.o_orderpriority, "late": late})
        .groupby("o_orderpriority", as_index=False)
        .agg(n_late=("late", "sum"), n_ontime=("late", lambda s: (~s).sum()))
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert (ref.n_late > 0).any() and (ref.n_ontime > 0).any()
    pd.testing.assert_frame_equal(
        eng.astype({"n_late": "int64", "n_ontime": "int64"}),
        ref.astype({"n_late": "int64", "n_ontime": "int64"}),
    )


def test_large_orders_matches_pandas(spark):
    from pdxbldgimport_spark.queries_relational import _Q18_QTY

    eng = (
        Q.QUERIES["large_orders"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    li = _li()
    sums = li.groupby("l_orderkey").qty_c.sum()
    big = sums[sums > _Q18_QTY * 100]
    assert 0 < len(big) < len(sums)  # HAVING must bite and stay live
    assert sorted(eng.o_orderkey) == sorted(big.index)
    got = eng.set_index("o_orderkey").qty_c
    assert (got == big.reindex(got.index)).all()


def test_discount_revenue_matches_pandas(spark):
    eng = Q.QUERIES["discount_revenue"](spark, SF_SMOKE).toPandas()
    li = _li()
    part = pd.read_parquet(SF_SMOKE + "/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    m = (
        ((j.p_brand == "Brand#12") & j.p_size.between(1, 15)
         & j.l_quantity.between(1, 15))
        | ((j.p_brand == "Brand#23") & j.p_size.between(1, 25)
           & j.l_quantity.between(10, 25))
        | ((j.p_brand == "Brand#34") & j.p_size.between(1, 35)
           & j.l_quantity.between(20, 35))
    )
    sel = j[m]
    assert 0 < len(sel) < len(j)
    assert int(eng.revenue_c[0]) == int(sel.disc_c.sum())
    assert int(eng.n_items[0]) == len(sel)


def test_important_parts_matches_pandas(spark):
    eng = Q.QUERIES["important_parts"](spark, SF_SMOKE).toPandas()
    li = _li()
    pv = li.groupby("l_partkey").disc_c.sum()
    keep = pv[pv * len(pv) > pv.sum()]
    assert 0 < len(keep) < len(pv)  # above-mean cutoff live both ways
    assert sorted(eng.l_partkey) == sorted(keep.index)
    got = eng.set_index("l_partkey").value_c
    assert (got == keep.reindex(got.index)).all()


def test_dominant_suppliers_matches_pandas(spark):
    eng = (
        Q.QUERIES["dominant_suppliers"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    li = _li()
    ps = li.groupby(["l_partkey", "l_suppkey"], as_index=False).qty_c.sum()
    pt = ps.groupby("l_partkey").agg(
        part_qty_c=("qty_c", "sum"), n_supp=("qty_c", "size")
    )
    j = ps.merge(pt, on="l_partkey")
    dom = j[j.qty_c * j.n_supp > 2 * j.part_qty_c]
    assert 0 < len(dom) < len(j)
    ref = (
        dom.groupby("l_suppkey").size().rename("n_dominated").reset_index()
    )
    assert sorted(eng.s_suppkey) == sorted(ref.l_suppkey)
    got = eng.set_index("s_suppkey").n_dominated
    assert (got == ref.set_index("l_suppkey").n_dominated
            .reindex(got.index)).all()
