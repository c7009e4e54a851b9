"""Brute-force certification of the moments/share batch:
tile_pca_moments vs a numpy centered-moments pass (plus the int64
headroom argument made live), national_share vs exact integer pandas,
events_simpson vs a Counter re-derivation, and trimmed_mean_value vs a
numpy row-sort winsorization — all independent of both engines' SQL
formulations."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pdxbldgimport_spark import registry as Q
from tests.conftest import SF_SMOKE
from tests.test_robust_graph import _duck_pages


def test_tile_pca_moments_matches_numpy(spark):
    from pdxbldgimport_spark.geo import cells as C
    from pdxbldgimport_spark.geo.cells import tile_key

    eng = (
        Q.QUERIES["tile_pca_moments"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    pages = _duck_pages("lon, lat")
    t = tile_key(pages.lon.to_numpy(), pages.lat.to_numpy(), C.RES_TILE)
    ix = np.floor(pages.lon.to_numpy() * 1e6).astype("int64")
    iy = np.floor(pages.lat.to_numpy() * 1e6).astype("int64")
    rows = []
    for tt in np.unique(t):
        m = t == tt
        dx = ix[m] - ix[m].min()
        dy = iy[m] - iy[m].min()
        rows.append(
            {
                "t": int(tt),
                "n": int(m.sum()),
                "min_ix": int(ix[m].min()),
                "min_iy": int(iy[m].min()),
                "sx": int(dx.sum()),
                "sy": int(dy.sum()),
                "sxx": int((dx * dx).sum()),
                "syy": int((dy * dy).sum()),
                "sxy": int((dx * dy).sum()),
            }
        )
    ref = pd.DataFrame(rows).sort_values("t").reset_index(drop=True)
    pd.testing.assert_frame_equal(eng.astype("int64"), ref.astype("int64"))
    # the centering must be load-bearing: raw global-µdeg squares would
    # exceed int64 for at least one tile (the overflow the two-phase
    # formulation exists to avoid)
    raw_sq = (ix.astype(object) ** 2)
    per_tile = pd.Series(raw_sq).groupby(t).sum()
    assert (per_tile > np.iinfo("int64").max).any()


def test_national_share_matches_integer_pandas(spark):
    eng = (
        Q.QUERIES["national_share"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    orders = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    sup = pd.read_parquet(SF_SMOKE + "/supplier.parquet")
    cents = np.floor(li.l_extendedprice * 100.0).astype("int64")
    dppm = np.floor(li.l_discount * 1_000_000.0).astype("int64")
    disc_c = (cents * (1_000_000 - dppm)) // 1_000_000
    year = li.l_orderkey.map(
        orders.set_index("o_orderkey").o_orderdate.dt.year
    ).astype("int64")
    bloc = li.l_suppkey.map(
        (sup.set_index("s_suppkey").s_nationkey % 2).eq(0)
    ).astype(bool)
    df = pd.DataFrame(
        {
            "o_year": year,
            "total_c": disc_c,
            "bloc_c": np.where(bloc, disc_c, 0),
        }
    )
    g = df.groupby("o_year", as_index=False).sum()
    g["share_ppm"] = g.bloc_c * 1_000_000 // g.total_c
    ref = (
        g[["o_year", "bloc_c", "total_c", "share_ppm"]]
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng.astype("int64"), ref.astype("int64"))
    assert (g.bloc_c > 0).all() and (g.bloc_c < g.total_c).all()


def test_events_simpson_matches_counter(spark):
    from collections import Counter

    eng = (
        Q.QUERIES["events_simpson"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    cu = Counter(zip(ev.event_type, ev.user_id))
    rows: dict[str, list[int]] = {}
    for (et, _), c in cu.items():
        cell = rows.setdefault(et, [0, 0, 0, 0])
        cell[0] += c
        cell[1] += 1
        cell[2] += c * c
        cell[3] += c * (c - 1)
    ref = (
        pd.DataFrame(
            [
                {
                    "event_type": et,
                    "n_events": c[0],
                    "n_users": c[1],
                    "sum_c2": c[2],
                    "sum_coll": c[3],
                }
                for et, c in rows.items()
            ]
        )
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        eng.astype({c: "int64" for c in ref.columns if c != "event_type"}),
        ref,
    )
    # derived collision index must be a valid probability per type
    lam = ref.sum_coll / (ref.n_events * (ref.n_events - 1))
    assert ((lam >= 0) & (lam <= 1)).all()


def test_trimmed_mean_value_matches_numpy_winsor(spark):
    eng = (
        Q.QUERIES["trimmed_mean_value"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    cents = np.floor(ev.value * 100 + 0.5).astype("int64")
    rows = []
    for et, grp in pd.DataFrame({"t": ev.event_type, "c": cents}).groupby("t"):
        v = np.sort(grp.c.to_numpy())
        n = len(v)
        lo = v[int(np.ceil(n / 10.0)) - 1]  # smallest with 10·rn >= n
        hi = v[int(np.ceil(9 * n / 10.0)) - 1]
        rows.append(
            {
                "event_type": et,
                "n_events": n,
                "lo_c": int(lo),
                "hi_c": int(hi),
                "winsor_sum_c": int(np.clip(v, lo, hi).sum()),
            }
        )
    ref = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        eng.astype({c: "int64" for c in ref.columns if c != "event_type"}),
        ref,
    )
    # clamping must bite on both tails
    raw = pd.DataFrame({"t": ev.event_type, "c": cents}).groupby("t").c.sum()
    assert (ref.set_index("event_type").winsor_sum_c != raw).any()
