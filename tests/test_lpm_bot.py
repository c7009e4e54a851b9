"""Brute-force certification of the LPM/bot/weighted-quantile batch:
ip_lpm_route vs a pure-Python longest-prefix-match over the same
deterministic route derivation, bot_users vs a pandas modal-gap
re-derivation (including the grid-median == row-median equivalence the
engine relies on), weighted_quantiles vs a direct cumulative-weight
scan, and top_supplier vs a pandas integer-cents max."""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from pdxbldgimport_spark import registry as Q
from tests.conftest import SF_SMOKE
from tests.test_robust_graph import _duck_pages

_RAW_HOST = re.compile(r"^[A-Za-z]+://([^/:?#]+)")


def _h60(s: str, off: int = 0) -> int:
    hx = hashlib.md5(s.encode()).hexdigest()
    return sum(int(hx[off + n], 16) * 16**n for n in range(15))


def test_ip_lpm_route_matches_python_lpm(spark):
    from pdxbldgimport_spark.queries_crawl import LPM_LEVELS, _IP_MOD

    eng = (
        Q.QUERIES["ip_lpm_route"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["region", "plen"])
        .reset_index(drop=True)
    )
    pages = _duck_pages("url")
    hosts: dict[str, int] = {}
    for u in pages.url:
        h = _RAW_HOST.match(u).group(1).lower()
        hosts[h] = hosts.get(h, 0) + 1
    ip = {h: _h60(h) % _IP_MOD for h in hosts}
    routes = set()
    for plen, mod in LPM_LEVELS:
        for h in hosts:
            if _h60(f"sel{plen}:{h}") % mod == 0:
                routes.add((plen, ip[h] >> (32 - plen)))
    rows: dict[tuple[str, int], list[int]] = {}
    for h, np_ in hosts.items():
        best = (0, "default")
        for plen, _ in LPM_LEVELS:
            key = (plen, ip[h] >> (32 - plen))
            if key in routes and plen > best[0]:
                best = (plen, f"g{(key[1] + plen) % 9}")
        cell = rows.setdefault((best[1], best[0]), [0, 0])
        cell[0] += 1
        cell[1] += np_
    ref = (
        pd.DataFrame(
            [
                {"region": r, "plen": p, "n_hosts": c[0], "n_pages": c[1]}
                for (r, p), c in rows.items()
            ]
        )
        .sort_values(["region", "plen"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        eng[["region", "plen", "n_hosts", "n_pages"]].astype(
            {"plen": "int64", "n_hosts": "int64", "n_pages": "int64"}
        ),
        ref.astype({"plen": "int64", "n_hosts": "int64", "n_pages": "int64"}),
    )


def test_bot_users_matches_pandas(spark):
    from pdxbldgimport_spark.queries_events import BOT_Q_US

    eng = (
        Q.QUERIES["bot_users"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["s"] = ev.ts.astype("datetime64[us]").astype("int64") // BOT_Q_US
    recs = []
    for uid, grp in ev.groupby("user_id"):
        s = grp.sort_values(["s", "event_id"]).s.to_numpy()
        gaps = pd.Series(s[1:] - s[:-1])
        if gaps.empty:
            continue
        vc = gaps.value_counts()
        recs.append(
            {
                "user_id": uid,
                "n_gaps": len(gaps),
                "n_gaps_distinct": len(vc),
                "modal_cnt": int(vc.max()),
                "share_ppm": int(vc.max()) * 1_000_000 // len(gaps),
            }
        )
    ref = pd.DataFrame(recs)
    shares = sorted(ref.share_ppm)
    med = shares[(len(shares) + 1) // 2 - 1]
    ref["is_bot"] = (2 * ref.share_ppm >= 3 * med).astype("int64")
    ref = ref.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        eng.astype("int64"), ref.astype("int64")
    )


def test_weighted_quantiles_matches_scan(spark):
    eng = (
        Q.QUERIES["weighted_quantiles"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs["w"] = docs.text.map(
        lambda t: len(t) - len(t.replace(" ", "")) + 1
    )
    recs = []
    for lang, grp in docs.groupby("lang"):
        g = grp.groupby("n_chars").w.sum().sort_index()
        total = int(g.sum())
        cum = g.cumsum()
        med = int(cum.index[(2 * cum >= total).to_numpy().argmax()])
        p90 = int(cum.index[(10 * cum >= 9 * total).to_numpy().argmax()])
        recs.append(
            {"lang": lang, "total_w": total, "median_v": med, "p90_v": p90}
        )
    ref = pd.DataFrame(recs).sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        eng.astype({"total_w": "int64", "median_v": "int64", "p90_v": "int64"}),
        ref.astype({"total_w": "int64", "median_v": "int64", "p90_v": "int64"}),
    )


def test_top_supplier_matches_pandas(spark):
    import math

    eng = Q.QUERIES["top_supplier"](spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    li = li[
        (li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1996-04-01")
    ].copy()
    li["disc_c"] = [
        math.floor(p * 100) * (1_000_000 - math.floor(d * 1_000_000))
        // 1_000_000
        for p, d in zip(li.l_extendedprice, li.l_discount)
    ]
    rev = li.groupby("l_suppkey").disc_c.sum()
    top = rev[rev == rev.max()]
    sup = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet").set_index(
        "s_suppkey"
    )
    assert len(eng) == len(top)
    for _, row in eng.iterrows():
        assert row.total_rev_c == int(top[row.s_suppkey])
        assert row.s_name == sup.loc[row.s_suppkey, "s_name"]
