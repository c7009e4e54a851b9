"""Brute-force certification of the final-batch analytics operators:
label_propagation (pure-Python synchronous LPA replication),
parcel_scan_path / events_twa (pandas trajectory and TWA re-derivation),
and events_mad_outliers (numpy median/MAD) — all independent of both
engines' SQL formulations."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.synth import render
from tests.conftest import SF_SMOKE


def _duck_pages(cols: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    df = con.sql(
        f"SELECT {cols} FROM (" + render("pages", "duckdb") + ")"
    ).df()
    con.close()
    return df


def test_label_propagation_matches_python_lpa(spark):
    from pdxbldgimport_spark.queries_web import LPA_ITERS
    from pdxbldgimport_spark.synth import NP

    eng = (
        Q.QUERIES["label_propagation"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("host")
        .reset_index(drop=True)
    )

    pages = _duck_pages("pid, page_id")
    # symmetrized weighted edges
    from collections import Counter, defaultdict

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
            # max weight, tie -> smallest label
            nxt[h] = min(tw, key=lambda l: (-tw[l], l))
        lab = nxt
    ref = (
        pd.DataFrame(
            {
                "host": [f"h{h}.example.com" for h in lab],
                "community": [lab[h] for h in lab],
            }
        )
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        eng[["host", "community"]].astype({"community": "int64"}),
        ref.astype({"community": "int64"}),
    )
    # LPA must actually contract: fewer communities than hosts
    assert eng.community.nunique() < len(eng)


def test_parcel_scan_path_matches_pandas(spark):
    eng = (
        Q.QUERIES["parcel_scan_path"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    p = _duck_pages("pid, page_id, lon, lat").sort_values(
        ["pid", "page_id"]
    )
    p["ilon"] = np.floor(p.lon * 1e6).astype("int64")
    p["ilat"] = np.floor(p.lat * 1e6).astype("int64")
    g = p.groupby("pid")
    step = (g.ilon.diff().abs() + g.ilat.diff().abs())
    p["step"] = step
    ref = (
        p.groupby("pid")
        .agg(
            path_udeg=("step", lambda s: int(s.dropna().sum())),
            max_step_udeg=("step", lambda s: int(s.dropna().max()) if s.notna().any() else 0),
            n_pages=("page_id", "size"),
        )
        .reset_index()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    for c in ["path_udeg", "max_step_udeg", "n_pages"]:
        assert (eng[c].astype("int64") == ref[c].astype("int64")).all(), c


def test_events_twa_matches_pandas(spark):
    eng = (
        Q.QUERIES["events_twa"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    ev["cents"] = np.floor(ev.value * 100.0).astype("int64")
    ev = ev.sort_values(["user_id", "us", "event_id"])
    # keep every product in int64: the numerator exceeds 2^53, so a
    # float64 path silently drops the low bit
    ev["dt"] = (ev.groupby("user_id").us.shift(-1) - ev.us).fillna(0).astype("int64")
    num = (ev.cents * ev.dt).groupby(ev.user_id).sum()
    den = ev.groupby("user_id").dt.sum()
    n = ev.groupby("user_id").size()
    ref = (
        pd.DataFrame(
            {
                "twa_num": num.astype("int64"),
                "twa_den_us": den.astype("int64"),
                "n_events": n.astype("int64"),
            }
        )
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in ["twa_num", "twa_den_us", "n_events"]:
        assert (eng[c].astype("int64") == ref[c].astype("int64")).all(), c
    # the integral is non-degenerate: some user accumulated real time
    assert (eng.twa_den_us > 0).any()


def test_events_mad_outliers_matches_numpy(spark):
    eng = (
        Q.QUERIES["events_mad_outliers"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["c2"] = 2 * np.floor(ev.value * 100.0).astype("int64")
    rows = []
    for et, g in ev.groupby("event_type"):
        med2 = int(np.median(g.c2))  # doubled ints: midpoint is integer
        dev2 = (g.c2 - med2).abs()
        mad4 = int(np.median(2 * dev2))
        rows.append(
            {
                "event_type": et,
                "med2": med2,
                "mad4": mad4,
                "n_outliers": int((4 * dev2 > 7 * mad4).sum()),
                "n_events": len(g),
            }
        )
    ref = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    for c in ["med2", "mad4", "n_outliers", "n_events"]:
        assert (eng[c].astype("int64") == ref[c].astype("int64")).all(), c
    # the rule is live: at least one type flags at least one outlier
    assert (eng.n_outliers > 0).any()
