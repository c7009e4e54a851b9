"""Property tests for the per-cell k-ring kNN operator (J10 / north_star).

Engine result must equal a numpy brute force with the same ring-bounded
semantics; and whenever the global nearest lies within the ring guarantee
radius (k_ring * min cell edge), the ring answer must BE the global
nearest — exercised with points hugging cell boundaries, the case the
round-1 parcel equi-join got wrong.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdxbldgimport_spark.geo import cells as C
from pdxbldgimport_spark.operators.knn import K_RING, RES_KNN, knn_join

N = 1 << RES_KNN
EDGE_X = C.SPAN_X / N
EDGE_Y = C.SPAN_Y / N


def _idx(v, lo, span):
    return np.clip(np.floor((v - lo) / span * N).astype(np.int64), 0, N - 1)


def _brute(pts: pd.DataFrame, cents: pd.DataFrame):
    """Ring-bounded nearest + unbounded (global) nearest per point."""
    ixp = _idx(pts.lon.to_numpy(), C.LON_W, C.SPAN_X)
    iyp = _idx(pts.lat.to_numpy(), C.LAT_S, C.SPAN_Y)
    ixf = _idx(cents.centroid_lon.to_numpy(), C.LON_W, C.SPAN_X)
    iyf = _idx(cents.centroid_lat.to_numpy(), C.LAT_S, C.SPAN_Y)
    d2 = (pts.lon.to_numpy()[:, None] - cents.centroid_lon.to_numpy()) ** 2 + (
        pts.lat.to_numpy()[:, None] - cents.centroid_lat.to_numpy()
    ) ** 2
    in_ring = (np.abs(ixp[:, None] - ixf) <= K_RING) & (
        np.abs(iyp[:, None] - iyf) <= K_RING
    )
    cand_ids = cents.fp_id.to_numpy()
    ring_best, global_best, global_d = {}, {}, {}
    for i, pid in enumerate(pts.page_id.to_numpy()):
        order = np.lexsort((cand_ids, d2[i]))
        global_best[pid] = cand_ids[order[0]]
        global_d[pid] = float(np.sqrt(d2[i][order[0]]))
        ring = order[in_ring[i][order]]
        if len(ring):
            ring_best[pid] = cand_ids[ring[0]]
    return ring_best, global_best, global_d


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_knn_ring_vs_bruteforce(spark, seed):
    rng = np.random.default_rng(seed)
    n_pts, n_cand = 300, 80
    # half the points sit exactly on / a hair from cell boundaries
    lon = rng.uniform(C.LON_W, C.LON_E, n_pts)
    lat = rng.uniform(C.LAT_S, C.LAT_N, n_pts)
    gx = C.LON_W + rng.integers(1, N, n_pts // 2) * EDGE_X
    gy = C.LAT_S + rng.integers(1, N, n_pts // 2) * EDGE_Y
    eps = rng.choice([-1e-12, 0.0, 1e-12], n_pts // 2)
    lon[: n_pts // 2] = gx + eps
    lat[: n_pts // 2] = gy - eps
    pts = pd.DataFrame(
        {"page_id": np.arange(n_pts, dtype=np.int64), "lon": lon, "lat": lat}
    )
    cents = pd.DataFrame(
        {
            "fp_id": np.arange(n_cand, dtype=np.int64),
            "centroid_lon": rng.uniform(C.LON_W, C.LON_E, n_cand),
            "centroid_lat": rng.uniform(C.LAT_S, C.LAT_N, n_cand),
        }
    )
    got = (
        knn_join(
            spark.createDataFrame(pts), spark.createDataFrame(cents),
            "page_id", "fp_id",
        )
        .toPandas()
        .set_index("page_id")["fp_id"]
        .to_dict()
    )
    ring_best, global_best, global_d = _brute(pts, cents)
    assert got == ring_best
    # ring guarantee: global nearest within k*min_edge ⇒ ring answer is it
    guard = K_RING * min(EDGE_X, EDGE_Y)
    for pid, d in global_d.items():
        if d < guard:
            assert got.get(pid) == global_best[pid], (pid, d)


def test_knn_shuffle_path_matches_broadcast(spark):
    """Planner-choice invariance for the size gate: forcing the shuffle
    path (broadcast_max_ring_rows=0) yields exactly the broadcast-path
    result — the gate only changes the physical join, never the pairs."""
    rng = np.random.default_rng(5)
    n_pts, n_cand = 500, 60
    pts = pd.DataFrame(
        {
            "page_id": np.arange(n_pts, dtype=np.int64),
            "lon": rng.uniform(C.LON_W, C.LON_E, n_pts),
            "lat": rng.uniform(C.LAT_S, C.LAT_N, n_pts),
        }
    )
    cents = pd.DataFrame(
        {
            "fp_id": np.arange(n_cand, dtype=np.int64),
            "centroid_lon": rng.uniform(C.LON_W, C.LON_E, n_cand),
            "centroid_lat": rng.uniform(C.LAT_S, C.LAT_N, n_cand),
        }
    )
    sp, sc = spark.createDataFrame(pts), spark.createDataFrame(cents)
    bc = {
        (r["page_id"], r["fp_id"], r["rn"])
        for r in knn_join(sp, sc, "page_id", "fp_id", top_k=2).collect()
    }
    sh = {
        (r["page_id"], r["fp_id"], r["rn"])
        for r in knn_join(
            sp, sc, "page_id", "fp_id", top_k=2, broadcast_max_ring_rows=0
        ).collect()
    }
    assert bc == sh and len(bc) > 0


def test_knn_exact_tie_breaks_by_candidate_id(spark):
    """Two candidates at bit-identical distance: the winner must be the
    lower id on BOTH strategies (struct-min top_k=1, window top_k>1) —
    the pinned ORDER BY d2, cand_id semantics."""
    pts = pd.DataFrame({"page_id": [1], "lon": [-122.5], "lat": [45.4]})
    # symmetric offsets → identical squared distance
    cents = pd.DataFrame(
        {
            "fp_id": [20, 7],
            "centroid_lon": [-122.5 + 0.003, -122.5 - 0.003],
            "centroid_lat": [45.4, 45.4],
        }
    )
    sp, sc = spark.createDataFrame(pts), spark.createDataFrame(cents)
    top1 = knn_join(sp, sc, "page_id", "fp_id").collect()
    assert [(r["page_id"], r["fp_id"], r["rn"]) for r in top1] == [(1, 7, 1)]
    top2 = sorted(
        (r["rn"], r["fp_id"]) for r in knn_join(sp, sc, "page_id", "fp_id", top_k=2).collect()
    )
    assert top2 == [(1, 7), (2, 20)]


def test_knn_top_k_ranks(spark):
    pts = pd.DataFrame({"page_id": [1], "lon": [-122.5], "lat": [45.4]})
    cents = pd.DataFrame(
        {
            "fp_id": [10, 11, 12],
            "centroid_lon": [-122.5001, -122.502, -122.51],
            "centroid_lat": [45.4, 45.4, 45.4],
        }
    )
    got = (
        knn_join(
            spark.createDataFrame(pts), spark.createDataFrame(cents),
            "page_id", "fp_id", top_k=3,
        )
        .toPandas()
        .sort_values("rn")
    )
    assert got.fp_id.tolist() == [10, 11, 12] and got.rn.tolist() == [1, 2, 3]
