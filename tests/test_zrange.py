"""zrange_bbox_count + host_ppr certification.

zrange: the capped quadtree cover must be a strict SUPERSET of the
bbox cells (refine has work to do) while still pruning (range-only
count strictly between bbox count and corpus count), and the final
count must equal an independent pandas quantization. host_ppr: exact
match vs a pure-Python integer power-iteration with seed-restricted
teleport, plus the two structural properties that distinguish PPR
from global PageRank — zero rank off the seed-reachable set, positive
rank on every seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.queries_spatial import (
    RES_Z,
    ZR_DEPTH,
    ZR_RANGES,
    ZR_X0,
    ZR_X1,
    ZR_Y0,
    ZR_Y1,
    _morton_int,
    _zranges,
)
from tests.conftest import SF_SMOKE
from tests.test_robust_graph import _duck_pages


def _grid_coords():
    from pdxbldgimport_spark.geo import cells as C

    pages = _duck_pages("page_id, lon, lat")
    n = 1 << RES_Z
    ix = np.clip(
        np.floor((pages.lon.to_numpy() - C.LON_W) / C.SPAN_X * n), 0, n - 1
    ).astype("int64")
    iy = np.clip(
        np.floor((pages.lat.to_numpy() - C.LAT_S) / C.SPAN_Y * n), 0, n - 1
    ).astype("int64")
    return pages, ix, iy


def test_cover_is_strict_superset_and_exact_at_full_depth():
    # full-depth decomposition covers the bbox cells exactly
    full = _zranges(ZR_X0, ZR_X1, ZR_Y0, ZR_Y1, RES_Z, RES_Z)
    exact = set()
    for lo, hi in full:
        exact.update(range(lo, hi + 1))
    truth = {
        _morton_int(x, y, RES_Z)
        for x in range(ZR_X0, ZR_X1 + 1)
        for y in range(ZR_Y0, ZR_Y1 + 1)
    }
    assert exact == truth
    # the capped cover is a strict superset (refine is load-bearing)
    capped = set()
    for lo, hi in ZR_RANGES:
        capped.update(range(lo, hi + 1))
    assert truth < capped
    assert len(ZR_RANGES) < len(full)  # capping actually shrank it
    assert ZR_DEPTH < RES_Z


def test_count_matches_pandas_and_pruning_is_live(spark):
    eng = Q.QUERIES["zrange_bbox_count"](spark, SF_SMOKE).toPandas()
    pages, ix, iy = _grid_coords()
    in_bbox = (
        (ix >= ZR_X0) & (ix <= ZR_X1) & (iy >= ZR_Y0) & (iy <= ZR_Y1)
    )
    assert int(eng.n_pages[0]) == int(in_bbox.sum())
    # pruning liveness: range predicate admits strictly more rows than
    # the bbox but strictly fewer than the corpus
    z = np.zeros(len(ix), dtype="int64")
    for b in range(RES_Z):
        z |= (((ix >> b) & 1) << (2 * b + 1)) | (((iy >> b) & 1) << (2 * b))
    in_ranges = np.zeros(len(z), dtype=bool)
    for lo, hi in ZR_RANGES:
        in_ranges |= (z >= lo) & (z <= hi)
    assert in_bbox.sum() < in_ranges.sum() < len(z)
    assert (in_bbox <= in_ranges).all()  # superset on the data too


def test_host_ppr_matches_python_power_iteration(spark):
    from pdxbldgimport_spark import synth
    from pdxbldgimport_spark.queries_web import (
        PPR_ITERS,
        PPR_SEED_MOD,
        PR_SCALE,
        _PR_BASE,
    )

    eng = (
        Q.QUERIES["host_ppr"](spark, SF_SMOKE)
        .toPandas()
        .set_index("host")
        .rank_scaled
    )
    pages = _duck_pages("pid, page_id")
    edges = {}
    for pid, page_id in zip(pages.pid, pages.page_id):
        k = (int(pid), int(page_id * 13 + 7) % synth.NP)
        edges[k] = edges.get(k, 0) + 1
    ow = {}
    for (s, d), w in edges.items():
        ow[s] = ow.get(s, 0) + w
    hosts = {s for s, _ in edges} | {d for _, d in edges}
    r = {h: (PR_SCALE if h % PPR_SEED_MOD == 0 else 0) for h in hosts}
    for _ in range(PPR_ITERS):
        nxt = {
            h: (_PR_BASE if h % PPR_SEED_MOD == 0 else 0) for h in hosts
        }
        for (s, d), w in edges.items():
            nxt[d] += (850 * r[s] * w) // (1000 * ow[s])
        r = nxt
    ref = {f"h{h}.example.com": v for h, v in r.items()}
    assert len(eng) == len(ref)
    for host, v in ref.items():
        assert int(eng[host]) == v, host
    # structural PPR properties
    seeds = [f"h{h}.example.com" for h in hosts if h % PPR_SEED_MOD == 0]
    non_seeds = [
        f"h{h}.example.com" for h in hosts if h % PPR_SEED_MOD != 0
    ]
    assert seeds and all(eng[s] > 0 for s in seeds)
    # non-seeds get NO restart mass: every non-seed rank is pure
    # propagation, so somewhere it must sit below the restart floor a
    # global-teleport PageRank would guarantee every vertex
    assert min(eng[h] for h in non_seeds) < _PR_BASE
    assert all(eng[s] >= _PR_BASE for s in seeds)
