"""Raster↔vector kernel: property tests (vectorized outline vs raster
set algebra on random cell sets) + the oracle-gated tile_dissolve query
shape."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pdxbldgimport_spark.geo.raster import ring_stats, trace_cells


def _stats_bruteforce(cells: set) -> tuple[int, int]:
    """(n_cells, boundary_edges) straight from set algebra."""
    n = len(cells)
    h = sum(1 for (x, y) in cells if (x + 1, y) in cells)
    v = sum(1 for (x, y) in cells if (x, y + 1) in cells)
    return n, 4 * n - 2 * h - 2 * v


def _check(cells: set) -> None:
    ix = np.array([c[0] for c in cells])
    iy = np.array([c[1] for c in cells])
    rings = trace_cells(ix, iy)
    area, perim, n_rings = ring_stats(rings)
    want_n, want_b = _stats_bruteforce(cells)
    assert area == want_n          # shoelace(vector) == |raster set|
    assert perim == want_b         # ring perimeter == boundary edges
    assert n_rings >= 1
    for r in rings:
        xs, ys = r[0::2], r[1::2]
        assert xs[0] == xs[-1] and ys[0] == ys[-1]      # closed
        assert len(xs) >= 5                              # ≥ a square
        dx, dy = xs[1:] - xs[:-1], ys[1:] - ys[:-1]
        assert np.all((dx == 0) | (dy == 0))             # rectilinear
        assert np.all((dx != 0) | (dy != 0))             # no dup points
        # collinear runs merged: consecutive edges never same direction
        sx = np.sign(dx)
        sy = np.sign(dy)
        assert not np.any((sx[1:] == sx[:-1]) & (sy[1:] == sy[:-1]))


def test_single_cell():
    _check({(3, 4)})


def test_rect_block():
    _check({(x, y) for x in range(4) for y in range(3)})


def test_donut_has_hole_ring():
    cells = {(x, y) for x in range(4) for y in range(4)} - {(1, 1), (2, 1), (1, 2), (2, 2)}
    ix = np.array([c[0] for c in cells])
    iy = np.array([c[1] for c in cells])
    rings = trace_cells(ix, iy)
    area, perim, n_rings = ring_stats(rings)
    assert n_rings == 2 and area == 12  # 16 − 4-cell hole
    _check(cells)


def test_diagonal_pinch():
    # two cells touching only at a corner: two simple rings
    cells = {(0, 0), (1, 1)}
    ix = np.array([0, 1])
    iy = np.array([0, 1])
    rings = trace_cells(ix, iy)
    assert len(rings) == 2
    _check(cells)


def test_two_components():
    _check({(0, 0), (0, 1), (5, 5)})


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_random_cell_sets(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 60))
    pts = {(int(x), int(y)) for x, y in rng.integers(0, 8, size=(n, 2))}
    _check(pts)


def test_tile_dissolve_query(spark):
    from pdxbldgimport_spark.queries import q_tile_dissolve

    got = q_tile_dissolve(spark, "/root/testdata/sf0.001").collect()
    assert got
    for r in got:
        assert r["n_cells"] > 0
        assert r["boundary_edges"] >= 4
        assert r["boundary_edges"] % 2 == 0


def test_tile_pyramid_matches_python_reference(spark):
    """Multi-zoom rollup vs a literal Python reference over raw lon/lat
    (same IEEE double ops as tile_expr), including parent-sum identity."""
    import math
    from collections import Counter

    from pdxbldgimport_spark import registry as Q
    from pdxbldgimport_spark.geo import cells as C
    from pdxbldgimport_spark.queries import views
    from tests.conftest import SF_SMOKE

    views(spark, SF_SMOKE)
    pts = spark.table("pages").select("lon", "lat").collect()
    base = Counter()
    for r in pts:
        ix = min(max(math.floor((r["lon"] - C.LON_W) / C.SPAN_X * 32.0), 0), 31)
        iy = min(max(math.floor((r["lat"] - C.LAT_S) / C.SPAN_Y * 32.0), 0), 31)
        base[iy * 32 + ix] += 1
    expect = {(5, t): c for t, c in base.items()}
    l4 = Counter()
    for t, c in base.items():
        l4[(t // 32) // 2 * 16 + (t % 32) // 2] += c
    expect.update({(4, t): c for t, c in l4.items()})
    l3 = Counter()
    for t, c in l4.items():
        l3[(t // 16) // 2 * 8 + (t % 16) // 2] += c
    expect.update({(3, t): c for t, c in l3.items()})
    got = {
        (r["zoom"], r["tile_id"]): r["page_count"]
        for r in Q.QUERIES["tile_pyramid"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # each level's total equals the page count (no rows lost by parenting)
    n = len(pts)
    for z in (3, 4, 5):
        assert sum(c for (zz, _), c in got.items() if zz == z) == n


def test_cell_compact_matches_python_reference(spark):
    """H3-style compaction vs a literal Python reference over raw
    lon/lat: same IEEE double base-cell math as tile_expr, then literal
    bottom-up replace-complete-sibling-sets, plus the cover invariants
    (page_count conservation, minimality, disjoint exact cover)."""
    import math

    from pdxbldgimport_spark import registry as Q
    from pdxbldgimport_spark.geo import cells as C
    from pdxbldgimport_spark.queries import RES_COMPACT, views
    from tests.conftest import SF_SMOKE

    views(spark, SF_SMOKE)
    pts = spark.table("pages").select("lon", "lat").collect()
    n = 1 << RES_COMPACT
    level = {}
    for r in pts:
        ix = min(max(math.floor((r["lon"] - C.LON_W) / C.SPAN_X * float(n)), 0), n - 1)
        iy = min(max(math.floor((r["lat"] - C.LAT_S) / C.SPAN_Y * float(n)), 0), n - 1)
        t = iy * n + ix
        level[t] = level.get(t, 0) + 1

    def parent(t: int, res: int) -> int:
        m = 1 << res
        return ((t // m) // 2) * (m // 2) + (t % m) // 2

    expect = {}
    for res in range(RES_COMPACT, 0, -1):
        groups: dict = {}
        for t, c in level.items():
            groups.setdefault(parent(t, res), []).append((t, c))
        nxt = {p: sum(c for _, c in kids) for p, kids in groups.items() if len(kids) == 4}
        for t, c in level.items():
            if parent(t, res) not in nxt:
                expect[(res, t)] = c
        level = nxt
    for t, c in level.items():
        expect[(0, t)] = c

    got = {
        (r["zoom"], r["tile_id"]): r["page_count"]
        for r in Q.QUERIES["cell_compact"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # exact cover: counts conserve
    assert sum(got.values()) == len(pts)
    # minimality: no emitted cell's ancestor is also emitted
    emitted = set(got)
    for zoom, t in emitted:
        a, res = t, zoom
        while res > 0:
            a = parent(a, res)
            res -= 1
            assert (res, a) not in emitted


def test_tile_focal_stats_matches_python_reference(spark):
    """3x3 focal mean vs a literal Python moving-window over the tile
    grid built from raw lon/lat — edge tiles average over their real
    neighbor count (no zero-padding bias)."""
    import math

    from pdxbldgimport_spark import registry as Q
    from pdxbldgimport_spark.geo import cells as C
    from pdxbldgimport_spark.queries import views
    from tests.conftest import SF_SMOKE

    views(spark, SF_SMOKE)
    pts = spark.table("pages").select("lon", "lat").collect()
    n = 1 << C.RES_TILE
    base: dict = {}
    for r in pts:
        ix = min(max(math.floor((r["lon"] - C.LON_W) / C.SPAN_X * float(n)), 0), n - 1)
        iy = min(max(math.floor((r["lat"] - C.LAT_S) / C.SPAN_Y * float(n)), 0), n - 1)
        t = iy * n + ix
        base[t] = base.get(t, 0) + 1
    # focal targets: every cell in the 3x3 neighborhood of an occupied
    # cell (the engine's explode direction), keyed by target tile
    acc: dict = {}
    for t, c in base.items():
        ix, iy = t % n, t // n
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                if 0 <= jx < n and 0 <= jy < n:
                    s, k = acc.get(jy * n + jx, (0, 0))
                    acc[jy * n + jx] = (s + c, k + 1)
    expect = {
        t: (base.get(t, 0), k, s, 1000000 * s // k)
        for t, (s, k) in acc.items()
    }
    got = {
        r["tile_id"]: (
            r["page_count"], r["n_nbrs"], r["focal_sum"], r["focal_mean_ppm"]
        )
        for r in Q.QUERIES["tile_focal_stats"](spark, SF_SMOKE).collect()
    }
    assert got == expect
