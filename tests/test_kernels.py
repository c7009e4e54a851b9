"""Unit tests for the numpy geometry kernels (no Spark needed).

Property tests: cell-bucketed PIP vs brute force on random geometry;
polygon-intersects vs rectangle interval logic; kNN vs brute force
(SURVEY.md §5 property-based strategy).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pdxbldgimport_spark.geo import cells as C
from pdxbldgimport_spark.geo import core


def rect_ring(x0, y0, x1, y1):
    return [x0, y0, x1, y0, x1, y1, x0, y1, x0, y0]


def test_pip_rect_conventions():
    rs = core.RingSet.from_arrow_lists([[rect_ring(-123.0, 45.0, -122.9, 45.1)]])
    # interior / exterior / half-open boundary behavior
    px = np.array([-122.95, -122.95, -123.0, -122.9, -122.95, -122.95])
    py = np.array([45.05, 45.2, 45.05, 45.05, 45.0, 45.1])
    pairs = np.arange(6)
    got = core.points_in_polygons_pairs(px, py, rs, pairs, np.zeros(6, np.int64))
    assert got.tolist() == [True, False, True, False, True, False]


def test_pip_concave_and_holes():
    # L-shape: unit square minus top-right quadrant
    l_shape = [0, 0, 2, 0, 2, 1, 1, 1, 1, 2, 0, 2, 0, 0]
    donut = [rect_ring(4, 4, 8, 8), rect_ring(5, 5, 7, 7)]
    rs = core.RingSet.from_arrow_lists([[l_shape], donut])
    px = np.array([1.5, 1.5, 0.5, 4.5, 6.0])
    py = np.array([0.5, 1.5, 1.5, 4.5, 6.0])
    pl = np.array([0, 0, 0, 1, 1])
    got = core.points_in_polygons_pairs(px, py, rs, np.arange(5), pl)
    assert got.tolist() == [True, False, True, True, False]


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_pip_random_polygon_vs_matplotlib_free_bruteforce(seed):
    """Random star-convex polygons; compare kernel vs an independent
    per-point pure-python ray cast."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 12))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.2, 1.0, n)
    cx, cy = rng.uniform(-1, 1, 2)
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    ring = np.column_stack([np.append(xs, xs[0]), np.append(ys, ys[0])]).ravel().tolist()
    rs = core.RingSet.from_arrow_lists([[ring]])
    pts = rng.uniform(-2, 2, (50, 2))

    def slow_pip(qx, qy):
        inside = False
        for i in range(n):
            x1, y1 = xs[i], ys[i]
            x2, y2 = xs[(i + 1) % n], ys[(i + 1) % n]
            if (y1 > qy) != (y2 > qy) and qx < x1 + (x2 - x1) * (qy - y1) / (y2 - y1):
                inside = not inside
        return inside

    got = core.points_in_polygons_pairs(
        pts[:, 0], pts[:, 1], rs, np.arange(50), np.zeros(50, np.int64)
    )
    want = [slow_pip(q[0], q[1]) for q in pts]
    assert got.tolist() == want


def test_area_centroid_pos():
    rs = core.RingSet.from_arrow_lists(
        [[rect_ring(0, 0, 2, 1)], [[0, 0, 4, 0, 4, 1, 3, 1, 3, 3, 0, 3, 0, 0]]]  # rect, L
    )
    a = core.poly_area(rs, projected_ft=False)
    assert a == pytest.approx([2.0, 4 + 2 * 3])
    cx, cy = core.poly_centroid(rs)
    assert cx[0] == pytest.approx(1.0) and cy[0] == pytest.approx(0.5)
    sx, sy = core.point_on_surface(rs)
    inside = core.points_in_polygons_pairs(sx, sy, rs, np.arange(2), np.arange(2))
    assert inside.all()


def test_point_on_surface_concave_centroid_outside():
    # U-shape whose centroid falls in the notch
    u = [0, 0, 5, 0, 5, 5, 4, 5, 4, 1, 1, 1, 1, 5, 0, 5, 0, 0]
    rs = core.RingSet.from_arrow_lists([[u]])
    sx, sy = core.point_on_surface(rs)
    assert core.points_in_polygons_pairs(sx, sy, rs, np.array([0]), np.array([0]))[0]


def test_self_intersect_detection():
    bow = core.RingSet.from_arrow_lists([[[0, 0, 1, 1, 1, 0, 0, 1, 0, 0]]])
    ok = core.RingSet.from_arrow_lists([[rect_ring(0, 0, 1, 1)]])
    dup_vertex = core.RingSet.from_arrow_lists([[[0, 0, 1, 0, 1, 0, 1, 1, 0, 1, 0, 0]]])
    assert core.ring_self_intersects(bow).tolist() == [True]
    assert core.ring_self_intersects(ok).tolist() == [False]
    # duplicated vertex produces zero-length edge, not a crossing → kept


def test_polys_intersect_matrix():
    a = core.RingSet.from_arrow_lists([[rect_ring(0, 0, 2, 2)]])
    b = core.RingSet.from_arrow_lists(
        [
            [rect_ring(1, 1, 3, 3)],     # overlap
            [rect_ring(5, 5, 6, 6)],     # disjoint
            [rect_ring(0.5, 0.5, 1.5, 1.5)],  # contained
            [rect_ring(-1, -1, 4, 4)],   # contains
            [rect_ring(2, 0, 3, 1)],     # edge touch
        ]
    )
    got = core.polys_intersect_pairs(a, b, np.zeros(5, np.int64), np.arange(5))
    assert got.tolist() == [True, False, True, True, True]


def test_cells_roundtrip_and_parent():
    rng = np.random.default_rng(7)
    lon = rng.uniform(C.LON_W, C.LON_E, 1000)
    lat = rng.uniform(C.LAT_S, C.LAT_N, 1000)
    c9 = C.cell_of(lon, lat, 9)
    res, iy, ix = C.unpack(c9)
    assert (res == 9).all() and (ix < 512).all() and (iy < 512).all()
    c5 = C.parent(c9, 5)
    assert np.array_equal(c5, C.cell_of(lon, lat, 5))
    # cover cells of a cell's own bounds include the cell
    x0, y0, x1, y1 = C.cell_bounds(c9[:5])
    row, cov = C.cover_cells_bbox(x0 + 1e-9, y0 + 1e-9, x1 - 1e-9, y1 - 1e-9, 9)
    assert np.array_equal(cov, c9[:5]) and np.array_equal(row, np.arange(5))


def test_cover_cells_superset_of_point_cells():
    rng = np.random.default_rng(11)
    x0 = rng.uniform(C.LON_W, C.LON_E - 0.01, 100)
    y0 = rng.uniform(C.LAT_S, C.LAT_N - 0.01, 100)
    x1 = x0 + rng.uniform(0, 0.01, 100)
    y1 = y0 + rng.uniform(0, 0.01, 100)
    row, cov = C.cover_cells_bbox(x0, y0, x1, y1, 9)
    # random interior points of each bbox must land in a covered cell
    for i in range(100):
        fx = rng.uniform(0, 1, 8)
        fy = rng.uniform(0, 1, 8)
        pc = C.cell_of(x0[i] + fx * (x1[i] - x0[i]), y0[i] + fy * (y1[i] - y0[i]), 9)
        assert set(pc).issubset(set(cov[row == i]))


def test_kring():
    c = C.cell_of(np.array([-122.5]), np.array([45.4]), 9)
    ring = C.kring(c, 1)[0]
    ring = ring[ring >= 0]
    assert len(ring) == 9 and c[0] in ring
    _, iy, ix = C.unpack(ring)
    _, cy, cx = C.unpack(c)
    assert (np.abs(iy - cy[0]) <= 1).all() and (np.abs(ix - cx[0]) <= 1).all()
