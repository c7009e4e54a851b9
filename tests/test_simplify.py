"""G5 simplify kernel: property tests (SURVEY.md §5 strategy)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pdxbldgimport_spark.geo.simplify import densify_rings, simplify_ring


def rect(x0, y0, x1, y1):
    return np.array([x0, y0, x1, y0, x1, y1, x0, y1, x0, y0], float)


def test_densify_then_simplify_recovers_corners():
    r = rect(0.0, 0.0, 2.0, 1.0)
    for k in (2, 3, 4, 7):
        dense = densify_rings(r, k)
        assert len(dense) == 2 * (4 * k + 1)
        out = simplify_ring(dense, 1e-9)
        assert np.array_equal(out, r)


def test_triangle_never_collapses():
    tri = np.array([0, 0, 1, 0, 0.5, 1e-12, 0, 0], float)
    out = simplify_ring(tri, 1.0)  # huge tolerance
    # must stay a valid ring (≥ 3 distinct + closure), not collapse
    assert len(out) >= 8
    assert out[0] == out[-2] and out[1] == out[-1]


def _seg_dist(px, py, x1, y1, x2, y2):
    dx, dy = x2 - x1, y2 - y1
    L2 = dx * dx + dy * dy
    if L2 == 0:
        return np.hypot(px - x1, py - y1)
    t = np.clip(((px - x1) * dx + (py - y1) * dy) / L2, 0, 1)
    return np.hypot(px - (x1 + t * dx), py - (y1 + t * dy))


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_simplify_properties_random_polygons(seed):
    """(a) output vertices ⊆ input vertices, closed, ≥ triangle;
    (b) every dropped vertex within tol of some kept edge;
    (c) idempotent: simplifying twice changes nothing."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 30))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.2, 1.0, n)
    xs = rad * np.cos(ang)
    ys = rad * np.sin(ang)
    ring = np.column_stack(
        [np.append(xs, xs[0]), np.append(ys, ys[0])]
    ).ravel()
    tol = float(rng.uniform(1e-6, 0.3))
    out = simplify_ring(ring, tol)

    # (a) closure + subset + triangle floor
    assert out[0] == out[-2] and out[1] == out[-1]
    in_set = {(ring[i], ring[i + 1]) for i in range(0, len(ring), 2)}
    ox, oy = out[0::2], out[1::2]
    assert all((x, y) in in_set for x, y in zip(ox, oy))
    assert len(ox) - 1 >= 3

    # (b) dropped vertices within tol of the simplified outline
    kept = set(zip(ox, oy))
    for i in range(0, len(ring) - 2, 2):
        p = (ring[i], ring[i + 1])
        if p in kept:
            continue
        d = min(
            _seg_dist(p[0], p[1], ox[j], oy[j], ox[j + 1], oy[j + 1])
            for j in range(len(ox) - 1)
        )
        assert d <= tol * (1 + 1e-9), (p, d, tol)

    # (c) idempotence
    again = simplify_ring(out, tol)
    assert np.array_equal(again, out)


def test_convex_simplify_stays_convex_ring():
    """DP on a convex ring cannot introduce self-intersections — the
    kept vertices remain in convex position/order."""
    ang = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    xs, ys = np.cos(ang), np.sin(ang)
    ring = np.column_stack([np.append(xs, xs[0]), np.append(ys, ys[0])]).ravel()
    out = simplify_ring(ring, 0.05)
    ox, oy = out[0::2], out[1::2]
    # cross products of consecutive edges all one sign (convex, simple)
    x1, y1 = ox[:-1], oy[:-1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    x3, y3 = np.roll(x1, -2), np.roll(y1, -2)
    cross = (x2 - x1) * (y3 - y2) - (y2 - y1) * (x3 - x2)
    assert (cross > 0).all() or (cross < 0).all()
