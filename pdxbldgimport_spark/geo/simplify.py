"""G5: ST_SimplifyPreserveTopology-lite — Douglas-Peucker per ring with
collapse guards (reference applies `ST_SimplifyPreserveTopology(geom,
0.000001)` to every exported footprint, tasks/pdx_bldgs.rake:60 and
tasks/metro_bldgs.rake:24).

Guarantees (property-tested in tests/test_simplify.py):
- every surviving vertex is an original vertex; first vertex and ring
  closure are preserved;
- every dropped vertex lies within ``tol`` of the simplified outline;
- a ring never collapses below a triangle (falls back to the original
  ring when simplification would degenerate) — the "preserve topology"
  guard that plain ST_Simplify lacks.

Rings are few and small relative to the page table (polygon-side-only
pass, same cost class as geo.operators ingest enrichment); the per-ring
recursion is a numpy-stack loop, vectorized within each split.
"""

from __future__ import annotations

import numpy as np

from .core import RingSet


def _dp_keep(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask over an OPEN vertex chain (first & last
    always kept). Iterative stack, farthest-point split."""
    n = len(xs)
    keep = np.zeros(n, bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = slice(i + 1, j)
        dx, dy = xs[j] - xs[i], ys[j] - ys[i]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d = np.hypot(xs[seg] - xs[i], ys[seg] - ys[i])
        else:
            # distance to the segment (clamped projection)
            t = ((xs[seg] - xs[i]) * dx + (ys[seg] - ys[i]) * dy) / L2
            t = np.clip(t, 0.0, 1.0)
            d = np.hypot(xs[seg] - (xs[i] + t * dx), ys[seg] - (ys[i] + t * dy))
        k = int(np.argmax(d))
        if d[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_ring(flat: np.ndarray, tol: float) -> np.ndarray:
    """Simplify one closed ring (flat [x0,y0,...] with last == first).
    Splits the closed ring at vertex 0 and its farthest vertex so DP has
    two stable anchors; falls back to the input if the result would drop
    below a triangle (+closure)."""
    xs, ys = flat[0::2], flat[1::2]
    n = len(xs)
    if n <= 4:  # triangle + closure or smaller: nothing removable
        return flat
    d2 = (xs[:-1] - xs[0]) ** 2 + (ys[:-1] - ys[0]) ** 2
    far = int(np.argmax(d2))
    if far == 0:  # all vertices coincide
        return flat
    keep = np.zeros(n, bool)
    k1 = _dp_keep(xs[: far + 1], ys[: far + 1], tol)
    k2 = _dp_keep(xs[far:], ys[far:], tol)
    keep[: far + 1] |= k1
    keep[far:] |= k2
    if keep[:-1].sum() < 3:
        return flat
    out = np.column_stack([xs[keep], ys[keep]]).ravel()
    return out


def simplify_ringset(rs: RingSet, tol: float) -> list[list[np.ndarray]]:
    """Simplified rings grouped per polygon (same order as the input)."""
    out: list[list[np.ndarray]] = [[] for _ in range(rs.n_polys)]
    for r in range(len(rs.ring_poly)):
        s, e = rs.ring_offs[r], rs.ring_offs[r + 1]
        flat = np.empty(2 * (e - s))
        flat[0::2] = rs.xs[s:e]
        flat[1::2] = rs.ys[s:e]
        out[rs.ring_poly[r]].append(simplify_ring(flat, tol))
    return out


def densify_rings(flat: np.ndarray, k: int) -> np.ndarray:
    """Split every edge of a flat closed ring into ``k`` equal segments —
    manufactures collinear (redundant) vertices; simplify must remove
    exactly these. Inserted points are anchored on the original edges."""
    xs, ys = flat[0::2], flat[1::2]
    n = len(xs) - 1  # edges
    t = np.arange(k) / k
    nx = (xs[:-1, None] + (xs[1:, None] - xs[:-1, None]) * t).ravel()
    ny = (ys[:-1, None] + (ys[1:, None] - ys[:-1, None]) * t).ravel()
    nx = np.append(nx, xs[-1])
    ny = np.append(ny, ys[-1])
    return np.column_stack([nx, ny]).ravel()
