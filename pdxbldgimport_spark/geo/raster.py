"""Raster↔vector kernels (north_star "raster↔vector tiler", and the
vector half of G10's tile dissolve): a footprint set RASTERIZES to its
cell cover (geo.cells.cover_cells_bbox — the same index every spatial
join uses), and a tile's covered-cell set VECTORIZES back into the
dissolved rectilinear outline — closed rings, outer CCW, holes CW.

Determinism: edges are emitted interior-on-left; at a pinch vertex
(two cells touching only diagonally) the walk takes the sharpest left
turn, which keeps each ring simple and the decomposition unique; ring
walk order is pinned by lexicographic start-edge choice.

The vectorized outline is self-certifying against the raster set:
signed shoelace area of the rings (outer positive, holes negative)
equals the cell count exactly (integer cell units), and the total ring
perimeter equals the raster boundary-edge count (4·n − 2·adjacent
pairs) — the oracle recomputes both from set algebra in SQL while the
engine derives them from the traced VECTOR rings, so a wrong trace
cannot pass the gate.
"""

from __future__ import annotations

import numpy as np

# directions: 0=E 1=N 2=W 3=S; dir_vec[d] = (dx, dy)
_DIR = ((1, 0), (0, 1), (-1, 0), (0, -1))


def boundary_edges(cells: set) -> dict:
    """Directed boundary unit edges of a union of unit cells, interior
    on the LEFT: vertex -> list of (next_vertex, direction)."""
    out: dict = {}

    def add(a, b, d):
        out.setdefault(a, []).append((b, d))

    for (x, y) in cells:
        if (x, y - 1) not in cells:  # bottom: walk east
            add((x, y), (x + 1, y), 0)
        if (x + 1, y) not in cells:  # right: walk north
            add((x + 1, y), (x + 1, y + 1), 1)
        if (x, y + 1) not in cells:  # top: walk west
            add((x + 1, y + 1), (x, y + 1), 2)
        if (x - 1, y) not in cells:  # left: walk south
            add((x, y + 1), (x, y), 3)
    return out


def trace_cells(ix: np.ndarray, iy: np.ndarray) -> list[np.ndarray]:
    """Vectorize a cell set into closed rectilinear rings (flat
    [x0,y0,...,x0,y0] arrays in cell units, collinear runs merged).
    Outer rings come out CCW (positive shoelace), holes CW."""
    cells = set(zip(ix.tolist(), iy.tolist()))
    edges = boundary_edges(cells)
    # consume edges deterministically: smallest (vertex, dir) first
    starts = sorted(edges)
    rings: list[np.ndarray] = []
    for s in starts:
        while edges.get(s):
            # begin a ring at s with its smallest-direction edge
            edges[s].sort(key=lambda e: e[1])
            (nxt, d) = edges[s].pop(0)
            ring = [s, nxt]
            cur, cur_d = nxt, d
            while cur != s:
                cands = edges.get(cur, [])
                # sharpest LEFT turn first: (d - cur_d + 1) % 4 ranks
                # left(1)→straight(0)→right(3); interior stays left
                cands.sort(key=lambda e: ((cur_d - e[1] + 1) % 4))
                nxt, d = cands.pop(0)
                ring.append(nxt)
                cur, cur_d = nxt, d
            # merge collinear runs
            pts = ring  # closed: first == last
            merged = [pts[0]]
            for i in range(1, len(pts) - 1):
                ax, ay = merged[-1]
                bx, by = pts[i]
                cx, cy = pts[i + 1]
                if (bx - ax) * (cy - by) - (by - ay) * (cx - bx) != 0 or (
                    (bx - ax) * (cx - bx) + (by - ay) * (cy - by) < 0
                ):
                    merged.append(pts[i])
            merged.append(pts[-1])
            rings.append(np.asarray(merged, dtype=np.float64).ravel())
    return rings


def ring_stats(rings: list[np.ndarray]) -> tuple[int, int, int]:
    """(signed_area_cells, perimeter_units, n_rings) of a traced set —
    derived purely from the VECTOR rings (see module docstring)."""
    area = 0.0
    perim = 0.0
    for r in rings:
        xs, ys = r[0::2], r[1::2]
        area += 0.5 * float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
        perim += float(np.sum(np.abs(xs[1:] - xs[:-1]) + np.abs(ys[1:] - ys[:-1])))
    return int(round(area)), int(round(perim)), len(rings)
