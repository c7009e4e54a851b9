"""G2: ST_LineMerge-equivalent chain stitching (reference:
``array_agg(ST_LineMerge(geom))`` over relation member ways,
tasks/osm_buildings.rake:46 — OSM multipolygon outer rings arrive as
open way FRAGMENTS in arbitrary order and orientation and must be
stitched end-to-end before ``ST_MakePolygon``).

Endpoint matching is exact float equality: fragment endpoints that are
"the same node" in OSM are the same coordinate pair bit-for-bit (they
come from one node table), which also holds for the synth world (shared
corners are computed by identical SQL expressions). Greedy walk, like
PostGIS: at a junction shared by >2 fragments the walk stops (those
stay unmerged) — the multipolygon-building case never branches.

Pure-Python per relation: relation member lists are tiny (OSM caps
relations at ~2k members) and the caller parallelizes across relations
(groupBy relation_id → applyInPandas), so the kernel's job is
correctness, not throughput.
"""

from __future__ import annotations

import numpy as np


def _rev(flat: list) -> list:
    """Reverse a flat [x0,y0,x1,y1,...] polyline, keeping (x,y) pairs."""
    out = []
    for i in range(len(flat) - 2, -2, -2):
        out.extend(flat[i : i + 2])
    return out


def merge_chains(
    chains: list[np.ndarray],
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Stitch open polylines sharing endpoints into maximal chains.

    Returns ``(rings, opens)``: ``rings`` are closed (first pair ==
    last pair), ``opens`` are maximal chains that did not close.
    Already-closed inputs pass through to ``rings`` unchanged.
    Deterministic for a given input order (greedy first-unused match,
    forward then backward).
    """
    n = len(chains)
    flat = [list(map(float, c)) for c in chains]
    # endpoint -> fragment slots touching it ((idx, which_end))
    touch: dict[tuple[float, float], list[tuple[int, int]]] = {}
    closed_in = []
    open_idx = []
    for i, c in enumerate(flat):
        if (c[0], c[1]) == (c[-2], c[-1]):
            closed_in.append(i)
            continue
        open_idx.append(i)
        touch.setdefault((c[0], c[1]), []).append((i, 0))
        touch.setdefault((c[-2], c[-1]), []).append((i, 1))

    used = [False] * n
    rings = [np.asarray(flat[i]) for i in closed_in]
    opens: list[np.ndarray] = []

    def take(key: tuple[float, float]):
        slots = touch.get(key, [])
        if len(slots) > 2:  # branching junction: never merge through it
            return None
        for j, e in slots:
            if not used[j]:
                return j, e
        return None

    for i in open_idx:
        if used[i]:
            continue
        used[i] = True
        cur = list(flat[i])
        # forward: grow at the tail until closed or stuck
        while (cur[0], cur[1]) != (cur[-2], cur[-1]):
            nxt = take((cur[-2], cur[-1]))
            if nxt is None:
                break
            j, e = nxt
            used[j] = True
            seg = flat[j] if e == 0 else _rev(flat[j])
            cur.extend(seg[2:])
        if (cur[0], cur[1]) == (cur[-2], cur[-1]):
            rings.append(np.asarray(cur))
            continue
        # backward: grow at the head
        while (cur[0], cur[1]) != (cur[-2], cur[-1]):
            nxt = take((cur[0], cur[1]))
            if nxt is None:
                break
            j, e = nxt
            used[j] = True
            seg = flat[j] if e == 1 else _rev(flat[j])
            cur = seg[:-2] + cur
        (rings if (cur[0], cur[1]) == (cur[-2], cur[-1]) else opens).append(
            np.asarray(cur)
        )
    return rings, opens


def canon_ring(flat: np.ndarray) -> tuple:
    """Canonical form for ring comparison (tests): drop the closing
    duplicate, rotate so the lexicographically-smallest vertex leads,
    orient so the second vertex is the smaller of the two neighbors."""
    pts = [tuple(p) for p in np.asarray(flat).reshape(-1, 2)[:-1]]
    k = min(range(len(pts)), key=lambda i: pts[i])
    rot = pts[k:] + pts[:k]
    if len(rot) > 2 and rot[-1] < rot[1]:
        rot = [rot[0]] + rot[1:][::-1]
    return tuple(rot)
