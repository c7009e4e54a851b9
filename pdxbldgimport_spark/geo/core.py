"""Vectorized geometry kernels over ragged coordinate arrays.

Implements the PostGIS operator surface the reference uses (SURVEY.md §2.8:
ST_Intersects, ST_Area, ST_Centroid/ST_PointOnSurface, ST_IsClosed,
ST_MakeValid-lite, ST_SimplifyPreserveTopology-lite) as pure-numpy batch
kernels. Everything here operates on the engine's canonical columnar
geometry layout:

    flat coords : float64[2*V]  — x,y interleaved vertex buffer
    ring_offs   : int64[R+1]    — ring r occupies vertices
                                  [ring_offs[r], ring_offs[r+1])
    ring_poly   : int64[R]      — polygon index of each ring (holes carry
                                  the same index; even-odd parity handles
                                  containment with holes for free)

Rings must be closed (last vertex == first vertex), matching the
reference's ``st_isclosed`` precondition (tasks/osm_buildings.rake:36).

No per-row Python anywhere: candidate-pair point-in-polygon expands
(pair, edge) combinations with repeat/cumsum arithmetic and reduces with
bincount — the same ragged-batch style shapely 2.x uses internally.
"""

from __future__ import annotations

import numpy as np

# Deterministic local projection for planar area/length (the reference uses
# EPSG:2913 "Oregon ft" for area, tasks/pdx_bldgs.rake:149; we pin an
# equirectangular projection at the extent's mid-latitude — one fixed,
# documented choice per SURVEY.md §1.2 CRS note).
FT_PER_DEG_LAT = 364567.2
_REF_LAT_RAD = np.deg2rad(45.4)
FT_PER_DEG_LON = FT_PER_DEG_LAT * float(np.cos(_REF_LAT_RAD))
M_PER_FT = 0.3048


class RingSet:
    """Ragged batch of rings grouped into polygons."""

    __slots__ = ("xs", "ys", "ring_offs", "ring_poly", "n_polys")

    def __init__(self, xs, ys, ring_offs, ring_poly, n_polys=None):
        self.xs = np.asarray(xs, np.float64)
        self.ys = np.asarray(ys, np.float64)
        self.ring_offs = np.asarray(ring_offs, np.int64)
        self.ring_poly = np.asarray(ring_poly, np.int64)
        self.n_polys = int(n_polys if n_polys is not None else (self.ring_poly.max() + 1 if len(self.ring_poly) else 0))

    @classmethod
    def from_arrow_lists(cls, rings_col) -> "RingSet":
        """Build from a pandas Series / list where each element is a list of
        rings, each ring a flat [x0,y0,x1,y1,...] array (the Spark column
        type array<array<double>>). One numpy concatenate — no per-vertex
        Python."""
        ring_lists = list(rings_col)  # O(n_polys) object refs only
        ring_poly = []
        flats = []
        for i, rings in enumerate(ring_lists):
            for r in rings:
                flats.append(np.asarray(r, np.float64))
                ring_poly.append(i)
        if not flats:
            return cls(np.empty(0), np.empty(0), np.zeros(1, np.int64), np.empty(0, np.int64), len(ring_lists))
        lens = np.fromiter((len(f) // 2 for f in flats), np.int64, len(flats))
        flat = np.concatenate(flats)
        xs = flat[0::2]
        ys = flat[1::2]
        offs = np.concatenate(([0], np.cumsum(lens)))
        return cls(xs, ys, offs, np.asarray(ring_poly, np.int64), len(ring_lists))

    # ---- derived edge arrays (cached lazily by callers if needed) ----
    def edges(self):
        """(ex1, ey1, ex2, ey2, edge_poly) for all ring edges."""
        R = len(self.ring_poly)
        nvert = np.diff(self.ring_offs)
        nedge = np.maximum(nvert - 1, 0)
        total = int(nedge.sum())
        ring_of_edge = np.repeat(np.arange(R, dtype=np.int64), nedge)
        starts = self.ring_offs[:-1]
        first = np.concatenate(([0], np.cumsum(nedge)[:-1]))
        local = np.arange(total, dtype=np.int64) - first[ring_of_edge]
        i1 = starts[ring_of_edge] + local
        i2 = i1 + 1
        return self.xs[i1], self.ys[i1], self.xs[i2], self.ys[i2], self.ring_poly[ring_of_edge]


def _poly_edge_ranges(edge_poly: np.ndarray, n_polys: int):
    """edge_poly must be sorted (rings grouped by poly). Returns
    (start, count) per polygon."""
    counts = np.bincount(edge_poly, minlength=n_polys).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return starts, counts


def points_in_polygons_pairs(
    px: np.ndarray, py: np.ndarray, rs: RingSet, pair_pt: np.ndarray, pair_poly: np.ndarray
) -> np.ndarray:
    """Even-odd ray-cast PIP for candidate pairs.

    ``pair_pt[i]`` indexes into px/py; ``pair_poly[i]`` into rs's polygons.
    Returns bool[len(pairs)]. This is the exact-refine stage of the
    cell-bucketed spatial join (reference ST_Intersects(poly, point),
    e.g. tasks/pdx_multi_addrs.rake:41, tasks/pdx_bldgs.rake:143).
    """
    ex1, ey1, ex2, ey2, edge_poly = rs.edges()
    starts, counts = _poly_edge_ranges(edge_poly, rs.n_polys)
    pair_pt = np.asarray(pair_pt, np.int64)
    pair_poly = np.asarray(pair_poly, np.int64)
    ecnt = counts[pair_poly]
    total = int(ecnt.sum())
    if total == 0:
        return np.zeros(len(pair_pt), bool)
    pair_rep = np.repeat(np.arange(len(pair_pt), dtype=np.int64), ecnt)
    first = np.concatenate(([0], np.cumsum(ecnt)[:-1]))
    local = np.arange(total, dtype=np.int64) - first[pair_rep]
    eidx = starts[pair_poly][pair_rep] + local
    x1, y1, x2, y2 = ex1[eidx], ey1[eidx], ex2[eidx], ey2[eidx]
    qx = np.asarray(px, np.float64)[pair_pt][pair_rep]
    qy = np.asarray(py, np.float64)[pair_pt][pair_rep]
    spans = (y1 > qy) != (y2 > qy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (x2 - x1) * (qy - y1) / (y2 - y1)
    crossing = spans & (qx < xint)
    hits = np.bincount(pair_rep, weights=crossing.astype(np.float64), minlength=len(pair_pt))
    return (hits.astype(np.int64) & 1).astype(bool)


def ring_signed_area(rs: RingSet) -> np.ndarray:
    """Shoelace signed area per ring (degree² units)."""
    ex1, ey1, ex2, ey2, edge_poly = rs.edges()
    cross = ex1 * ey2 - ex2 * ey1
    # sum per ring
    nedge = np.maximum(np.diff(rs.ring_offs) - 1, 0)
    ring_of_edge = np.repeat(np.arange(len(rs.ring_poly), dtype=np.int64), nedge)
    s = np.bincount(ring_of_edge, weights=cross, minlength=len(rs.ring_poly))
    return s / 2.0


def poly_area(rs: RingSet, projected_ft: bool = True) -> np.ndarray:
    """Polygon area; holes (opposite orientation) subtract naturally.
    ``projected_ft=True`` → square feet via the pinned equirectangular
    projection (reference ST_Area(ST_Transform(geom, 2913)),
    tasks/pdx_bldgs.rake:149)."""
    s = np.abs(ring_signed_area(rs))
    # first ring of each polygon is the outer shell, later rings are holes
    # (orientation-independent convention, unlike raw shoelace summing)
    is_first = np.ones(len(rs.ring_poly), bool)
    is_first[1:] = rs.ring_poly[1:] != rs.ring_poly[:-1]
    signed = np.where(is_first, s, -s)
    per_poly = np.abs(np.bincount(rs.ring_poly, weights=signed, minlength=rs.n_polys))
    if projected_ft:
        per_poly = per_poly * (FT_PER_DEG_LON * FT_PER_DEG_LAT)
    return per_poly


def poly_centroid(rs: RingSet) -> tuple[np.ndarray, np.ndarray]:
    """Area-weighted centroid per polygon (ST_Centroid)."""
    ex1, ey1, ex2, ey2, edge_poly = rs.edges()
    cross = ex1 * ey2 - ex2 * ey1
    cx = np.bincount(edge_poly, weights=(ex1 + ex2) * cross, minlength=rs.n_polys)
    cy = np.bincount(edge_poly, weights=(ey1 + ey2) * cross, minlength=rs.n_polys)
    a2 = np.bincount(edge_poly, weights=cross, minlength=rs.n_polys)  # 2A signed
    with np.errstate(divide="ignore", invalid="ignore"):
        gx = cx / (3.0 * a2)
        gy = cy / (3.0 * a2)
    # degenerate (zero-area): fall back to vertex mean
    bad = ~np.isfinite(gx) | ~np.isfinite(gy)
    if bad.any():
        vp = np.repeat(rs.ring_poly, np.diff(rs.ring_offs))
        n = np.bincount(vp, minlength=rs.n_polys).astype(np.float64)
        mx = np.bincount(vp, weights=rs.xs, minlength=rs.n_polys) / np.maximum(n, 1)
        my = np.bincount(vp, weights=rs.ys, minlength=rs.n_polys) / np.maximum(n, 1)
        gx = np.where(bad, mx, gx)
        gy = np.where(bad, my, gy)
    return gx, gy


def point_on_surface(rs: RingSet) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic interior point per polygon (ST_PointOnSurface,
    reference tasks/pdx_multi_addrs.rake:67; `add_centroids` helper).

    Centroid if interior; else midpoint of the leftmost interior interval
    of the horizontal scanline through the centroid's y."""
    gx, gy = poly_centroid(rs)
    idx = np.arange(rs.n_polys, dtype=np.int64)
    inside = points_in_polygons_pairs(gx, gy, rs, idx, idx)
    if inside.all():
        return gx, gy
    ex1, ey1, ex2, ey2, edge_poly = rs.edges()
    qy = gy[edge_poly]
    spans = (ey1 > qy) != (ey2 > qy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = ex1 + (ex2 - ex1) * (qy - ey1) / (ey2 - ey1)
    sel = spans & np.isfinite(xint)
    cp = edge_poly[sel]
    cx = xint[sel]
    order = np.lexsort((cx, cp))
    cp, cx = cp[order], cx[order]
    # first two crossings per polygon → leftmost interval
    firsts = np.searchsorted(cp, np.arange(rs.n_polys))
    counts = np.bincount(cp, minlength=rs.n_polys)
    ok = (~inside) & (counts >= 2)
    mid = gx.copy()
    mid[ok] = (cx[firsts[ok]] + cx[firsts[ok] + 1]) / 2.0
    gx = np.where(inside, gx, mid)
    return gx, gy


def poly_bbox(rs: RingSet) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    vp = np.repeat(rs.ring_poly, np.diff(rs.ring_offs))
    big = np.full(rs.n_polys, np.inf)
    x0 = np.minimum.reduceat(rs.xs, rs.ring_offs[:-1]) if len(rs.xs) else big
    # reduceat is per-ring; fold rings into polys with minimum.at
    x0p = np.full(rs.n_polys, np.inf)
    y0p = np.full(rs.n_polys, np.inf)
    x1p = np.full(rs.n_polys, -np.inf)
    y1p = np.full(rs.n_polys, -np.inf)
    np.minimum.at(x0p, vp, rs.xs)
    np.minimum.at(y0p, vp, rs.ys)
    np.maximum.at(x1p, vp, rs.xs)
    np.maximum.at(y1p, vp, rs.ys)
    return x0p, y0p, x1p, y1p


def _seg_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> np.ndarray:
    """Proper + touching segment intersection, vectorized (orientation
    tests). Collinear overlaps count as intersecting."""

    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    # collinear / touching: any orientation zero and bbox overlap
    def on(dx, px1, py1, px2, py2, qx, qy):
        return (dx == 0) & (np.minimum(px1, px2) <= qx) & (qx <= np.maximum(px1, px2)) & (
            np.minimum(py1, py2) <= qy
        ) & (qy <= np.maximum(py1, py2))

    touch = (
        on(d1, bx1, by1, bx2, by2, ax1, ay1)
        | on(d2, bx1, by1, bx2, by2, ax2, ay2)
        | on(d3, ax1, ay1, ax2, ay2, bx1, by1)
        | on(d4, ax1, ay1, ax2, ay2, bx2, by2)
    )
    return proper | touch


def polys_intersect_pairs(
    rs_a: RingSet, rs_b: RingSet, pair_a: np.ndarray, pair_b: np.ndarray
) -> np.ndarray:
    """ST_Intersects(polyA, polyB) for candidate pairs (reference J5
    footprint-dedup joins, tasks/metro_bldgs.rake:51-69,
    update_database.sql:160-166). True iff any edges cross/touch, or one
    contains the other (tested via first-vertex containment)."""
    pair_a = np.asarray(pair_a, np.int64)
    pair_b = np.asarray(pair_b, np.int64)
    out = np.zeros(len(pair_a), bool)

    # containment either way via first vertices
    fa = rs_a.ring_offs[:-1][np.searchsorted(rs_a.ring_poly, np.arange(rs_a.n_polys))]
    fb = rs_b.ring_offs[:-1][np.searchsorted(rs_b.ring_poly, np.arange(rs_b.n_polys))]
    out |= points_in_polygons_pairs(rs_a.xs[fa], rs_a.ys[fa], rs_b, pair_a, pair_b)
    out |= points_in_polygons_pairs(rs_b.xs[fb], rs_b.ys[fb], rs_a, pair_b, pair_a)

    todo = ~out
    if not todo.any():
        return out
    # edge × edge expansion for remaining pairs
    aex1, aey1, aex2, aey2, aep = rs_a.edges()
    bex1, bey1, bex2, bey2, bep = rs_b.edges()
    asta, acnt = _poly_edge_ranges(aep, rs_a.n_polys)
    bsta, bcnt = _poly_edge_ranges(bep, rs_b.n_polys)
    ti = np.flatnonzero(todo)
    pa, pb = pair_a[ti], pair_b[ti]
    na, nb = acnt[pa], bcnt[pb]
    combos = na * nb
    total = int(combos.sum())
    if total:
        rep = np.repeat(np.arange(len(ti), dtype=np.int64), combos)
        first = np.concatenate(([0], np.cumsum(combos)[:-1]))
        local = np.arange(total, dtype=np.int64) - first[rep]
        ia = asta[pa][rep] + local // nb[rep]
        ib = bsta[pb][rep] + local % nb[rep]
        hit = _seg_intersect(
            aex1[ia], aey1[ia], aex2[ia], aey2[ia], bex1[ib], bey1[ib], bex2[ib], bey2[ib]
        )
        any_hit = np.bincount(rep, weights=hit.astype(np.float64), minlength=len(ti)) > 0
        out[ti] |= any_hit
    return out


def rings_closed(rs: RingSet) -> np.ndarray:
    """st_isclosed per ring (reference tasks/osm_buildings.rake:36)."""
    s = rs.ring_offs[:-1]
    e = rs.ring_offs[1:] - 1
    nonempty = e > s
    return nonempty & (rs.xs[s] == rs.xs[e]) & (rs.ys[s] == rs.ys[e])


def ring_self_intersects(rs: RingSet) -> np.ndarray:
    """Per-ring validity probe: any non-adjacent edge pair crossing
    (the ST_IsValid analog; reference repair rule drops geometries whose
    ST_MakeValid yields a MultiPolygon, tasks/pdx_shapes.rake:115-131.
    A single-crossing 'bowtie' ring is exactly that case)."""
    R = len(rs.ring_poly)
    out = np.zeros(R, bool)
    ex1, ey1, ex2, ey2, _ = rs.edges()
    nedge = np.maximum(np.diff(rs.ring_offs) - 1, 0)
    estart = np.concatenate(([0], np.cumsum(nedge)[:-1]))
    for r in range(R):  # rings are few per batch; combos vectorized inside
        n = int(nedge[r])
        if n < 4:
            continue
        s = int(estart[r])
        i, j = np.triu_indices(n, k=2)
        # exclude wrap-adjacent pair (first, last)
        keep = ~((i == 0) & (j == n - 1))
        i, j = i[keep] + s, j[keep] + s
        if len(i) and _seg_intersect(
            ex1[i], ey1[i], ex2[i], ey2[i], ex1[j], ey1[j], ex2[j], ey2[j]
        ).any():
            out[r] = True
    return out


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle metres (ST_Distance analog for kNN, J10)."""
    rlat1, rlat2 = np.deg2rad(lat1), np.deg2rad(lat2)
    dlat = rlat2 - rlat1
    dlon = np.deg2rad(np.asarray(lon2) - np.asarray(lon1))
    a = np.sin(dlat / 2) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2) ** 2
    return 2 * 6371008.8 * np.arcsin(np.sqrt(a))
