"""Hierarchical Z-order cell index over the working extent.

Plays the role of H3/S2 in the north_rule and of the reference's GiST
spatial indexes (reference add_spatial_index sites, e.g.
tasks/pdx_bldgs.rake:120-121, tasks/pdx_addrs.rake:23): every spatial join
becomes an equi-join on cell ids.

Design
------
The working extent is the reference's osmosis clip bbox
(tasks/osm_load.rake:13-17): w=-123.3 s=44.8 e=-121.7 n=46.0. A cell at
resolution ``res`` is one square of the 2^res × 2^res grid over the extent.
Cell ids pack ``(res, iy, ix)`` into one int64::

    cell = (res << 56) | (iy << 28) | ix          (ix, iy < 2^28)

so parent/child moves are shifts, same as H3's resolution ladder. All
functions are vectorized numpy over arrays — no per-row Python.

Resolution guidance (recorded per north_rule "cell cover resolution
picker"): at res r the cell edge is (1.6/2^r) degrees lon ≈ 125km/2^r.
Footprint-scale joins use RES_JOIN; coarse tiling / Iceberg partitioning
uses RES_TILE (the reference's quarter-section tiles,
tasks/metro_quarter_secs.rake:2-4, map to RES_TILE parents).
"""

from __future__ import annotations

import numpy as np

# Working extent = reference clip bbox, tasks/osm_load.rake:13-17.
LON_W = -123.3
LAT_S = 44.8
LON_E = -121.7
LAT_N = 46.0
SPAN_X = LON_E - LON_W
SPAN_Y = LAT_N - LAT_S

RES_TILE = 5  # 32×32 tiles over the extent (~842 consolidated tiles in ref)
RES_JOIN = 9  # 512×512 cells; edge ≈ 0.003° ≈ 245 m — footprint scale


def res_for_polygons(mean_dx: float, mean_dy: float, target_cells: float = 6.0) -> int:
    """Cover-resolution picker (north_rule): the res where an average
    ``mean_dx × mean_dy``-degree polygon covers ~``target_cells`` cells.
    RES_JOIN is right for footprint-scale geometry; big polygons
    (taxlots, districts) at RES_JOIN each cover hundreds of cells —
    cover size, broadcast size, and join fan-in all scale with it, so
    the picker keeps cells-per-polygon bounded instead."""
    import math

    dx = max(mean_dx, 1e-12)
    dy = max(mean_dy, 1e-12)
    r = 0.5 * math.log2(target_cells * (SPAN_X * SPAN_Y) / (dx * dy))
    return max(3, min(RES_JOIN, int(r)))

_RES_SHIFT = 56
_Y_SHIFT = 28
_XY_MASK = (1 << 28) - 1


def _grid_index(vals: np.ndarray, lo: float, span: float, res: int) -> np.ndarray:
    n = 1 << res
    idx = np.floor((np.asarray(vals, dtype=np.float64) - lo) / span * n).astype(np.int64)
    return np.clip(idx, 0, n - 1)


def cell_of(lon: np.ndarray, lat: np.ndarray, res: int = RES_JOIN) -> np.ndarray:
    """Point → cell id at ``res``. Vectorized."""
    ix = _grid_index(lon, LON_W, SPAN_X, res)
    iy = _grid_index(lat, LAT_S, SPAN_Y, res)
    return pack(res, iy, ix)


def pack(res: int, iy: np.ndarray, ix: np.ndarray) -> np.ndarray:
    return (np.int64(res) << _RES_SHIFT) | (np.asarray(iy, np.int64) << _Y_SHIFT) | np.asarray(ix, np.int64)


def unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, np.int64)
    return cell >> _RES_SHIFT, (cell >> _Y_SHIFT) & _XY_MASK, cell & _XY_MASK


def parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarsen cells to ``parent_res`` (must be ≤ the cells' res)."""
    res, iy, ix = unpack(cell)
    shift = res - parent_res  # per-element
    return pack(parent_res, iy >> shift, ix >> shift)


def kring(cell: np.ndarray, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (incl. self), clipped to the
    grid. Returns shape (n, (2k+1)^2) with -1 for out-of-grid slots.
    Used for kNN candidate expansion (reference J10 distance scan,
    tasks/metro_quarter_secs.rake:80-86) and near-boundary ambiguity."""
    res, iy, ix = unpack(np.atleast_1d(cell))
    n = 1 << int(res[0])
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dy, dx = np.meshgrid(offs, offs, indexing="ij")
    ny = iy[:, None] + dy.ravel()[None, :]
    nx = ix[:, None] + dx.ravel()[None, :]
    ok = (ny >= 0) & (ny < n) & (nx >= 0) & (nx < n)
    out = pack(int(res[0]), np.where(ok, ny, 0), np.where(ok, nx, 0))
    return np.where(ok, out, np.int64(-1))


def cover_cells_bbox(
    x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray, res: int = RES_JOIN
) -> tuple[np.ndarray, np.ndarray]:
    """Cells covering each bbox (conservative cover — exact refine follows
    in the PIP kernel, so a superset is always safe).

    Returns (row_index, cell) flat pairs: row_index[i] says which input
    bbox produced cell[i]. Fully vectorized via repeat/cumsum arithmetic.
    """
    ix0 = _grid_index(x0, LON_W, SPAN_X, res)
    ix1 = _grid_index(x1, LON_W, SPAN_X, res)
    iy0 = _grid_index(y0, LAT_S, SPAN_Y, res)
    iy1 = _grid_index(y1, LAT_S, SPAN_Y, res)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # local flat offset 0..counts[row]-1 within each bbox
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - starts[row]
    lx = local % nx[row]
    ly = local // nx[row]
    return row, pack(res, iy0[row] + ly, ix0[row] + lx)


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x0, y0, x1, y1) of each cell."""
    res, iy, ix = unpack(cell)
    n = (1 << res).astype(np.float64)
    w = SPAN_X / n
    h = SPAN_Y / n
    x0 = LON_W + ix * w
    y0 = LAT_S + iy * h
    return x0, y0, x0 + w, y0 + h


def tile_key(cell_or_lon, lat=None, res: int = RES_TILE) -> np.ndarray:
    """Human-readable-ish tile key iy*2^res + ix (matches the oracle SQL's
    arithmetic tiling: floor((lat-S)/SPAN_Y*2^res)*2^res + floor(...))."""
    if lat is None:
        r, iy, ix = unpack(cell_or_lon)
        shift = r - res
        return (iy >> shift) * np.int64(1 << res) + (ix >> shift)
    ix = _grid_index(cell_or_lon, LON_W, SPAN_X, res)
    iy = _grid_index(lat, LAT_S, SPAN_Y, res)
    return iy * np.int64(1 << res) + ix
