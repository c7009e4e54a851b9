"""Per-cell kNN with k-ring candidate expansion (J10; the north_star's
near-boundary ambiguity resolver).

Re-expresses the reference's distance-ordered candidate scan
(tasks/metro_quarter_secs.rake:80-86) as:

1. every point gets its grid cell at ``res`` — one JVM arithmetic
   projection over the petabyte side, no explode, no Python;
2. the (small) candidate side explodes each centroid to all cells within
   Chebyshev distance ``k_ring`` — the k-ring lives on the SMALL side, so
   the fan-out is (2k+1)² × |candidates|, never × |points|;
3. equi-join on the point's single cell (broadcast when the exploded
   candidate side is small); nearest-only (top_k=1) resolves via a
   partial-aggregatable struct-min (map-side combine — no candidate
   pair ever shuffles), top_k>1 via a distance window; ties pinned by
   candidate id in both.

Semantics are ring-bounded: a point with no candidate inside its k-ring
produces no row. The guarantee making this a true nearest-neighbor: any
candidate OUTSIDE the ring is ≥ k_ring cell-edges away in x or y, so
whenever the found nearest lies within ``k_ring * min(edge_x, edge_y)``
it is provably the global nearest (property-tested vs brute force in
tests/test_knn.py, including points hugging cell boundaries — the case a
parcel equi-join gets wrong).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, Window as Wnd

from ..geo import cells as C
from .pip_join import tile_expr

RES_KNN = 5   # 32×32 grid: edge_x = 0.05°, edge_y = 0.0375°
K_RING = 2    # 5×5 ring → guarantee radius 2*min_edge = 0.075°

# Exploded candidate-ring rows (|candidates| × (2k+1)²) above which the
# ring side must NOT be broadcast: at 100× the candidate side for
# knn_unassigned is every footprint × 25 ring cells — billions of rows —
# and a forced broadcast OOMs driver and executors. Mirrors
# pip_join.broadcast_max_polys: small side → broadcast, else shuffle.
BROADCAST_MAX_RING_ROWS = 2_000_000


def ring_cells(
    cents: DataFrame,
    lon_col: str = "centroid_lon",
    lat_col: str = "centroid_lat",
    res: int = RES_KNN,
    k_ring: int = K_RING,
) -> DataFrame:
    """Explode each candidate to its k-ring cells (flat iy*n+ix keys,
    clipped to the grid). Pure JVM: tile arithmetic + two explodes."""
    n = 1 << res
    key = tile_expr(F.col(lon_col), F.col(lat_col), res)
    return (
        cents.withColumn("__fx", key % n)
        .withColumn("__fy", F.floor(key / n).cast("long"))
        .withColumn("__dx", F.explode(F.sequence(F.lit(-k_ring), F.lit(k_ring))))
        .withColumn("__dy", F.explode(F.sequence(F.lit(-k_ring), F.lit(k_ring))))
        .withColumn("__nx", F.col("__fx") + F.col("__dx"))
        .withColumn("__ny", F.col("__fy") + F.col("__dy"))
        .where(
            (F.col("__nx") >= 0) & (F.col("__nx") < n)
            & (F.col("__ny") >= 0) & (F.col("__ny") < n)
        )
        .withColumn("cell", F.col("__ny") * n + F.col("__nx"))
        .drop("__fx", "__fy", "__dx", "__dy", "__nx", "__ny")
    )


def knn_join(
    points: DataFrame,
    cents: DataFrame,
    point_id: str,
    cand_id: str,
    res: int = RES_KNN,
    k_ring: int = K_RING,
    top_k: int = 1,
    lon_col: str = "centroid_lon",
    lat_col: str = "centroid_lat",
    broadcast_max_ring_rows: int = BROADCAST_MAX_RING_ROWS,
    cands_count: int | None = None,
) -> DataFrame:
    """(point_id, cand_id, rn) for each point's ``top_k`` ring-nearest
    candidates by squared planar degree distance. ``points`` needs
    (point_id, lon, lat); ``cents`` needs (cand_id, lon_col, lat_col).

    Planner: when the exploded ring side (|cands| × (2k+1)²) fits under
    ``broadcast_max_ring_rows``, the ring is broadcast and the point side
    never shuffles before the distance window. Above the gate the join
    runs un-hinted — Catalyst/AQE shuffle both sides on ``cell`` (with
    skew-join splitting for hot point cells); the window's point_id
    exchange follows either way, so the shuffle path adds exactly one
    bounded exchange of the (already-bounded) ring side.
    ``cands_count`` may be passed (e.g. from a stage manifest) to skip
    the planning count of the candidate side."""
    ring = ring_cells(
        cents.select(cand_id, lon_col, lat_col), lon_col, lat_col, res, k_ring
    )
    pts = points.select(point_id, "lon", "lat").withColumn(
        "cell", tile_expr(F.col("lon"), F.col("lat"), res)
    )
    if cands_count is None:
        cands_count = cents.count()  # JVM-only count of the SMALL side
    ring_rows = cands_count * (2 * k_ring + 1) ** 2
    ring_side = F.broadcast(ring) if ring_rows <= broadcast_max_ring_rows else ring
    d2: Column = (F.col("lon") - F.col(lon_col)) ** 2 + (
        F.col("lat") - F.col(lat_col)
    ) ** 2
    joined = pts.join(ring_side, "cell")
    if top_k == 1:
        # Nearest-only (the north-star resolver's case) is a
        # partial-aggregatable MIN of (d2, cand_id) structs: the map-side
        # combine collapses each point's ≤(2k+1)²-candidate fan-in to ONE
        # row BEFORE the exchange. The window alternative shuffles AND
        # sorts every candidate pair on point_id — at 10^12 points that
        # is the dominant shuffle of the whole query. Struct comparison
        # is lexicographic by field order, so min(struct(d2, cand))
        # reproduces ORDER BY d2, cand_id exactly (tie pinned).
        # Struct agg buffers plan as SortAggregate (not hash), but the
        # partial agg still combines map-side; measured at 181M pairs,
        # local[32]: struct-min 2.9 s vs window 22.2 s vs
        # min(d2)-then-rejoin two-pass hash agg 34.4 s.
        best = (
            joined.groupBy(point_id)
            .agg(
                F.min(
                    F.struct(d2.alias("d2"), F.col(cand_id).alias("c"))
                ).alias("b")
            )
            .select(
                point_id,
                F.col("b.c").alias(cand_id),
                F.lit(1).alias("rn"),
            )
        )
        return best
    w = Wnd.partitionBy(point_id).orderBy(d2.asc(), F.col(cand_id).asc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select(point_id, cand_id, "rn")
    )


def dwithin_pairs(
    points: DataFrame,
    cents: DataFrame,
    radius_deg: float,
    point_id: str = "page_id",
    cand_id: str = "fp_id",
    res: int = RES_KNN,
    lon_col: str = "centroid_lon",
    lat_col: str = "centroid_lat",
    broadcast_max_ring_rows: int = BROADCAST_MAX_RING_ROWS,
    cands_count: int | None = None,
) -> DataFrame:
    """ST_DWithin as a cell-ring equi-join + exact refine: every
    (point, candidate) pair with planar squared-degree distance ≤
    radius². Returns (point_id, cand_id, d2) with d2 the exact double.

    Ring completeness: ``radius_deg`` must be < min(cell edge_x, edge_y)
    at ``res`` — then any qualifying candidate differs by at most one
    cell index per axis, so the 1-ring (9 cells) on the SMALL side
    provably covers every pair (asserted below; property-tested vs brute
    force in tests/test_spatial.py). Scale shape mirrors knn_join: the
    point side gets one arithmetic cell projection (never explodes);
    the 9× ring explode is on the candidate side, broadcast under the
    same row gate, shuffle-equi-join above it."""
    n = 1 << res
    edge = min(C.SPAN_X / n, C.SPAN_Y / n)
    if not radius_deg < edge:
        raise ValueError(
            f"radius {radius_deg} >= min cell edge {edge} at res {res}: "
            "the 1-ring would miss qualifying pairs; raise res or use a "
            "wider k_ring via knn_join-style expansion"
        )
    ring = ring_cells(
        cents.select(cand_id, lon_col, lat_col), lon_col, lat_col, res, 1
    )
    if cands_count is None:
        cands_count = cents.count()  # JVM-only count of the small side
    ring_side = (
        F.broadcast(ring)
        if cands_count * 9 <= broadcast_max_ring_rows
        else ring
    )
    pts = points.select(point_id, "lon", "lat").withColumn(
        "cell", tile_expr(F.col("lon"), F.col("lat"), res)
    )
    dlon = F.col("lon") - F.col(lon_col)
    dlat = F.col("lat") - F.col(lat_col)
    d2 = dlon * dlon + dlat * dlat
    return (
        pts.join(ring_side, "cell")
        .where(d2 <= F.lit(radius_deg) * F.lit(radius_deg))
        .select(point_id, cand_id, d2.alias("d2"))
    )
