"""Cell-bucketed point-in-polygon join — the engine's core spatial operator.

Re-expresses every ``ST_Intersects(polygon, point)`` join in the reference
(J4 in SURVEY.md §2.3: tasks/pdx_multi_addrs.rake:41,
tasks/pdx_bldgs.rake:139-144, tasks/metro_output.rake:41,
tasks/metro_quarter_secs.rake:19-27, tasks/clark_shapes.rake:16-163) as:

1. **index**: points get a cell id at RES (pure JVM column arithmetic —
   the petabyte side of the join never crosses into Python here);
   polygons explode to their conservative cover cells (numpy kernel,
   one Arrow batch pass over the — much smaller — polygon side).
2. **bucket join**: equi-join on cell. Planner picks:
   - *broadcast* when the exploded polygon side is small (collect to the
     executors, zero shuffle of the point side — the common case when
     footprint tables are ≪ page tables), else
   - *shuffle* with **hot-cell salting**: cells whose point count exceeds
     a threshold get the point side split across ``n_salt`` sub-keys and
     the polygon side replicated, bounding any single task's input (the
     north_rule's explicit skew handling; AQE skew-join still applies on
     top for residual imbalance).
3. **refine**: exact vectorized ray-cast PIP per candidate pair
   (Arrow pandas UDF over the joined batch; polygon rings are factorized
   per batch so each polygon's geometry is parsed once per batch).

A point lies in exactly one cell, so candidate pairs are unique — no
post-join dedup is needed (unlike generic polygon×polygon cell joins).

At 100 TB: the point side is scanned once, filtered/projected at the
parquet reader (only id+lon+lat+cell survive the scan), and either
(a) never shuffled (broadcast path) or (b) shuffled once on a salted,
bounded-skew key. Polygon cover rows scale with polygon count ×
cells-per-polygon, which the resolution picker keeps bounded.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..geo import cells as C
from ..geo.core import RingSet, points_in_polygons_pairs

# Exploded polygon-side row count below which we broadcast.
BROADCAST_MAX_ROWS = 2_000_000
# Points per (cell) above which the shuffle path salts that cell.
HOT_CELL_POINTS = 200_000
N_SALT = 16


def cell_expr(lon: Column, lat: Column, res: int) -> Column:
    """Point cell id as a pure JVM column expression (bit-identical to
    geo.cells.cell_of: same IEEE op order)."""
    n = 1 << res
    ix = F.floor((lon - F.lit(C.LON_W)) / F.lit(C.SPAN_X) * F.lit(float(n)))
    iy = F.floor((lat - F.lit(C.LAT_S)) / F.lit(C.SPAN_Y) * F.lit(float(n)))
    ix = F.greatest(F.lit(0), F.least(F.lit(n - 1), ix)).cast("long")
    iy = F.greatest(F.lit(0), F.least(F.lit(n - 1), iy)).cast("long")
    return (
        F.lit(res).cast("long") * F.lit(1 << 56)
        + F.shiftleft(iy, 28)
        + ix
    )


def tile_expr(lon: Column, lat: Column, res: int = C.RES_TILE) -> Column:
    """Flat tile key iy*2^res+ix (the quarter-section analog,
    tasks/metro_quarter_secs.rake:2-4). Oracle-SQL-expressible."""
    n = 1 << res
    ix = F.floor((lon - F.lit(C.LON_W)) / F.lit(C.SPAN_X) * F.lit(float(n)))
    iy = F.floor((lat - F.lit(C.LAT_S)) / F.lit(C.SPAN_Y) * F.lit(float(n)))
    ix = F.greatest(F.lit(0), F.least(F.lit(n - 1), ix)).cast("long")
    iy = F.greatest(F.lit(0), F.least(F.lit(n - 1), iy)).cast("long")
    return iy * F.lit(n) + ix


def polygon_cover_cells(polys: DataFrame, poly_id: str, rings_col: str = "rings", res: int = C.RES_JOIN) -> DataFrame:
    """Explode polygons to (poly_id, cell, rings). Conservative bbox cover
    (exact refine follows). One Arrow pass over the polygon side; rings are
    carried through directly so no join-back shuffle is needed."""
    out_schema = T.StructType(
        [
            T.StructField(poly_id, T.LongType()),
            T.StructField("cell", T.LongType()),
            T.StructField(rings_col, T.ArrayType(T.ArrayType(T.DoubleType()))),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rs = RingSet.from_arrow_lists(pdf[rings_col])
            from ..geo.core import poly_bbox

            x0, y0, x1, y1 = poly_bbox(rs)
            row, cell = C.cover_cells_bbox(x0, y0, x1, y1, res)
            yield pd.DataFrame(
                {
                    poly_id: pdf[poly_id].to_numpy()[row],
                    "cell": cell,
                    rings_col: pdf[rings_col].to_numpy()[row],
                }
            )

    return polys.select(F.col(poly_id), F.col(rings_col)).mapInPandas(gen, out_schema)


def _refine_pip(joined: DataFrame, point_id: str, poly_id: str, rings_col: str = "rings") -> DataFrame:
    """Exact ray-cast refine over candidate pairs. Keeps only true hits."""
    schema = T.StructType(
        [
            T.StructField(point_id, T.LongType()),
            T.StructField(poly_id, T.LongType()),
        ]
    )

    def refine(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            # factorize polys so each polygon's rings are parsed once
            codes, uniques = pd.factorize(pdf[poly_id])
            first_rows = pd.Series(np.arange(len(pdf))).groupby(codes).min().to_numpy()
            rs = RingSet.from_arrow_lists(pdf[rings_col].iloc[first_rows])
            n = len(pdf)
            inside = points_in_polygons_pairs(
                pdf["lon"].to_numpy(),
                pdf["lat"].to_numpy(),
                rs,
                np.arange(n, dtype=np.int64),
                codes.astype(np.int64),
            )
            yield pd.DataFrame(
                {
                    point_id: pdf[point_id].to_numpy()[inside],
                    poly_id: pdf[poly_id].to_numpy()[inside],
                }
            )

    return joined.mapInPandas(refine, schema)


def pip_join(
    points: DataFrame,
    polys: DataFrame,
    point_id: str,
    poly_id: str,
    rings_col: str = "rings",
    res: int = C.RES_JOIN,
    broadcast_max_polys: int = 100_000,
    hot_cell_points: int = HOT_CELL_POINTS,
    n_salt: int = N_SALT,
    polys_count: int | None = None,
) -> DataFrame:
    """Spatial inner join: (point_id, poly_id) for each point inside a
    polygon. ``points`` needs (point_id, lon, lat); ``polys`` needs
    (poly_id, rings). ``polys_count`` may be passed to skip the planning
    count (e.g. from a stage manifest)."""
    pts = points.select(point_id, "lon", "lat").withColumn(
        "cell", cell_expr(F.col("lon"), F.col("lat"), res)
    )
    cover = polygon_cover_cells(polys, poly_id, rings_col, res)

    if polys_count is None:
        polys_count = polys.count()  # JVM-only count on the small side
    if polys_count <= broadcast_max_polys:
        joined = pts.join(F.broadcast(cover), "cell")
        return _refine_pip(joined, point_id, poly_id, rings_col)

    # shuffle path with explicit hot-cell salting
    hot = (
        pts.groupBy("cell")
        .count()
        .filter(F.col("count") > hot_cell_points)
        .select("cell")
    )
    hot_set = {r["cell"] for r in hot.collect()}
    if hot_set:
        hot_lit = F.col("cell").isin(list(hot_set))
        pts = pts.withColumn(
            "salt",
            F.when(hot_lit, F.pmod(F.xxhash64(F.col(point_id)), F.lit(n_salt))).otherwise(F.lit(0)),
        )
        cover = cover.withColumn(
            "salt",
            F.explode(
                F.when(hot_lit, F.sequence(F.lit(0), F.lit(n_salt - 1))).otherwise(
                    F.array(F.lit(0))
                )
            ),
        )
        joined = pts.join(cover, ["cell", "salt"])
    else:
        joined = pts.join(cover, "cell")
    return _refine_pip(joined, point_id, poly_id, rings_col)
