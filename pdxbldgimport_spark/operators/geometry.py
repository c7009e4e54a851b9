"""DataFrame-level geometry transforms backed by the numpy kernels.

These are the ingest-time enrichments the reference performs once and
reuses (the `add_centroids` helper materializing `the_geom_centroids`,
tasks/pdx_shapes.rake:158; validity repair, tasks/pdx_shapes.rake:115-131;
area, tasks/pdx_bldgs.rake:146-150). Polygon-side tables are orders of
magnitude smaller than the page table, so one Arrow pass here is cheap;
the enriched scalar columns (centroid, area, validity) then keep every
downstream join/agg in pure JVM expressions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..geo.core import (
    RingSet,
    poly_area,
    poly_centroid,
    point_on_surface,
    ring_self_intersects,
    rings_closed,
)


def _batch_op(df: DataFrame, poly_id: str, rings_col: str, fields, fn) -> DataFrame:
    """Run ``fn(RingSet) -> dict[str, ndarray]`` per Arrow batch, returning
    (poly_id, *fields)."""
    schema = T.StructType(
        [T.StructField(poly_id, T.LongType())]
        + [T.StructField(name, dtype) for name, dtype in fields]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rs = RingSet.from_arrow_lists(pdf[rings_col])
            out = fn(rs)
            out[poly_id] = pdf[poly_id].to_numpy()
            yield pd.DataFrame(out)[[poly_id] + [n for n, _ in fields]]

    return df.select(poly_id, rings_col).mapInPandas(gen, schema)


def with_centroids(df: DataFrame, poly_id: str, rings_col: str = "rings") -> DataFrame:
    """Attach centroid_lon/centroid_lat (ST_Centroid) and interior point
    pos_lon/pos_lat (ST_PointOnSurface) columns."""

    def fn(rs: RingSet):
        cx, cy = poly_centroid(rs)
        px, py = point_on_surface(rs)
        return {"centroid_lon": cx, "centroid_lat": cy, "pos_lon": px, "pos_lat": py}

    fields = [
        ("centroid_lon", T.DoubleType()),
        ("centroid_lat", T.DoubleType()),
        ("pos_lon", T.DoubleType()),
        ("pos_lat", T.DoubleType()),
    ]
    return df.join(_batch_op(df, poly_id, rings_col, fields, fn), poly_id)


def with_area(df: DataFrame, poly_id: str, rings_col: str = "rings", unit: str = "ft2") -> DataFrame:
    """Attach planar area (ST_Area in the pinned projection; reference
    computes EPSG:2913 ft², tasks/pdx_bldgs.rake:149)."""

    def fn(rs: RingSet):
        return {"area": poly_area(rs, projected_ft=(unit == "ft2"))}

    return df.join(_batch_op(df, poly_id, rings_col, [("area", T.DoubleType())], fn), poly_id)


def with_bbox(df: DataFrame, poly_id: str, rings_col: str = "rings") -> DataFrame:
    """Attach the (multi)polygon envelope x0/y0/x1/y1 (ST_Envelope) from
    the assembled rings — all rings, holes included, contribute."""
    from ..geo.core import poly_bbox

    def fn(rs: RingSet):
        x0, y0, x1, y1 = poly_bbox(rs)
        return {"x0": x0, "y0": y0, "x1": x1, "y1": y1}

    fields = [(n, T.DoubleType()) for n in ("x0", "y0", "x1", "y1")]
    return df.join(_batch_op(df, poly_id, rings_col, fields, fn), poly_id)


def filter_valid_polys(df: DataFrame, poly_id: str, rings_col: str = "rings") -> DataFrame:
    """The make-valid drop rule (tasks/pdx_shapes.rake:115-131): a ring
    with a self-crossing repairs to a MultiPolygon → drop the row; other
    geometries pass through. Left-semi join keeps the original columns."""

    def fn(rs: RingSet):
        bad_ring = ring_self_intersects(rs)
        bad_poly = np.zeros(rs.n_polys, bool)
        np.logical_or.at(bad_poly, rs.ring_poly, bad_ring)
        return {"valid": ~bad_poly}

    flags = _batch_op(df, poly_id, rings_col, [("valid", T.BooleanType())], fn)
    return df.join(flags.filter(F.col("valid")).select(poly_id), poly_id, "left_semi")


def enrich_polys(df: DataFrame, poly_id: str, rings_col: str = "rings") -> DataFrame:
    """One-pass ingest enrichment (the reference's add_centroids +
    make-valid + area chain done once per table): attaches ``valid``,
    ``centroid_lon/lat``, ``pos_lon/lat``, ``area`` (ft²). Downstream
    stages filter/read scalars — no further Python passes needed."""

    def fn(rs: RingSet):
        bad_ring = ring_self_intersects(rs)
        bad_poly = np.zeros(rs.n_polys, bool)
        np.logical_or.at(bad_poly, rs.ring_poly, bad_ring)
        cx, cy = poly_centroid(rs)
        px, py = point_on_surface(rs)
        return {
            "valid": ~bad_poly,
            "centroid_lon": cx,
            "centroid_lat": cy,
            "pos_lon": px,
            "pos_lat": py,
            "area": poly_area(rs, projected_ft=True),
        }

    fields = [
        ("valid", T.BooleanType()),
        ("centroid_lon", T.DoubleType()),
        ("centroid_lat", T.DoubleType()),
        ("pos_lon", T.DoubleType()),
        ("pos_lat", T.DoubleType()),
        ("area", T.DoubleType()),
    ]
    return df.join(_batch_op(df, poly_id, rings_col, fields, fn), poly_id)


def with_closed_flag(df: DataFrame, poly_id: str, rings_col: str = "rings") -> DataFrame:
    """st_isclosed on the first ring (tasks/osm_buildings.rake:36)."""

    def fn(rs: RingSet):
        closed_ring = rings_closed(rs)
        # polygon closed iff all of its rings are closed
        ok = np.ones(rs.n_polys, bool)
        np.logical_and.at(ok, rs.ring_poly, closed_ring)
        return {"is_closed": ok}

    return df.join(
        _batch_op(df, poly_id, rings_col, [("is_closed", T.BooleanType())], fn), poly_id
    )
