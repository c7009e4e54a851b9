"""S6/S7: per-tile artifact export — one deterministic OSM-XML-style
file per quarter-section tile.

Re-expresses the reference's per-tile ogr2ogr/ogr2osm stage
(tasks/metro_output.rake:62-74; golden artifact
sample_osm_files/1n2e34d.osm) as ONE Spark job: the tile assignment is
already a column, so the writer is `repartition(qtrsec)` →
`applyInPandas` per tile, serializing features in a pinned total order
with negative ids (ogr2osm convention) and the G5-simplified outline
(ST_SimplifyPreserveTopology at export, tasks/pdx_bldgs.rake:60). Tag
values are trimmed and NULL-skipped per the translation rules
(scripts/pdx_bldg_translate.py:23-43).

Writes are atomic (tmp + rename) and idempotent — re-running a tile
produces byte-identical output, so a resumed run can safely rewrite
(pytest: two runs → identical bytes, tests/test_exports.py).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .geo.simplify import simplify_ring

SIMPLIFY_TOL = 1e-6  # reference tolerance, tasks/pdx_bldgs.rake:60

_TAG_COLS = [
    ("addr:housenumber", "housenumber"),
    ("addr:street", "street"),
    ("addr:postcode", "postcode"),
    ("addr:city", "city"),
    ("building:levels", "levels"),
    ("ele", "ele"),
    ("height", "height"),
    ("building", "bldg_type"),
]

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("qtrsec", T.LongType()),
        T.StructField("n_features", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def _fmt(v) -> str:
    """Deterministic scalar formatting: shortest-roundtrip repr for
    doubles (bit-stable), plain str otherwise, trimmed (F8)."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return ""
    if isinstance(v, float):
        return repr(round(v, 2))
    return str(v).strip()


def _serialize_tile(pdf: pd.DataFrame) -> bytes:
    """One tile's features → deterministic XML bytes. Input order is
    pinned by the caller; ids are -1, -2, ... in that order."""
    out = ['<osm version="0.6" generator="pdxbldgimport_spark">']
    nid = 0
    for i, row in enumerate(pdf.itertuples(index=False)):
        way_id = -(i + 1)
        ring = simplify_ring(np.asarray(row.ring, dtype=np.float64), SIMPLIFY_TOL)
        nds = []
        for k in range(0, len(ring) - 2, 2):  # skip the closing duplicate
            nid -= 1
            out.append(
                f'  <node id="{nid}" lon="{ring[k]!r}" lat="{ring[k + 1]!r}"/>'
            )
            nds.append(nid)
        out.append(f'  <way id="{way_id}">')
        for nd in nds:
            out.append(f'    <nd ref="{nd}"/>')
        out.append(f'    <nd ref="{nds[0]}"/>')
        for tag, col in _TAG_COLS:
            val = _fmt(getattr(row, col))
            if val != "":
                out.append(f'    <tag k="{tag}" v="{val}"/>')
        out.append("  </way>")
    out.append("</osm>")
    return ("\n".join(out) + "\n").encode()


def write_tile_artifacts(bldgs: DataFrame, out_dir: str) -> DataFrame:
    """Write one `<qtrsec>.osm` per tile under ``out_dir``; returns the
    tile manifest (qtrsec, n_features, n_bytes, sha256).

    ``bldgs`` needs qtrsec, bldg_id, the _TAG_COLS sources, and a flat
    ``ring`` (outer ring [x,y,...], closed). One shuffle on qtrsec, then
    a single Arrow pass per tile — no per-tile re-query (the reference
    re-runs its export SQL once per tile, metro_output.rake:25-44)."""
    os.makedirs(out_dir, exist_ok=True)

    def per_tile(key, pdf: pd.DataFrame):
        qtrsec = int(key[0])
        # pinned total order (O1: street, housenumber; bldg_id tiebreak)
        pdf = pdf.sort_values(
            ["street", "housenumber", "bldg_id"],
            na_position="last",
            kind="mergesort",
        )
        payload = _serialize_tile(pdf)
        path = os.path.join(out_dir, f"{qtrsec}.osm")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)  # atomic — resume-safe, idempotent
        return pd.DataFrame(
            {
                "qtrsec": [qtrsec],
                "n_features": [len(pdf)],
                "n_bytes": [len(payload)],
                "sha256": [hashlib.sha256(payload).hexdigest()],
            }
        )

    cols = ["qtrsec", "bldg_id", "ring"] + [c for _, c in _TAG_COLS]
    return (
        bldgs.select(*cols)
        .repartition("qtrsec")
        .groupBy("qtrsec")
        .applyInPandas(per_tile, MANIFEST_SCHEMA)
    )


def pdx_tile_artifacts(spark, sf_dir: str, out_dir: str) -> DataFrame:
    """The full export: pdx_bldgs + its outer ring → per-tile files."""
    from .queries import pdx_bldgs_df, prepared_cbldg, views

    views(spark, sf_dir)
    pdx = pdx_bldgs_df(spark, sf_dir)
    rings = prepared_cbldg(spark, sf_dir).select(
        "bldg_id", F.element_at(F.col("rings"), 1).alias("ring")
    )
    return write_tile_artifacts(pdx.join(rings, "bldg_id"), out_dir)
