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

Geometry convention (G8, the reference's ST_Multi + hole assembly,
tasks/pdx_bldgs.rake:60 / tasks/osm_buildings.rake:42-59): a feature's
``rings`` array is [outer, inner, inner, ...]. A single-ring feature
serializes as one closed way carrying the tags; a multi-ring feature
serializes as the standard OSM **multipolygon relation** — one closed
way per ring (no tags on the ways), then a relation with
``type=multipolygon``, members role ``outer`` (ring 0) / ``inner``
(rest), and the feature tags on the relation. Node/way/relation ids are
independent negative counters (OSM ids are namespaced per element
type).

Writes are atomic (attempt-unique tmp + rename) and idempotent —
re-running a tile produces byte-identical output, so a resumed run can
safely rewrite (pytest: two runs → identical bytes, tests/test_exports.py).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .geo.simplify import simplify_ring


def artifact_dir(prefix: str, sf_dir: str) -> str:
    """Scratch artifact directory keyed by input AND engine version —
    a code change lands in a fresh directory, so a run's on-disk
    artifact set can never silently mix tiles written by two engine
    revisions (the manifest already masks stale files, but the bytes on
    disk should be self-consistent too)."""
    from . import __version__

    token = hashlib.md5(f"{sf_dir}|{__version__}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{token}")

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
        T.StructField("n_nodes", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def _fmt(v) -> str:
    """Deterministic scalar formatting: shortest-roundtrip repr for
    doubles (bit-stable), plain str otherwise, trimmed (F8). Always
    reprs a PYTHON float — repr(np.float64(x)) is 'np.float64(x)' under
    numpy>=2, which would corrupt the XML identically on every run (the
    byte-determinism test can't catch it)."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return ""
    if isinstance(v, (float, np.floating)):
        return repr(round(float(v), 2))
    return str(v).strip()


def _sweep_tmp(out_dir: str, stale_s: float = 3600.0) -> None:
    """Remove orphaned ``*.tmp`` attempt files from killed prior runs
    (driver-side, before tasks launch). The artifact dir is shared
    across processes (keyed by sf_dir + engine version), so only
    provably-dead attempts are swept: the ``<name>.<pid>.tmp`` suffix
    names the writer process — a tmp whose pid is still alive (or
    unparseable but freshly modified) is another run's in-flight
    attempt and is left alone."""
    now = __import__("time").time()
    for fn in os.listdir(out_dir):
        if not fn.endswith(".tmp"):
            continue
        path = os.path.join(out_dir, fn)
        parts = fn.split(".")
        pid = int(parts[-2]) if len(parts) >= 3 and parts[-2].isdigit() else None
        dead = False
        if pid is not None and pid != os.getpid():
            try:
                os.kill(pid, 0)  # signal 0: existence check only
                continue  # writer provably ALIVE — never sweep, any age
            except ProcessLookupError:
                dead = True
            except PermissionError:
                continue  # alive under another uid — leave alone
        if not dead:
            # pid unparseable (or our own): mtime staleness is the only
            # signal left
            try:
                dead = now - os.path.getmtime(path) > stale_s
            except OSError:
                continue
        if dead:
            try:
                os.remove(path)
            except OSError:
                pass


class _Ids:
    """Independent negative id counters per OSM element namespace."""

    __slots__ = ("node", "way", "rel")

    def __init__(self):
        self.node = self.way = self.rel = 0


def _emit_way(out: list, ids: _Ids, flat: np.ndarray, tag_lines: list[str]) -> int:
    """Serialize one closed ring as a way (G5-simplified); returns the
    way id. ``tag_lines`` go on the way (empty for relation members).
    Returns the node count via ids.node side effect."""
    ring = simplify_ring(np.asarray(flat, dtype=np.float64), SIMPLIFY_TOL)
    nds = []
    for k in range(0, len(ring) - 2, 2):  # skip the closing duplicate
        ids.node -= 1
        out.append(
            f'  <node id="{ids.node}" lon="{float(ring[k])!r}"'
            f' lat="{float(ring[k + 1])!r}"/>'
        )
        nds.append(ids.node)
    ids.way -= 1
    out.append(f'  <way id="{ids.way}">')
    for nd in nds:
        out.append(f'    <nd ref="{nd}"/>')
    out.append(f'    <nd ref="{nds[0]}"/>')
    out.extend(tag_lines)
    out.append("  </way>")
    return ids.way


def _serialize_tile(pdf: pd.DataFrame) -> tuple[bytes, int]:
    """One tile's features → (deterministic XML bytes, total node
    count). Input order is pinned by the caller; ids are -1, -2, ... per
    element namespace in that order. The feature iteration is per-row
    Python, allowed ONLY because the consolidation contract bounds tiles
    at ~MAX_BLDGS (≈50) features (tasks/metro_quarter_secs.rake:45) —
    the parallelism axis is tiles, not features-within-tile."""
    out = ['<osm version="0.6" generator="pdxbldgimport_spark">']
    ids = _Ids()
    for row in pdf.itertuples(index=False):
        tag_lines = []
        for tag, col in _TAG_COLS:
            val = _fmt(getattr(row, col))
            if val != "":
                tag_lines.append(f'    <tag k="{tag}" v="{val}"/>')
        rings = list(row.rings)
        if len(rings) == 1:
            _emit_way(out, ids, rings[0], tag_lines)
        else:
            # OSM multipolygon relation: tags live on the relation
            member_ids = [_emit_way(out, ids, r, []) for r in rings]
            ids.rel -= 1
            out.append(f'  <relation id="{ids.rel}">')
            for j, wid in enumerate(member_ids):
                role = "outer" if j == 0 else "inner"
                out.append(f'    <member type="way" ref="{wid}" role="{role}"/>')
            out.append('    <tag k="type" v="multipolygon"/>')
            out.extend(tag_lines)
            out.append("  </relation>")
    out.append("</osm>")
    return ("\n".join(out) + "\n").encode(), -ids.node


def write_tile_artifacts(bldgs: DataFrame, out_dir: str) -> DataFrame:
    """Write one `<qtrsec>.osm` per tile under ``out_dir``; returns the
    tile manifest (qtrsec, n_features, n_nodes, n_bytes, sha256).

    ``bldgs`` needs qtrsec, bldg_id, the _TAG_COLS sources, and
    ``rings`` ([outer, inner...], each a flat closed [x,y,...] array).
    One shuffle on qtrsec, then a single Arrow pass per tile — no
    per-tile re-query (the reference re-runs its export SQL once per
    tile, metro_output.rake:25-44)."""
    os.makedirs(out_dir, exist_ok=True)
    _sweep_tmp(out_dir)

    def per_tile(key, pdf):  # no hints: applyInPandas infers (key, pdf)
        qtrsec = int(key[0])
        # pinned total order (O1: street, housenumber; bldg_id tiebreak)
        pdf = pdf.sort_values(
            ["street", "housenumber", "bldg_id"],
            na_position="last",
            kind="mergesort",
        )
        payload, n_nodes = _serialize_tile(pdf)
        path = os.path.join(out_dir, f"{qtrsec}.osm")
        # attempt-unique tmp: a speculative/zombie twin attempt must not
        # share the tmp path, or one attempt can publish the other's
        # partially-written file through os.replace.
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)  # atomic — resume-safe, idempotent
        return pd.DataFrame(
            {
                "qtrsec": [qtrsec],
                "n_features": [len(pdf)],
                "n_nodes": [n_nodes],
                "n_bytes": [len(payload)],
                "sha256": [hashlib.sha256(payload).hexdigest()],
            }
        )

    cols = ["qtrsec", "bldg_id", "rings"] + [c for _, c in _TAG_COLS]
    return (
        bldgs.select(*cols)
        .repartition("qtrsec")
        .groupBy("qtrsec")
        .applyInPandas(per_tile, MANIFEST_SCHEMA)
    )


# ----------------------------------------------------------------------
# Second half of S7: the reference ships every tile as a PAIR of
# artifacts — buildings (`<qtrsec>.osm`) AND standalone multi-address
# nodes (`<qtrsec>_multi_addr.osm`, built at tasks/metro_output.rake:46-58,
# uploaded by scripts/add_addrs.rb; golden sample
# sample_osm_files/1n2e34d_multi_addr.osm). Address nodes carry addr:*
# tags only — no ways, no relations.

NODE_TAG_COLS = [
    ("addr:housenumber", "housenumber"),
    ("addr:street", "street"),
    ("addr:postcode", "postcode"),
    ("addr:city", "city"),
    ("addr:state", "state"),
]

NODE_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("qtrsec", T.LongType()),
        T.StructField("n_features", T.IntegerType()),
        T.StructField("n_nodes", T.LongType()),
        T.StructField("n_tags", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def _serialize_node_tile(pdf: pd.DataFrame) -> tuple[bytes, int]:
    """One tile's address placements → (deterministic XML bytes, total
    emitted tag count). Ids are -1, -2, ... in the caller-pinned order.
    Per-row Python is bounded by the ~MAX_BLDGS-features-per-tile
    consolidation contract, same as the building serializer."""
    out = ['<osm version="0.6" generator="pdxbldgimport_spark">']
    nid = 0
    n_tags = 0
    for row in pdf.itertuples(index=False):
        nid -= 1
        out.append(
            f'  <node id="{nid}" lon="{float(row.lon)!r}"'
            f' lat="{float(row.lat)!r}">'
        )
        for tag, col in NODE_TAG_COLS:
            val = _fmt(getattr(row, col))
            if val != "":
                n_tags += 1
                out.append(f'    <tag k="{tag}" v="{val}"/>')
        out.append("  </node>")
    out.append("</osm>")
    return ("\n".join(out) + "\n").encode(), n_tags


def write_node_artifacts(nodes: DataFrame, out_dir: str) -> DataFrame:
    """Write one ``<qtrsec>_multi_addr.osm`` per tile under ``out_dir``;
    returns the manifest (qtrsec, n_features, n_nodes, n_tags, n_bytes,
    sha256). ``nodes`` needs qtrsec, pdx_bldg_id, lon, lat, and the
    NODE_TAG_COLS sources. Same one-shuffle shape and atomic idempotent
    writes as ``write_tile_artifacts``."""
    os.makedirs(out_dir, exist_ok=True)
    _sweep_tmp(out_dir)

    def per_tile(key, pdf):
        qtrsec = int(key[0])
        # pinned total order (O1 analog; lon/lat break residual ties so
        # byte output is input-partition-order independent)
        pdf = pdf.sort_values(
            ["street", "housenumber", "pdx_bldg_id", "lon", "lat"],
            na_position="last",
            kind="mergesort",
        )
        payload, n_tags = _serialize_node_tile(pdf)
        path = os.path.join(out_dir, f"{qtrsec}_multi_addr.osm")
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "qtrsec": [qtrsec],
                "n_features": [len(pdf)],
                "n_nodes": [len(pdf)],
                "n_tags": [n_tags],
                "n_bytes": [len(payload)],
                "sha256": [hashlib.sha256(payload).hexdigest()],
            }
        )

    cols = ["qtrsec", "pdx_bldg_id", "lon", "lat"] + [c for _, c in NODE_TAG_COLS]
    return (
        nodes.select(*cols)
        .repartition("qtrsec")
        .groupBy("qtrsec")
        .applyInPandas(per_tile, NODE_MANIFEST_SCHEMA)
    )


def densified_rect_rings_expr(k: int = 4) -> str:
    """SQL expression: the cbldg rectangle (bx0,by0,bx1,by1) as a single
    closed ring with every edge split into ``k`` exactly-collinear
    segments — the G5 gate's fixture. The inserted vertices are linear
    combinations of the corner expressions, so they are exactly on the
    edges; export-time simplification must remove exactly these and
    keep the 4 corners (a broken tolerance or collapse guard changes
    the artifact's node count, which the driver's oracle checks)."""
    pts: list[str] = []
    for t in range(k):
        pts += [f"bx0 + {t}e0/{k}e0 * (bx1-bx0)", "by0"]
    for t in range(k):
        pts += ["bx1", f"by0 + {t}e0/{k}e0 * (by1-by0)"]
    for t in range(k):
        pts += [f"bx1 + {t}e0/{k}e0 * (bx0-bx1)", "by1"]
    for t in range(k):
        pts += ["bx0", f"by1 + {t}e0/{k}e0 * (by0-by1)"]
    pts += ["bx0", "by0"]
    return "array(array(" + ", ".join(pts) + "))"


def pdx_tile_artifacts(
    spark, sf_dir: str, out_dir: str, densify_k: int | None = None
) -> DataFrame:
    """The full export: pdx_bldgs + its rings → per-tile files.
    ``densify_k`` replaces each building's rings with a ``k``-densified
    rectangle ring (see ``densified_rect_rings_expr``) so the export's
    simplify step is load-bearing in the artifact node counts."""
    from .queries import pdx_bldgs_df, prepared_cbldg, views

    views(spark, sf_dir)
    pdx = pdx_bldgs_df(spark, sf_dir)
    if densify_k is None:
        rings = prepared_cbldg(spark, sf_dir).select("bldg_id", "rings")
    else:
        rings = spark.table("cbldg").select(
            "bldg_id", F.expr(densified_rect_rings_expr(densify_k)).alias("rings")
        )
    return write_tile_artifacts(pdx.join(rings, "bldg_id"), out_dir)
