"""S6/S7 per-tile artifact export: byte-determinism, atomicity shape,
and agreement with the tile_export payload counts."""

from __future__ import annotations

import hashlib
import os

from pdxbldgimport_spark import queries as Q
from pdxbldgimport_spark.exports import pdx_tile_artifacts
from pdxbldgimport_spark.queries_osm import tile_export_df

from conftest import SF_SMOKE


def _run(spark, tmp_path, name):
    out = str(tmp_path / name)
    manifest = pdx_tile_artifacts(spark, SF_SMOKE, out).toPandas()
    files = {
        f: hashlib.sha256(open(os.path.join(out, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(out))
    }
    return manifest.sort_values("qtrsec").reset_index(drop=True), files


def test_tile_artifacts_deterministic_and_complete(spark, tmp_path):
    m1, f1 = _run(spark, tmp_path, "run1")
    m2, f2 = _run(spark, tmp_path, "run2")
    # byte-identical across runs (resume-safe idempotent writes)
    assert f1 == f2
    assert m1.equals(m2)
    # one artifact per tile; manifest sha matches the bytes on disk
    assert set(f1) == {f"{q}.osm" for q in m1.qtrsec}
    for _, row in m1.iterrows():
        assert f1[f"{row.qtrsec}.osm"] == row.sha256
    # per-tile feature counts agree with the oracle-gated tile_export
    pdx = Q.pdx_bldgs_df(spark, SF_SMOKE)
    want = (
        tile_export_df(pdx)
        .select("qtrsec", "n_features")
        .toPandas()
        .set_index("qtrsec")["n_features"]
        .to_dict()
    )
    got = m1.set_index("qtrsec")["n_features"].to_dict()
    assert got == want


def test_multipolygon_hole_round_trips_inner_ring(spark, tmp_path):
    """G8: a feature whose rings array carries a hole serializes as an
    OSM multipolygon relation (outer way + inner way + typed relation,
    tags on the relation), the inner ring's coordinates round-trip, and
    the bytes stay deterministic."""
    import xml.etree.ElementTree as ET

    import pandas as pd
    from pyspark.sql import types as T

    from pdxbldgimport_spark.exports import write_tile_artifacts

    outer = [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0]
    inner = [1.0, 1.0, 2.0, 1.0, 2.0, 2.0, 1.0, 2.0, 1.0, 1.0]
    simple = [10.0, 0.0, 11.0, 0.0, 11.0, 1.0, 10.0, 1.0, 10.0, 0.0]
    schema = T.StructType(
        [
            T.StructField("qtrsec", T.LongType()),
            T.StructField("bldg_id", T.LongType()),
            T.StructField("rings", T.ArrayType(T.ArrayType(T.DoubleType()))),
            T.StructField("housenumber", T.StringType()),
            T.StructField("street", T.StringType()),
            T.StructField("postcode", T.StringType()),
            T.StructField("city", T.StringType()),
            T.StructField("levels", T.IntegerType()),
            T.StructField("ele", T.DoubleType()),
            T.StructField("height", T.DoubleType()),
            T.StructField("bldg_type", T.StringType()),
        ]
    )
    rows = [
        (7, 1, [outer, inner], "12", "A St", None, None, 2, None, None, "yes"),
        (7, 2, [simple], "14", "A St", None, None, None, None, None, "house"),
    ]
    df = spark.createDataFrame(rows, schema)

    def run(name):
        out = str(tmp_path / name)
        write_tile_artifacts(df, out).collect()
        return open(os.path.join(out, "7.osm"), "rb").read()

    b1, b2 = run("h1"), run("h2")
    assert b1 == b2  # byte determinism with relations present

    root = ET.fromstring(b1.decode())
    ways = {w.get("id"): w for w in root.findall("way")}
    rels = root.findall("relation")
    assert len(ways) == 3 and len(rels) == 1
    rel = rels[0]
    assert int(rel.get("id")) < 0
    members = rel.findall("member")
    assert [m.get("role") for m in members] == ["outer", "inner"]
    tags = {t.get("k"): t.get("v") for t in rel.findall("tag")}
    assert tags["type"] == "multipolygon" and tags["building"] == "yes"
    # inner ring coordinates round-trip through the inner member way
    nodes = {n.get("id"): (float(n.get("lon")), float(n.get("lat")))
             for n in root.findall("node")}
    inner_way = ways[members[1].get("ref")]
    assert not inner_way.findall("tag")  # tags live on the relation
    got = [nodes[nd.get("ref")] for nd in inner_way.findall("nd")]
    want = [(inner[i], inner[i + 1]) for i in range(0, len(inner), 2)]
    assert got == want
    # the simple feature stays a plain tagged way
    tagged_ways = [w for w in ways.values() if w.findall("tag")]
    assert len(tagged_ways) == 1
    assert {t.get("k"): t.get("v") for t in tagged_ways[0].findall("tag")}[
        "building"
    ] == "house"


def test_densified_export_restores_corner_count(spark, tmp_path):
    """G5 at export: 4-densified rectangle rings must simplify back to
    exactly 4 nodes per feature in the artifact."""
    from pdxbldgimport_spark.exports import pdx_tile_artifacts

    out = str(tmp_path / "dens")
    m = pdx_tile_artifacts(spark, SF_SMOKE, out, densify_k=4).toPandas()
    assert (m.n_nodes == 4 * m.n_features).all()


def test_tile_artifacts_are_parseable_osm(spark, tmp_path):
    import xml.etree.ElementTree as ET

    out = str(tmp_path / "runx")
    manifest = pdx_tile_artifacts(spark, SF_SMOKE, out).toPandas()
    total_ways = 0
    for q in manifest.qtrsec:
        root = ET.parse(os.path.join(out, f"{q}.osm")).getroot()
        ways = root.findall("way")
        total_ways += len(ways)
        for w in ways:
            assert int(w.get("id")) < 0  # ogr2osm negative-id convention
            nds = w.findall("nd")
            assert len(nds) >= 4 and nds[0].get("ref") == nds[-1].get("ref")
            assert any(t.get("k") == "building" for t in w.findall("tag"))
    assert total_ways == int(manifest.n_features.sum())


def test_multi_addr_artifacts_deterministic(spark, tmp_path):
    """Second half of S7: the per-tile `<qtrsec>_multi_addr.osm`
    standalone-node artifact is byte-deterministic across runs, one
    file per tile, sha matches bytes, and every feature is a tagged
    <node> (no ways/relations)."""
    import xml.etree.ElementTree as ET

    from pdxbldgimport_spark.exports import write_node_artifacts
    from pdxbldgimport_spark.queries import multi_addrs_df

    nodes = multi_addrs_df(spark, SF_SMOKE)

    def run(name):
        out = str(tmp_path / name)
        manifest = write_node_artifacts(nodes, out).toPandas()
        files = {
            f: open(os.path.join(out, f), "rb").read()
            for f in sorted(os.listdir(out))
        }
        return manifest.sort_values("qtrsec").reset_index(drop=True), files

    m1, f1 = run("run1")
    m2, f2 = run("run2")
    assert f1 == f2
    assert m1.equals(m2)
    assert set(f1) == {f"{q}_multi_addr.osm" for q in m1.qtrsec}
    total_nodes = 0
    for _, row in m1.iterrows():
        payload = f1[f"{row.qtrsec}_multi_addr.osm"]
        assert hashlib.sha256(payload).hexdigest() == row.sha256
        root = ET.fromstring(payload.decode())
        xml_nodes = root.findall("node")
        assert not root.findall("way") and not root.findall("relation")
        assert len(xml_nodes) == row.n_nodes == row.n_features
        assert all(int(n.get("id")) < 0 for n in xml_nodes)
        total_nodes += len(xml_nodes)
    assert total_nodes == nodes.count()
