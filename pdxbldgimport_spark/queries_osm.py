"""OSM-existing-world queries: tag projection (P1-P5), polygon dedup
(J5/O4), metro union (O2), fill-only tag merge (F9), per-tile export
(S7/O1) and changeset batching (S9). Registers into queries.QUERIES."""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as Wnd

from . import oracles_conflation as OC
from . import synth
from .geo import cells as C
from .operators import geometry as G
from .operators.poly_join import intersects_join
from .operators.pip_join import tile_expr
from .session import session_token
from .queries import (
    prepared_cbldg,
    prepared_footprints,
    pdx_bldgs_df,
    register,
    views,
)

# tag keys the engine projects (subset of the reference's 26,
# tasks/osm_buildings.rake:9-33 — synth carries these 9)
TAG_COLS = [
    ("building", "t_building"),
    ("demolished:building", "t_demolished"),
    ("building:part", "t_building_part"),
    ("landuse", "t_landuse"),
    ("addr:housenumber", "t_housenumber"),
    ("addr:street", "t_street"),
    ("addr:city", "t_city"),
    ("addr:postcode", "t_postcode"),
    ("building:levels", "t_levels"),
]


def prepared_osm_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """osm ways with kernel-computed ring closedness (st_isclosed,
    tasks/osm_buildings.rake:36) — the honest path; the generator's
    is_closed_gen flag is never read by the engine."""
    views(spark, sf_dir)
    from .queries import stage

    return stage(
        spark,
        (session_token(spark), sf_dir, "osm_ways"),
        lambda: G.with_closed_flag(
            spark.table("osm_ways").select("way_id", "tags", "rings"), "way_id"
        ),
    )


def _bldg_tag_filter():
    t = lambda k: F.try_element_at(F.col("tags"), F.lit(k))  # noqa: E731
    return (
        (t("building") != "")
        | (t("demolished:building") != "")
        | (t("building:part") != "")
    )


def osm_buildings_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2 (tasks/osm_buildings.rake:4-37): closed ways carrying
    building-ish tags, tag map flattened to columns."""
    ways = prepared_osm_ways(spark, sf_dir)
    t = lambda k: F.try_element_at(F.col("tags"), F.lit(k))  # noqa: E731
    proj = [
        t(k).alias(k.replace(":", "_").replace("addr_", "addr_")) for k, _ in TAG_COLS
    ]
    return ways.where(F.col("is_closed") & _bldg_tag_filter()).select(
        "way_id", *proj, "rings"
    )


_OSM_BLDG_ORACLE_COLS = ", ".join(
    f"{src} AS {k.replace(':', '_')}" for k, src in TAG_COLS
)
_OSM_BLDG_FILTER = (
    "is_closed_gen AND (t_building <> '' OR t_demolished <> '' "
    "OR t_building_part <> '')"
)


@register(
    "osm_buildings",
    synth.oracle_with("osm_ways_base")
    + f"""
    SELECT way_id, {_OSM_BLDG_ORACLE_COLS}
    FROM osm_ways_base
    WHERE {_OSM_BLDG_FILTER}
    """,
)
def q_osm_buildings(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return osm_buildings_df(spark, sf_dir).drop("rings")


# P5 construction sites (tasks/osm_construction.rake:1-16)
@register(
    "osm_construction",
    synth.oracle_with("osm_ways_base")
    + """
    SELECT way_id
    FROM osm_ways_base
    WHERE is_closed_gen AND t_landuse = 'construction'
    """,
)
def q_osm_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    ways = prepared_osm_ways(spark, sf_dir)
    return ways.where(
        F.col("is_closed")
        & (F.try_element_at(F.col("tags"), F.lit("landuse")) == "construction")
    ).select("way_id")


def construction_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ways = prepared_osm_ways(spark, sf_dir)
    return ways.where(
        F.col("is_closed")
        & (F.try_element_at(F.col("tags"), F.lit("landuse")) == "construction")
    ).select("way_id", "rings")


# P3+O3 osm_addresses (tasks/osm_addresses.rake): address-carrying closed
# ways UNION ALL address-carrying nodes.
@register(
    "osm_addresses",
    synth.oracle_with("osm_ways_base", "osm_nodes_base")
    + """
    SELECT way_id, CAST(NULL AS BIGINT) AS node_id, 'way' AS type,
           t_housenumber AS addr_housenumber, t_street AS addr_street,
           t_city AS addr_city
    FROM osm_ways_base
    WHERE is_closed_gen AND t_street <> '' AND t_housenumber <> ''
    UNION ALL
    SELECT CAST(NULL AS BIGINT), node_id, 'node',
           t_housenumber, t_street, t_city
    FROM osm_nodes_base
    WHERE t_street <> '' AND t_housenumber <> ''
    """,
)
def q_osm_addresses(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    t = lambda k: F.try_element_at(F.col("tags"), F.lit(k))  # noqa: E731
    ways = (
        prepared_osm_ways(spark, sf_dir)
        .where(F.col("is_closed") & (t("addr:street") != "") & (t("addr:housenumber") != ""))
        .select(
            "way_id",
            F.lit(None).cast("long").alias("node_id"),
            F.lit("way").alias("type"),
            t("addr:housenumber").alias("addr_housenumber"),
            t("addr:street").alias("addr_street"),
            t("addr:city").alias("addr_city"),
        )
    )
    nodes = (
        spark.table("osm_nodes")
        .where((t("addr:street") != "") & (t("addr:housenumber") != ""))
        .select(
            F.lit(None).cast("long").alias("way_id"),
            "node_id",
            F.lit("node").alias("type"),
            t("addr:housenumber").alias("addr_housenumber"),
            t("addr:street").alias("addr_street"),
            t("addr:city").alias("addr_city"),
        )
    )
    return ways.unionByName(nodes)


# ----------------------------------------------------------------------
# metro_bldgs: O2 union of the two regions + J5 dedup marks + O4 split
# (tasks/metro_bldgs.rake). mkey = bldg_key*2 + src bit (collision-free
# deterministic join key across the two id spaces).

_TILE_MID = (
    f"CAST(LEAST(GREATEST(FLOOR(((y0 + y1) / 2e0 - ({C.LAT_S!r})) / {C.SPAN_Y!r} * 32e0), 0), 31) AS BIGINT) * 32 "
    f"+ CAST(LEAST(GREATEST(FLOOR(((x0 + x1) / 2e0 - ({C.LON_W!r})) / {C.SPAN_X!r} * 32e0), 0), 31) AS BIGINT)"
)

METRO_CTES = f"""
, metro AS (
  SELECT 'pdx' AS src, CAST(b.state_id AS VARCHAR) AS property_id,
         b.bldg_id * 2 AS mkey, cb.bx0 AS x0, cb.bx1 AS x1,
         cb.by0 AS y0, cb.by1 AS y1, b.qtrsec,
         b.housenumber AS addr_housenumber, b.street AS addr_street,
         b.city AS addr_city, COALESCE(b.state, 'OR') AS addr_state,
         b.postcode AS addr_postcode,
         CASE WHEN b.levels = 0 THEN NULL ELSE b.levels END AS levels,
         b.ele, b.height, b.bldg_type, b.no_addrs
  FROM pdx_bldgs b JOIN cbldg_base cb USING (bldg_id)
  UNION ALL
  SELECT 'clark', CAST(f.fp_id AS VARCHAR), f.fp_id * 2 + 1,
         f.x0, f.x1, f.y0, f.y1,
         {_TILE_MID},
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
         'WA', CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         'yes', CAST(NULL AS BIGINT)
  FROM footprints_base f WHERE f.fp_id % 97 <> 5
), osmb AS (
  SELECT way_id, wx0, wx1, wy0, wy1 FROM osm_ways_base
  WHERE {_OSM_BLDG_FILTER}
), osmc AS (
  SELECT way_id, wx0, wx1, wy0, wy1 FROM osm_ways_base
  WHERE is_closed_gen AND t_landuse = 'construction'
), metro_marked AS (
  SELECT m.*,
    (EXISTS (SELECT 1 FROM osmb o
             WHERE m.x0 <= o.wx1 AND o.wx0 <= m.x1
               AND m.y0 <= o.wy1 AND o.wy0 <= m.y1)
     OR EXISTS (SELECT 1 FROM osmc o
             WHERE m.x0 <= o.wx1 AND o.wx0 <= m.x1
               AND m.y0 <= o.wy1 AND o.wy0 <= m.y1)) AS is_deleted
  FROM metro m
)
"""


def metro_marked_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-materialized (reference physical table, tasks/metro_bldgs.rake):
    the kept/deleted split (O4) and downstream tiling read it twice, and
    the union side feeds two intersects joins — without the boundary the
    whole conflation chain re-executes per reference."""
    from .queries import stage

    return stage(
        spark, (session_token(spark), sf_dir, "metro_marked"),
        lambda: _metro_marked_build(spark, sf_dir),
    )


def _metro_marked_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    pdx = pdx_bldgs_df(spark, sf_dir)
    cb = prepared_cbldg(spark, sf_dir).select("bldg_id", "rings")
    pdx_side = pdx.join(cb, "bldg_id").select(
        F.lit("pdx").alias("src"),
        F.col("state_id").cast("string").alias("property_id"),
        (F.col("bldg_id") * 2).alias("mkey"),
        F.col("qtrsec"),
        F.col("housenumber").alias("addr_housenumber"),
        F.col("street").alias("addr_street"),
        F.col("city").alias("addr_city"),
        F.coalesce(F.col("state"), F.lit("OR")).alias("addr_state"),
        F.col("postcode").alias("addr_postcode"),
        F.nullif(F.col("levels"), F.lit(0)).alias("levels"),
        "ele", "height", "bldg_type", "no_addrs", "rings",
    )
    clark = prepared_footprints(spark, sf_dir).select(
        F.lit("clark").alias("src"),
        F.col("fp_id").cast("string").alias("property_id"),
        (F.col("fp_id") * 2 + 1).alias("mkey"),
        tile_expr(F.col("centroid_lon"), F.col("centroid_lat"), C.RES_TILE).alias("qtrsec"),
        F.lit(None).cast("string").alias("addr_housenumber"),
        F.lit(None).cast("string").alias("addr_street"),
        F.lit(None).cast("string").alias("addr_city"),
        F.lit("WA").alias("addr_state"),
        F.lit(None).cast("string").alias("addr_postcode"),
        F.lit(None).cast("long").alias("levels"),
        F.lit(None).cast("double").alias("ele"),
        F.lit(None).cast("double").alias("height"),
        F.lit("yes").alias("bldg_type"),
        F.lit(None).cast("long").alias("no_addrs"),
        "rings",
    )
    metro = pdx_side.unionByName(clark)
    # one join against (buildings ∪ construction): is_deleted only needs
    # "intersects either", so union the small OSM side instead of running
    # the cell join twice (tasks/metro_bldgs.rake:51-69 runs two UPDATEs;
    # the mark they produce is identical).
    osmb = osm_buildings_df(spark, sf_dir).select("way_id", "rings")
    osmc = construction_df(spark, sf_dir)
    osm_any = osmb.unionByName(osmc).dropDuplicates(["way_id"])
    hits = (
        intersects_join(metro, osm_any, "mkey", "way_id")
        .select("mkey")
        .distinct()
        .withColumn("__del", F.lit(True))
    )
    return (
        metro.join(hits, "mkey", "left")
        .withColumn("is_deleted", F.coalesce(F.col("__del"), F.lit(False)))
        .drop("__del")
    )


_METRO_OUT = (
    "src, property_id, mkey, qtrsec, addr_housenumber, addr_street, "
    "addr_city, addr_state, addr_postcode, levels, bldg_type, is_deleted"
)


@register(
    "metro_bldgs",
    OC.with_prefix(OC.PDX_BLDGS_CTES, METRO_CTES,
                   bases=("footprints_base", "osm_ways_base"))
    + f"SELECT {_METRO_OUT} FROM metro_marked WHERE NOT is_deleted",
)
def q_metro_bldgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    df = metro_marked_df(spark, sf_dir)
    return df.where(~F.col("is_deleted")).select(*_METRO_OUT.split(", "))


@register(
    "metro_bldgs_deleted",
    OC.with_prefix(OC.PDX_BLDGS_CTES, METRO_CTES,
                   bases=("footprints_base", "osm_ways_base"))
    + f"SELECT {_METRO_OUT} FROM metro_marked WHERE is_deleted",
)
def q_metro_bldgs_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    df = metro_marked_df(spark, sf_dir)
    return df.where(F.col("is_deleted")).select(*_METRO_OUT.split(", "))


# ----------------------------------------------------------------------
# F9 fill-only tag merge (scripts/add_addrs.rb:42-53): existing OSM value
# wins; our conflated address fills only absent keys. Spatial match via
# the J5 intersects join; deterministic pick = lowest bldg_id per way.
FILL_CTES = """
, pairs AS (
  SELECT o.way_id, b.bldg_id, o.t_housenumber, o.t_street, o.t_city,
         o.t_postcode, b.housenumber, b.street, b.city, b.postcode,
         ROW_NUMBER() OVER (PARTITION BY o.way_id ORDER BY b.bldg_id) AS rn
  FROM osm_ways_base o
  JOIN cbldg_base cb
    ON cb.bx0 <= o.wx1 AND o.wx0 <= cb.bx1
   AND cb.by0 <= o.wy1 AND o.wy0 <= cb.by1
  JOIN pdx_bldgs b ON b.bldg_id = cb.bldg_id
  WHERE o.is_closed_gen
    AND (o.t_building <> '' OR o.t_demolished <> '' OR o.t_building_part <> '')
    AND b.housenumber IS NOT NULL
), merged AS (
  SELECT way_id, bldg_id,
         COALESCE(t_housenumber, housenumber) AS addr_housenumber,
         COALESCE(t_street, street) AS addr_street,
         COALESCE(t_city, city) AS addr_city,
         COALESCE(t_postcode, postcode) AS addr_postcode
  FROM pairs WHERE rn = 1
)
"""


@register(
    "fill_only_merge",
    OC.with_prefix(OC.PDX_BLDGS_CTES, FILL_CTES, bases=("osm_ways_base",))
    + "SELECT way_id, bldg_id, addr_housenumber, addr_street, addr_city, addr_postcode FROM merged",
)
def q_fill_only_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    pdx = pdx_bldgs_df(spark, sf_dir).where(F.col("housenumber").isNotNull())
    cb = prepared_cbldg(spark, sf_dir).select("bldg_id", "rings")
    bldgs = pdx.join(cb, "bldg_id")
    osmb = osm_buildings_df(spark, sf_dir)
    pairs = intersects_join(bldgs.select("bldg_id", "rings"), osmb.select("way_id", "rings"), "bldg_id", "way_id")
    w = Wnd.partitionBy("way_id").orderBy(F.col("bldg_id").asc())
    picked = pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    t = lambda k: F.try_element_at(F.col("tags"), F.lit(k))  # noqa: E731
    ways = prepared_osm_ways(spark, sf_dir).select("way_id", "tags")
    fill = picked.join(ways, "way_id").join(
        pdx.select("bldg_id", "housenumber", "street", "city", "postcode"), "bldg_id"
    )
    # F9 fill-only semantics (||=, scripts/add_addrs.rb:46-49): the
    # existing OSM tag wins; the conflated value fills only absent keys.
    # Per-key coalesce — session-independent (no mapKeyDedupPolicy
    # dependency: the driver's vanilla session uses the EXCEPTION default,
    # where a map_concat detour throws DUPLICATED_MAP_KEY) and cheaper
    # than materializing an intermediate map per row.
    return fill.select(
        "way_id", "bldg_id",
        F.coalesce(t("addr:housenumber"), F.col("housenumber")).alias("addr_housenumber"),
        F.coalesce(t("addr:street"), F.col("street")).alias("addr_street"),
        F.coalesce(t("addr:city"), F.col("city")).alias("addr_city"),
        F.coalesce(t("addr:postcode"), F.col("postcode")).alias("addr_postcode"),
    )


# ----------------------------------------------------------------------
# S7+O1+F7+F8: per-tile deterministic export payload (the ogr2osm stage,
# tasks/metro_output.rake:25-74 + translation rules
# scripts/pdx_bldg_translate.py:14-53). Canonical per-tile artifact =
# newline-joined sorted feature lines; stays fully JVM-side
# (collect_list + array_sort) — ordered-export semantics preserved as
# per-tile determinism.
@register(
    "tile_export",
    OC.with_prefix(OC.PDX_BLDGS_CTES)
    + """
    SELECT qtrsec,
           COUNT(*) AS n_features,
           string_agg(line, chr(10) ORDER BY line) AS payload
    FROM (
      SELECT qtrsec,
             concat_ws('|',
               COALESCE(trim(housenumber), ''),
               COALESCE(trim(street), ''),
               COALESCE(postcode, ''),
               COALESCE(city, ''),
               COALESCE(CAST(CASE WHEN levels = 0 THEN NULL ELSE levels END AS VARCHAR), ''),
               COALESCE(CAST(round(ele, 2) AS VARCHAR), ''),
               COALESCE(CAST(round(height, 2) AS VARCHAR), ''),
               bldg_type,
               CAST(no_addrs AS VARCHAR)) AS line
      FROM pdx_bldgs
    ) l
    GROUP BY qtrsec
    """,
)
def q_tile_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return tile_export_df(pdx_bldgs_df(spark, sf_dir))


def tile_export_df(pdx: DataFrame) -> DataFrame:
    line = F.concat_ws(
        "|",
        F.coalesce(F.trim(F.col("housenumber")), F.lit("")),
        F.coalesce(F.trim(F.col("street")), F.lit("")),
        F.coalesce(F.col("postcode"), F.lit("")),
        F.coalesce(F.col("city"), F.lit("")),
        F.coalesce(F.nullif(F.col("levels"), F.lit(0)).cast("string"), F.lit("")),
        F.coalesce(F.round(F.col("ele"), 2).cast("string"), F.lit("")),
        F.coalesce(F.round(F.col("height"), 2).cast("string"), F.lit("")),
        F.col("bldg_type"),
        F.col("no_addrs").cast("string"),
    )
    return (
        pdx.select("qtrsec", line.alias("line"))
        .groupBy("qtrsec")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.array_join(F.array_sort(F.collect_list("line")), "\n").alias("payload"),
        )
    )


# S6/S7 under the driver's gate: the ACTUAL artifact writer (simplify →
# XML serialize → sha256 → atomic rename) runs, and its manifest's
# per-tile feature AND node counts are oracle-checked. The input rings
# are 4-densified rectangles (exactly-collinear inserted vertices,
# exports.densified_rect_rings_expr), so the export's G5 simplify step
# is load-bearing: the oracle expects exactly 4 nodes per feature —
# a broken tolerance leaves 16, a broken collapse guard drops below 4,
# and a serializer regression changes n_features. Byte-level sha256
# stability is pinned by pytest (tests/test_exports.py); the
# driver-visible projection is the DuckDB-computable subset.
@register(
    "tile_artifacts",
    OC.with_prefix(OC.PDX_BLDGS_CTES)
    + """
    SELECT qtrsec,
           CAST(COUNT(*) AS INT) AS n_features,
           CAST(4 * COUNT(*) AS BIGINT) AS n_nodes
    FROM pdx_bldgs
    GROUP BY qtrsec
    """,
)
def q_tile_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .exports import artifact_dir, pdx_tile_artifacts

    views(spark, sf_dir)
    out_dir = artifact_dir("pdxbldg_artifacts", sf_dir)
    manifest = pdx_tile_artifacts(spark, sf_dir, out_dir, densify_k=4)
    return manifest.select("qtrsec", "n_features", "n_nodes")


# S9 changeset batching (scripts/add_addrs.rb:26-57): one ordered batch
# per postcode-analog, sequence numbers pinned.
@register(
    "changesets",
    OC.with_prefix(OC.PDX_BLDGS_CTES, FILL_CTES, bases=("osm_ways_base",))
    + """
    SELECT m.way_id, b.postcode,
           ROW_NUMBER() OVER (PARTITION BY b.postcode
                              ORDER BY m.addr_street, m.addr_housenumber, m.way_id) AS seq
    FROM merged m JOIN pdx_bldgs b ON b.bldg_id = m.bldg_id
    """,
)
def q_changesets(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    merged = q_fill_only_merge(spark, sf_dir)
    pdx = pdx_bldgs_df(spark, sf_dir).select("bldg_id", "postcode")
    w = Wnd.partitionBy("postcode").orderBy(
        F.col("addr_street").asc(), F.col("addr_housenumber").asc(), F.col("way_id").asc()
    )
    return (
        merged.join(pdx, "bldg_id")
        .select("way_id", "postcode", F.row_number().over(w).alias("seq"))
    )


# ----------------------------------------------------------------------
# S8 + J10/G10: tile consolidation — the consolidated_qtr_secs manifest
# (tasks/metro_quarter_secs.rake:44-107, max_bldgs=50; shipped artifact
# /root/reference/consolidated_qtr_secs.json). The reference's greedy
# nearest-neighbor merge is iterative/unpinned; the engine re-expresses
# it deterministically: within each coarser parent tile (RES_TILE-2),
# subtiles are packed in tile-id (Z-ish scan) order into bins of ≤~50
# buildings by prefix-count binning — a pure window cumsum, identical in
# Spark and the SQL oracle, and embarrassingly parallel across parents
# at 10^12-doc scale (no global sequential merge).
MAX_BLDGS = 50


@register(
    "consolidated_tiles",
    OC.with_prefix(OC.PDX_BLDGS_CTES, METRO_CTES,
                   bases=("footprints_base", "osm_ways_base"))
    + f"""
    , tile_counts AS (
      SELECT qtrsec, COUNT(*) AS bldg_count
      FROM metro_marked WHERE NOT is_deleted GROUP BY qtrsec
    ), binned AS (
      SELECT qtrsec, bldg_count,
             (qtrsec // 32 // 4) * 8 + (qtrsec % 32) // 4 AS parent,
             (SUM(bldg_count) OVER (
                PARTITION BY (qtrsec // 32 // 4) * 8 + (qtrsec % 32) // 4
                ORDER BY qtrsec) - bldg_count) // {MAX_BLDGS} AS bin
      FROM tile_counts
    )
    SELECT CAST(parent * 100 + bin AS BIGINT) AS ctile_id,
           string_agg(CAST(qtrsec AS VARCHAR), ',' ORDER BY qtrsec) AS contains,
           CAST(COUNT(*) AS INT) AS n_tiles,
           CAST(SUM(bldg_count) AS BIGINT) AS bldg_count,
           MIN({C.LON_W!r} + (qtrsec % 32) * {C.SPAN_X!r} / 32e0) AS x0,
           MIN({C.LAT_S!r} + (qtrsec // 32) * {C.SPAN_Y!r} / 32e0) AS y0,
           MAX({C.LON_W!r} + ((qtrsec % 32) + 1) * {C.SPAN_X!r} / 32e0) AS x1,
           MAX({C.LAT_S!r} + ((qtrsec // 32) + 1) * {C.SPAN_Y!r} / 32e0) AS y1
    FROM binned
    GROUP BY parent, bin
    """,
)
def q_consolidated_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    kept = metro_marked_df(spark, sf_dir).where(~F.col("is_deleted"))
    counts = kept.groupBy("qtrsec").agg(F.count(F.lit(1)).alias("bldg_count"))
    parent = (F.col("qtrsec") / 32 / 4).cast("long") * 8 + ((F.col("qtrsec") % 32) / 4).cast("long")
    w = Wnd.partitionBy("parent").orderBy("qtrsec")
    binned = (
        counts.withColumn("parent", parent)
        .withColumn(
            "bin",
            F.floor((F.sum("bldg_count").over(w) - F.col("bldg_count")) / MAX_BLDGS),
        )
    )
    ix = F.col("qtrsec") % 32
    iy = F.floor(F.col("qtrsec") / 32)
    return (
        binned.groupBy("parent", "bin")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("qtrsec")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("contains"),
            F.count(F.lit(1)).cast("int").alias("n_tiles"),
            F.sum("bldg_count").alias("bldg_count"),
            F.min(F.lit(C.LON_W) + ix * F.lit(C.SPAN_X) / F.lit(32.0)).alias("x0"),
            F.min(F.lit(C.LAT_S) + iy * F.lit(C.SPAN_Y) / F.lit(32.0)).alias("y0"),
            F.max(F.lit(C.LON_W) + (ix + 1) * F.lit(C.SPAN_X) / F.lit(32.0)).alias("x1"),
            F.max(F.lit(C.LAT_S) + (iy + 1) * F.lit(C.SPAN_Y) / F.lit(32.0)).alias("y1"),
        )
        .select(
            (F.col("parent") * 100 + F.col("bin")).alias("ctile_id"),
            "contains", "n_tiles", "bldg_count", "x0", "y0", "x1", "y1",
        )
    )


# ----------------------------------------------------------------------
# A5 + G2: multipolygon relation assembly (tasks/osm_buildings.rake:40-99
# — array_agg(ST_LineMerge(linestring)) per (relation_id, member_role),
# then ST_MakePolygon with inner rings). The engine collects member
# rings ordered by seq (order-sensitive geometry assembly → sort inside
# the agg, SURVEY.md A5 note), assembles the multi-ring polygon, and
# computes its envelope through the geometry kernel; tag filter is the
# relation branch of P1/P2.
@register(
    "osm_relations",
    synth.oracle_with("osm_rel_members_base")
    + """
    SELECT relation_id,
           ANY_VALUE(t_building) AS building,
           CAST(SUM(CASE WHEN role = 'outer' THEN 1 ELSE 0 END) AS INT) AS n_outer,
           CAST(SUM(CASE WHEN role = 'inner' THEN 1 ELSE 0 END) AS INT) AS n_inner,
           string_agg(CAST(member_id AS VARCHAR), ',' ORDER BY seq) AS members,
           MIN(rx0) AS x0, MIN(ry0) AS y0, MAX(rx1) AS x1, MAX(ry1) AS y1
    FROM osm_rel_members_base
    WHERE t_building <> ''
    GROUP BY relation_id
    """,
)
def q_osm_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return G.with_bbox(
        osm_relations_assembled(spark), "relation_id"
    ).drop("rings")


def osm_relations_assembled(spark: SparkSession) -> DataFrame:
    """Building relations with their assembled multi-ring polygon:
    outer first, holes after, pinned by seq (collect_list order is not
    deterministic — sort_array over (seq, ring) structs makes it
    total). Shared by osm_relations (stats) and rel_artifacts (the
    hole-carrying export)."""
    members = spark.table("osm_rel_members").where(F.col("t_building") != "")
    return (
        members.groupBy("relation_id")
        .agg(
            F.first("t_building").alias("building"),
            F.sum(F.when(F.col("role") == "outer", 1).otherwise(0))
            .cast("int").alias("n_outer"),
            F.sum(F.when(F.col("role") == "inner", 1).otherwise(0))
            .cast("int").alias("n_inner"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seq", "member_id"))),
                    lambda s: s["member_id"].cast("string"),
                ),
                ",",
            ).alias("members"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("seq", "ring"))),
                lambda s: s["ring"][0],
            ).alias("rings"),
        )
    )


# The hole-carrying export under the driver's gate: assembled
# multipolygon relations (outer + inner rings) run through the REAL
# artifact serializer — multi-ring features emit OSM multipolygon
# relations (exports.py G8 path), so every inner ring contributes its
# 4 simplified corners to the artifact's node count. The oracle
# predicts per-tile features and nodes (4 per member rectangle) from
# the relational member table; a serializer that drops holes loses
# 4·n_inner nodes and fails.
@register(
    "rel_artifacts",
    synth.oracle_with("osm_rel_members_base")
    + f"""
    , rel AS (
      SELECT relation_id, COUNT(*) AS n_rings,
             MIN(rx0) AS x0, MIN(ry0) AS y0, MAX(rx1) AS x1, MAX(ry1) AS y1
      FROM osm_rel_members_base
      WHERE t_building <> ''
      GROUP BY relation_id
    )
    SELECT
      CAST(LEAST(GREATEST(FLOOR(((y0 + y1) / 2e0 - ({C.LAT_S!r})) / {C.SPAN_Y!r} * 32e0), 0), 31) AS BIGINT) * 32
      + CAST(LEAST(GREATEST(FLOOR(((x0 + x1) / 2e0 - ({C.LON_W!r})) / {C.SPAN_X!r} * 32e0), 0), 31) AS BIGINT) AS qtrsec,
      CAST(COUNT(*) AS INT) AS n_features,
      CAST(SUM(4 * n_rings) AS BIGINT) AS n_nodes
    FROM rel
    GROUP BY 1
    """,
)
def q_rel_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .exports import artifact_dir, write_tile_artifacts

    views(spark, sf_dir)
    rel = G.with_bbox(osm_relations_assembled(spark), "relation_id")
    feats = rel.select(
        tile_expr(
            (F.col("x0") + F.col("x1")) / 2, (F.col("y0") + F.col("y1")) / 2,
            C.RES_TILE,
        ).alias("qtrsec"),
        F.col("relation_id").alias("bldg_id"),
        "rings",
        F.lit(None).cast("string").alias("housenumber"),
        F.lit(None).cast("string").alias("street"),
        F.lit(None).cast("string").alias("postcode"),
        F.lit(None).cast("string").alias("city"),
        F.lit(None).cast("int").alias("levels"),
        F.lit(None).cast("double").alias("ele"),
        F.lit(None).cast("double").alias("height"),
        F.col("building").alias("bldg_type"),
    )
    out_dir = artifact_dir("pdxbldg_rel_artifacts", sf_dir)
    manifest = write_tile_artifacts(feats, out_dir)
    return manifest.select("qtrsec", "n_features", "n_nodes")


# ----------------------------------------------------------------------
# Ring stats, JVM-side (the r3 verdict's re-shape): n_vertices and the
# per-edge-floored perimeter are EDGE-LOCAL — each fragment edge appears
# in exactly one assembled ring with its length unchanged by reversal —
# so the linear-in-data aggregation runs entirely in whole-stage codegen
# (no Arrow crossing; plan-guarded in tests/test_plans.py). The
# assembly-sensitive invariants (component counts, per-ring vertex
# counts) live in ``rel_ring_assembly`` below, the one query that
# genuinely needs the per-relation Python stitch.
@register(
    "rel_ring_stats",
    synth.oracle_with("osm_way_segments_base")
    + """
    SELECT relation_id,
      CAST(COUNT(*) AS INT) AS n_vertices,
      CAST(SUM(CAST(FLOOR(SQRT(
        (bx - ax) * (bx - ax) * 1e12 + (by - ay) * (by - ay) * 1e12
      )) AS BIGINT)) AS BIGINT) AS perim_udeg
    FROM osm_way_segments_base
    GROUP BY relation_id
    """,
)
def q_rel_ring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    segs = spark.table("osm_way_segments_base")
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    # identical IEEE expression tree to the oracle SQL: ((dx*dx)*1e12)
    # left-assoc, floor before the integer sum
    edge = F.floor(F.sqrt(dx * dx * F.lit(1e12) + dy * dy * F.lit(1e12)))
    return segs.groupBy("relation_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_vertices"),
        F.sum(edge.cast("long")).alias("perim_udeg"),
    )


# G2 linemerge: relation outer rings arrive as OPEN way fragments in
# scrambled order/orientation (reference: array_agg(ST_LineMerge(geom))
# before ST_MakePolygon, tasks/osm_buildings.rake:40-52). The engine
# stitches per relation (groupBy collect_list → one Arrow batch of
# relations per Python call; geo/linemerge.py kernel) and reports the
# ASSEMBLY-sensitive
# invariants: component count, open-chain count, per-ring vertex
# bounds. The oracle predicts them from the synth world's structure
# (doc_id%2=0 relations carry a second fragmented ring; every ring is a
# 4-edge rectangle). A dropped, duplicated, or mis-joined fragment
# changes n_rings/n_open/ring_nv and fails the gate; ring-equality
# itself is property-tested in tests/test_linemerge.py.
@register(
    "rel_ring_assembly",
    synth.oracle_with("osm_way_segments_base")
    + """
    SELECT relation_id,
      CAST(CASE WHEN relation_id % 2 = 0 THEN 2 ELSE 1 END AS INT) AS n_rings,
      CAST(0 AS INT) AS n_open,
      CAST(4 AS INT) AS ring_nv_min,
      CAST(4 AS INT) AS ring_nv_max
    FROM (SELECT DISTINCT relation_id FROM osm_way_segments_base) r
    """,
)
def q_rel_ring_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    views(spark, sf_dir)
    segs = spark.table("osm_way_segments_base").select(
        "relation_id", "ax", "ay", "bx", "by"
    )
    schema = T.StructType(
        [
            T.StructField("relation_id", T.LongType()),
            T.StructField("n_rings", T.IntegerType()),
            T.StructField("n_open", T.IntegerType()),
            T.StructField("ring_nv_min", T.IntegerType()),
            T.StructField("ring_nv_max", T.IntegerType()),
        ]
    )

    # r6: the r5 groupBy().applyInPandas ran the stitch one pandas
    # DataFrame per RELATION — ~2 ms of grouped-map machinery per
    # ~6-segment group dwarfed the kernel (measured sf1.0: 9.5 s for
    # 4.5k relations). Contract each relation to one row with a JVM
    # collect_list agg (same exchange), then stitch a whole Arrow batch
    # of relations per Python call (guide §4.1: iterator-of-batches,
    # not row/group-at-a-time). 9.5 s → 0.74 s, identical output.
    agg = segs.groupBy("relation_id").agg(
        F.collect_list(F.array("ax", "ay", "bx", "by")).alias("chs")
    )

    def assemble_batches(it):
        import numpy as np
        import pyarrow as pa

        from .geo.linemerge import merge_chains

        for batch in it:
            rels = batch.column(0).to_pylist()
            chss = batch.column(1).to_pylist()
            nr, no, mn, mx = [], [], [], []
            for chs in chss:
                rings, opens = merge_chains([np.asarray(c) for c in chs])
                nvs = [len(r) // 2 - 1 for r in rings]
                nr.append(len(rings))
                no.append(len(opens))
                mn.append(min(nvs) if nvs else 0)
                mx.append(max(nvs) if nvs else 0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rels, pa.int64()),
                    pa.array(nr, pa.int32()),
                    pa.array(no, pa.int32()),
                    pa.array(mn, pa.int32()),
                    pa.array(mx, pa.int32()),
                ],
                schema.fieldNames(),
            )

    return agg.mapInArrow(assemble_batches, schema)
