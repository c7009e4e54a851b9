"""The reference's conflation rule chain as pure DataFrame stages.

Each function re-expresses one rake ``table`` block (SURVEY.md §2.3-2.4,
§7 step 3). UPDATE/DELETE-in-place chains become functional
recompositions: conditional projections replace UPDATEs, anti-joins
replace DELETE USING, window max replaces the max-area UPDATE…FROM.

All joins here are equi-joins on the parcel key (state_id analog) —
hash/broadcast joins Catalyst plans freely; the only spatial inputs
(centroid → tile) arrive as precomputed scalar columns from the ingest
enrichment pass (operators.geometry.enrich_polys), exactly how the
reference precomputes ``the_geom_centroids``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as Wnd

from ..functions import maps as M

ADDR_COLS = ["address_id", "housenumber", "street", "city", "postcode", "state"]


def pdx_addrs(caddr: DataFrame) -> DataFrame:
    """master_address cleanup (tasks/pdx_shapes.rake:36-104) + pdx_addrs
    build (tasks/pdx_addrs.rake:1-53): street expansion, unit exclusion,
    arterial dedup-delete, Chavez diacritics rename.

    Semantics pinned vs Postgres: initcap = Spark initcap (word =
    space-delimited; '39th' stays '39th', unlike Postgres '39Th')."""
    fname = F.initcap(F.regexp_replace(F.col("fname"), '"', ""))
    fname = F.when(
        fname.rlike(r"(?i)(^|\s+)hwy "), F.regexp_replace(fname, "Hwy", "Highway")
    ).otherwise(fname)
    df = caddr.select(
        F.col("cpid").alias("state_id"),
        F.col("address_id"),
        F.col("housenumber"),
        F.concat_ws(
            " ",
            M.col_expr(F.col("fdpre"), M.DIR_PRE),
            fname,
            M.col_expr(F.col("ftype"), M.STREET_TYPE, default=F.col("ftype")),
            M.col_expr(F.col("fdsuf"), M.DIR_SUF),
        ).alias("street"),
        F.col("postcode"),
        F.initcap(F.col("mail_city")).alias("city"),
        F.lit("OR").alias("state"),
        F.lit("US").alias("country"),
        F.col("lon"),
        F.col("lat"),
    ).where(F.col("unit_no").isNull()).distinct()

    # J9 arterial dedup: DELETE a USING b (tasks/pdx_addrs.rake:28-40)
    other = df.select(
        F.col("state_id"), F.col("housenumber"), F.col("street").alias("street_b")
    )
    doomed = (
        df.join(other, ["state_id", "housenumber"])
        .where((F.col("street") != F.col("street_b")) & F.col("street").isin(M.RENAMED_ARTERIALS))
        .select("address_id")
        .distinct()
    )
    df = df.join(doomed, "address_id", "left_anti")

    # Chavez rename (tasks/pdx_addrs.rake:42-51)
    street = F.col("street")
    for old, new in M.CHAVEZ.items():
        street = F.when(F.col("street") == old, F.lit(new)).otherwise(street)
    return df.withColumn("street", street)


def residential_reclass(bldg_type_raw, bldg_use):
    """P6 residential reclassification (tasks/pdx_shapes.rake:133-138):
    SET bldg_type='Res' WHERE (bldg_type IS NULL OR bldg_type='Not Set')
    AND (bldg_use ILIKE '%Residential%' OR bldg_use ILIKE '%house%').
    Applied at ingest on the raw type column, before the BLDG_TYPE map
    ('Res' → 'residential', tasks/pdx_bldgs.rake:42-55)."""
    unset = bldg_type_raw.isNull() | (bldg_type_raw == "Not Set")
    use = F.lower(bldg_use)
    return F.when(
        unset & (use.contains("residential") | use.contains("house")),
        F.lit("Res"),
    ).otherwise(bldg_type_raw)


def addr_bldg_counts(bldgs_orig: DataFrame, addrs: DataFrame) -> DataFrame:
    """A1 (tasks/pdx_shapes.rake:162-175): per-parcel building count
    NATURAL JOIN address count — only parcels having both survive."""
    b = bldgs_orig.groupBy("state_id").agg(F.count(F.lit(1)).alias("bldg_count"))
    a = addrs.groupBy("state_id").agg(F.count(F.lit(1)).alias("addr_count"))
    return a.join(b, "state_id")


def house_and_garage(bldgs_orig: DataFrame, counts: DataFrame) -> DataFrame:
    """J1 (tasks/pdx_bldgs.rake:12-23): parcels with exactly two buildings
    forming a House+Garage pair. ilike 'House%' / ilike 'Garage'."""
    a = bldgs_orig.select("state_id", F.col("bldg_type_raw").alias("type_a"))
    b = bldgs_orig.select("state_id", F.col("bldg_type_raw").alias("type_b"))
    la = F.lower(F.col("type_a"))
    lb = F.lower(F.col("type_b"))
    pair = (la.startswith("house") & (lb == "garage")) | (
        lb.startswith("house") & (la == "garage")
    )
    return (
        a.join(b, "state_id")
        .join(counts.where(F.col("bldg_count") == 2), "state_id")
        .where(pair)
        .select("state_id", "addr_count")
        .distinct()
    )


def pdx_bldg_view(bldgs: DataFrame, addrs: DataFrame, counts: DataFrame) -> DataFrame:
    """The reusable attribute view (tasks/pdx_bldgs.rake:29-63):
    buildings LEFT JOIN addresses ON parcel, then INNER JOIN counts on the
    *address's* parcel — so buildings on address-less parcels drop out
    (faithful to the reference's join shape). ``bldgs`` must carry
    centroid_lon/centroid_lat (ingest enrichment)."""
    a = addrs.select(
        F.col("state_id"),
        "address_id", "housenumber", "street", "postcode", "city", "state", "country",
    )
    return (
        bldgs.join(a, "state_id", "left")
        .join(counts.withColumnRenamed("state_id", "abc_state_id"),
              F.col("abc_state_id") == F.col("state_id"))
        .select(
            "state_id",
            F.col("bldg_id"),
            "address_id", "housenumber", "street", "postcode", "city", "state", "country",
            F.col("num_story").alias("levels"),
            F.round(F.col("surf_elev") * F.lit(0.3048), 1).alias("ele"),
            F.round(F.col("max_height") * F.lit(0.3048), 1).alias("height"),
            M.col_expr(F.col("bldg_type_raw"), M.BLDG_TYPE, default=F.lit("yes")).alias("bldg_type"),
            F.coalesce(F.col("addr_count"), F.lit(0)).alias("no_addrs"),
            F.coalesce(F.col("bldg_count"), F.lit(0)).alias("bldg_count"),
            F.lit(False).alias("is_deleted"),
            "centroid_lon", "centroid_lat", "area",
        )
    )


def pdx_bldgs(view: DataFrame, hg: DataFrame, tile_col) -> DataFrame:
    """The full pdx_bldgs chain (tasks/pdx_bldgs.rake:65-175):

    1. keep buildings with ≤1 address, or house+garage parcels w/ ≤1 addr;
    2. append address-stripped footprints for multi-address parcels with a
       single building, or house+garage parcels w/ >1 addr (DISTINCT);
    3. null out garage addresses (two UPDATE passes — the second is a
       no-op by construction, kept for parity);
    4. qtrsec := containing tile of the centroid (spatial UPDATE→column);
    5. max-area rule: on 1-address parcels carrying several addressed
       buildings, only the largest keeps its address.

    ``tile_col(lon_col, lat_col)`` computes the tile id column.
    """
    hg_le1 = hg.where(F.col("addr_count") <= 1).select("state_id")
    hg_gt1 = hg.where(F.col("addr_count") > 1).select("state_id")
    hg_all = hg.select("state_id")

    part1 = view.join(hg_le1, "state_id", "left_semi").unionByName(
        view.where(F.col("no_addrs") <= 1)
    ).distinct()
    # (union of the two WHERE branches = OR; distinct collapses overlap)

    strip = [F.lit(None).cast(t).alias(c) for c, t in
             [("address_id", "long"), ("housenumber", "string"), ("street", "string"),
              ("postcode", "string"), ("city", "string"), ("state", "string"),
              ("country", "string")]]
    base2 = view.where((F.col("no_addrs") > 1) & (F.col("bldg_count") == 1)).unionByName(
        view.join(hg_gt1, "state_id", "left_semi")
    )
    part2 = (
        base2.select(
            "state_id", "bldg_id", *strip,
            "levels", "ele", "height", "bldg_type", "no_addrs", "bldg_count",
            # NOTE: the reference's INSERT leaves is_deleted NULL (column
            # default), which makes its own multi-addr stage's
            # `is_deleted=false` filter drop every multi-address building —
            # a dead end in the original pipeline. We pin FALSE so the
            # multi-address operator has live input (documented deviation).
            F.lit(False).alias("is_deleted"),
            "centroid_lon", "centroid_lat", "area",
        )
        .distinct()
    )
    df = part1.select(part2.columns).unionByName(part2)

    # 3. garage null-out (tasks/pdx_bldgs.rake:108-118, 126-136).
    # Materialize the predicate as a column FIRST: nulling address_id
    # in-place would otherwise flip the predicate for later columns.
    df = df.join(hg_all.withColumn("__hg", F.lit(True)), "state_id", "left")
    df = df.withColumn(
        "__gnull",
        (F.lower(F.col("bldg_type")) == "garage")
        & (F.col("address_id").isNotNull() | F.col("__hg").isNotNull()),
    )
    for c in ADDR_COLS:
        typ = "long" if c == "address_id" else "string"
        df = df.withColumn(c, F.when(F.col("__gnull"), F.lit(None).cast(typ)).otherwise(F.col(c)))
    df = df.drop("__hg", "__gnull")

    # 4. qtrsec via centroid tile (tasks/pdx_bldgs.rake:139-144)
    df = df.withColumn("qtrsec", tile_col(F.col("centroid_lon"), F.col("centroid_lat")))

    # 5. max-area rule (tasks/pdx_bldgs.rake:151-175)
    multi = (
        df.where(F.col("street").isNotNull() & (F.col("no_addrs") == 1))
        .groupBy("state_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("state_id")
    )
    mx = (
        df.join(multi, "state_id", "left_semi")
        .groupBy("state_id")
        .agg(F.max("area").alias("max_area"))
    )
    df = df.join(mx, "state_id", "left").withColumn(
        "__hit", F.col("max_area").isNotNull() & (F.col("area") != F.col("max_area"))
    )
    for c in ADDR_COLS:
        typ = "long" if c == "address_id" else "string"
        df = df.withColumn(c, F.when(F.col("__hit"), F.lit(None).cast(typ)).otherwise(F.col(c)))
    return df.drop("max_area", "__hit")


def perturb(lon, lat, key):
    """Deterministic replacement for the reference's random perturbation
    (plpgsql perturb_point, tasks/pdx_multi_addrs.rake:6-18:
    random()*0.00001 per axis). Resumable runs need reproducible geometry,
    so the offset derives from a row key: ((key*p + salt) % 10000)/1e9 ∈
    [0, 1e-5) — same magnitude, pure integer arithmetic (oracle-portable)."""
    ox = ((key * F.lit(6151) + F.lit(1)) % F.lit(10000)).cast("double") / F.lit(1.0e9)
    oy = ((key * F.lit(7919) + F.lit(2)) % F.lit(10000)).cast("double") / F.lit(1.0e9)
    return lon + ox, lat + oy


def multi_addrs(
    mb_all: DataFrame, addrs: DataFrame, inside_pairs: DataFrame
) -> DataFrame:
    """pdx_bldgs_multi_addrs (tasks/pdx_multi_addrs.rake:20-95).

    ``mb_all``: pdx_bldgs output joined back to rings enrichment — needs
    bldg_id, state_id, qtrsec, no_addrs, is_deleted, bldg_type,
    pos_lon/pos_lat (ST_PointOnSurface). ``inside_pairs``: spatial PIP
    pairs (address_id, bldg_id) over no_addrs>1 buildings (J4).

    Branch A (A3 all-inside, rake:38-44): buildings where every one of the
    parcel's addresses falls inside → keep the city's address points.
    Branch B (W1×W2×W3, rake:52-87): rank addresses per parcel, replicate
    the building's interior point no_addrs times, zip-join on (state_id,
    num). Deterministic perturb replaces random() (F10).
    Row_number tie order is pinned with address_id (Postgres leaves it
    unpinned — determinism requirement)."""
    mb = mb_all.where((F.col("no_addrs") > 1) & (F.col("is_deleted") == F.lit(False)))

    # A3: count-of-contained == no_addrs per building
    all_inside = (
        inside_pairs.join(
            mb_all.where(F.col("no_addrs") > 1).select("bldg_id", "no_addrs"), "bldg_id"
        )
        .groupBy("bldg_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.avg("no_addrs").alias("avgn"))
        .where(F.col("cnt") == F.col("avgn"))
        .select("bldg_id")
    )
    out_cols = [
        "pdx_bldg_id", "state_id", "qtrsec",
        "housenumber", "street", "postcode", "city", "state", "lon", "lat",
    ]
    branch_a = (
        mb.join(all_inside, "bldg_id", "left_semi")
        .select("bldg_id", "state_id", "qtrsec")
        .join(
            addrs.select("state_id", "address_id", "housenumber", "street",
                         "postcode", "city", "state", "lon", "lat"),
            "state_id",
        )
    )
    plon, plat = perturb(F.col("lon"), F.col("lat"), F.col("address_id"))
    branch_a = branch_a.select(
        F.col("bldg_id").alias("pdx_bldg_id"), "state_id", "qtrsec",
        "housenumber", "street", "postcode", "city", "state",
        plon.alias("lon"), plat.alias("lat"),
    )

    # W1: rank addresses within parcel
    w = Wnd.partitionBy("state_id").orderBy(F.col("housenumber").asc(), F.col("address_id").asc())
    a_ranked = addrs.select(
        F.row_number().over(w).alias("num"),
        "housenumber", "street", "postcode", "city", "state", "state_id",
    )
    # W2: one interior point per expected address
    b_gen = (
        mb.where(F.col("bldg_type") != "garage")
        .select(
            F.explode(F.sequence(F.lit(1), F.col("no_addrs").cast("int"))).alias("num"),
            "qtrsec", "state_id", F.col("bldg_id"), "pos_lon", "pos_lat",
        )
    )
    done = branch_a.select("state_id").distinct()
    zipped = a_ranked.join(b_gen, ["state_id", "num"]).join(done, "state_id", "left_anti")
    key = F.col("state_id") * F.lit(100) + F.col("num")
    zlon, zlat = perturb(F.col("pos_lon"), F.col("pos_lat"), key)
    branch_b = zipped.select(
        F.col("bldg_id").alias("pdx_bldg_id"), "state_id", "qtrsec",
        "housenumber", "street", "postcode", "city", "state",
        zlon.alias("lon"), zlat.alias("lat"),
    )
    return branch_a.select(out_cols).unionByName(branch_b.select(out_cols))
