"""Property and invariant tests for the spatial-analytics family
(queries_spatial.py): dwithin completeness vs brute force, exact
distributed rank vs pandas, STR packing invariants, Moran's I sign on
the hot-parcel world, and curriculum permutation/balance properties."""

from __future__ import annotations

import math
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdxbldgimport_spark.geo import cells as C
from pdxbldgimport_spark.operators.knn import RES_KNN, dwithin_pairs
from pdxbldgimport_spark.operators.ranking import global_rank
from pdxbldgimport_spark.queries_spatial import (
    CURR_NSHARDS,
    STR_LEAF_B,
    q_curriculum_order,
    q_str_pack,
    q_tile_moran,
)

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------------------------
# dwithin_pairs vs brute force — including points a hair from cell
# boundaries (the case an unringed equi-join drops).


@pytest.mark.parametrize("seed", [0, 1])
def test_dwithin_vs_bruteforce(spark, seed):
    rng = np.random.default_rng(seed)
    n_pts, n_cand, radius = 400, 120, 0.03
    n = 1 << RES_KNN
    lon = rng.uniform(C.LON_W, C.LON_E, n_pts)
    lat = rng.uniform(C.LAT_S, C.LAT_N, n_pts)
    gx = C.LON_W + rng.integers(1, n, n_pts // 2) * (C.SPAN_X / n)
    gy = C.LAT_S + rng.integers(1, n, n_pts // 2) * (C.SPAN_Y / n)
    eps = rng.choice([-1e-12, 0.0, 1e-12], n_pts // 2)
    lon[: n_pts // 2] = gx + eps
    lat[: n_pts // 2] = gy - eps
    pts = pd.DataFrame(
        {"page_id": np.arange(n_pts, dtype=np.int64), "lon": lon, "lat": lat}
    )
    cents = pd.DataFrame(
        {
            "fp_id": np.arange(n_cand, dtype=np.int64),
            "centroid_lon": rng.uniform(C.LON_W, C.LON_E, n_cand),
            "centroid_lat": rng.uniform(C.LAT_S, C.LAT_N, n_cand),
        }
    )
    got = (
        dwithin_pairs(
            spark.createDataFrame(pts), spark.createDataFrame(cents), radius
        )
        .select("page_id", "fp_id")
        .toPandas()
    )
    got_set = set(map(tuple, got.to_numpy()))
    d2 = (pts.lon.to_numpy()[:, None] - cents.centroid_lon.to_numpy()) ** 2 + (
        pts.lat.to_numpy()[:, None] - cents.centroid_lat.to_numpy()
    ) ** 2
    want = {
        (int(pts.page_id[i]), int(cents.fp_id[j]))
        for i, j in zip(*np.nonzero(d2 <= radius * radius))
    }
    assert got_set == want


def test_dwithin_rejects_radius_beyond_ring_guarantee(spark):
    pts = spark.createDataFrame(
        pd.DataFrame({"page_id": [0], "lon": [-122.0], "lat": [45.0]})
    )
    with pytest.raises(ValueError):
        dwithin_pairs(pts, pts.selectExpr("page_id as fp_id", "lon as centroid_lon", "lat as centroid_lat"), 0.5)


# ----------------------------------------------------------------------
# global_rank: exact vs pandas, global and partitioned, with heavy ties
# on the leading key (pinned by id).


@pytest.mark.parametrize("seed", [0, 1])
def test_global_rank_matches_pandas(spark, seed):
    rng = np.random.default_rng(seed)
    n = 3000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 40, n).astype(np.int64),  # heavy ties
            "g": rng.integers(0, 3, n).astype(np.int64),
        }
    )
    sdf = spark.createDataFrame(df).repartition(8)
    got = (
        global_rank(
            sdf,
            bucket=F.expr("v div 8"),
            order_cols=[F.col("v"), F.col("id")],
            rank_col="r",
        )
        .select("id", "r")
        .toPandas()
        .set_index("id")["r"]
    )
    want = (
        df.sort_values(["v", "id"]).reset_index(drop=True).reset_index()
        .set_index("id")["index"]
    )
    assert got.sort_index().equals(want.sort_index().astype(np.int64))

    got_p = (
        global_rank(
            sdf,
            bucket=F.expr("v div 8"),
            order_cols=[F.col("v"), F.col("id")],
            rank_col="r",
            partition_cols=["g"],
        )
        .select("id", "r")
        .toPandas()
        .set_index("id")["r"]
    )
    want_p = (
        df.sort_values(["v", "id"])
        .groupby("g")
        .cumcount()
        .rename("r")
    )
    # cumcount follows original index after the sort; align by id
    want_p = pd.Series(
        want_p.to_numpy(), index=df.sort_values(["v", "id"]).id.to_numpy()
    )
    assert got_p.sort_index().equals(
        want_p.sort_index().astype(np.int64).rename("r")
    )


# ----------------------------------------------------------------------
# str_pack invariants: leaf capacity respected, slices are contiguous
# equal-count x-rank bands, node ids nest within slices.


def test_str_pack_invariants(spark):
    out = q_str_pack(spark, SF).toPandas()
    n = len(out)
    s = int(np.ceil(np.sqrt(n / float(STR_LEAF_B))))
    p = (n + s - 1) // s
    nps = (p + STR_LEAF_B - 1) // STR_LEAF_B
    # slice sizes: every slice full (== p) except possibly the last
    sizes = out.groupby("slice").size().sort_index()
    assert (sizes.iloc[:-1] == p).all()
    assert 0 < sizes.iloc[-1] <= p
    # node capacity and nesting
    node_sizes = out.groupby("node_id").size()
    assert node_sizes.max() <= STR_LEAF_B
    assert (out.node_id // nps == out.slice).all()


# ----------------------------------------------------------------------
# tile_moran: the synthetic world plants a hot parcel (~1/7 of pages) —
# density must be positively autocorrelated, and the components must
# reproduce a direct numpy Moran over the same tile counts.


def test_tile_moran_positive_and_exact(spark):
    row = q_tile_moran(spark, SF).collect()[0]
    assert row.w_sum > 0 and row.sum_sq > 0
    moran = (row.n_tiles * row.sum_cross) / (row.w_sum * row.sum_sq)
    assert moran > 0.05, moran

    # independent numpy recomputation from raw pages
    from pdxbldgimport_spark.queries import views

    views(spark, SF)
    res = C.RES_TILE
    n = 1 << res
    pg = spark.table("pages").select("lon", "lat").toPandas()
    ix = np.clip(
        np.floor((pg.lon.to_numpy() - C.LON_W) / C.SPAN_X * n), 0, n - 1
    ).astype(np.int64)
    iy = np.clip(
        np.floor((pg.lat.to_numpy() - C.LAT_S) / C.SPAN_Y * n), 0, n - 1
    ).astype(np.int64)
    t, c = np.unique(iy * n + ix, return_counts=True)
    nt = len(t)
    dev = {int(ti): int(nt * ci - c.sum()) for ti, ci in zip(t, c)}
    w_sum = sum_cross = 0
    for ti, d in dev.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            x, y = ti % n + dx, ti // n + dy
            if 0 <= x < n and 0 <= y < n and (y * n + x) in dev:
                w_sum += 1
                sum_cross += d * dev[y * n + x]
    assert (row.n_tiles, row.w_sum, row.sum_cross) == (nt, w_sum, sum_cross)
    assert row.sum_sq == sum(d * d for d in dev.values())


# ----------------------------------------------------------------------
# curriculum_order: positions are a permutation, order respects quality
# buckets, shards are balanced to within one row.


def test_curriculum_order_properties(spark):
    out = q_curriculum_order(spark, SF).toPandas().sort_values("pos")
    n = len(out)
    assert (out.pos.to_numpy() == np.arange(n)).all()
    assert (np.diff(out.qb.to_numpy()) >= 0).all()  # curriculum-graded
    sizes = out.groupby("shard").size()
    assert len(sizes) == CURR_NSHARDS
    assert sizes.max() - sizes.min() <= 1
    assert (out.shard.to_numpy() == (out.pos.to_numpy() * CURR_NSHARDS) // n).all()


# ----------------------------------------------------------------------
# zonal_stats: consistent with the flagship PIP assignment; quota
# sample: exact per-tile caps, deterministic.


def test_zonal_stats_consistent_with_pip_assign(spark):
    from pdxbldgimport_spark.queries import q_pip_assign
    from pdxbldgimport_spark.queries_spatial import q_zonal_stats

    z = q_zonal_stats(spark, SF).toPandas()
    n_assigned = q_pip_assign(spark, SF).count()
    assert int(z.n_pages.sum()) == n_assigned
    assert (z.max_len <= z.sum_len).all()


def test_tile_quota_sample_caps_and_determinism(spark):
    from pdxbldgimport_spark.queries_spatial import (
        TILE_QUOTA,
        q_tile_quota_sample,
    )

    a = q_tile_quota_sample(spark, SF).toPandas()
    per_tile = a.groupby("tile_id").size()
    assert per_tile.max() <= TILE_QUOTA
    assert (a.groupby("tile_id")["rnk"].max() + 1 == per_tile).all()
    b = q_tile_quota_sample(spark, SF).toPandas()
    key = ["tile_id", "page_id", "rnk"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_dwithin_shuffle_path_equals_broadcast_path(spark):
    """Force the over-gate shuffle route (broadcast_max_ring_rows=0) and
    assert it produces the identical pair set — the same fallback-parity
    discipline as the PIP cover gate test."""
    rng = np.random.default_rng(7)
    n_pts, n_cand, radius = 300, 90, 0.03
    pts = pd.DataFrame(
        {
            "page_id": np.arange(n_pts, dtype=np.int64),
            "lon": rng.uniform(C.LON_W, C.LON_E, n_pts),
            "lat": rng.uniform(C.LAT_S, C.LAT_N, n_pts),
        }
    )
    cents = pd.DataFrame(
        {
            "fp_id": np.arange(n_cand, dtype=np.int64),
            "centroid_lon": rng.uniform(C.LON_W, C.LON_E, n_cand),
            "centroid_lat": rng.uniform(C.LAT_S, C.LAT_N, n_cand),
        }
    )
    sp, sc = spark.createDataFrame(pts), spark.createDataFrame(cents)
    a = set(
        map(
            tuple,
            dwithin_pairs(sp, sc, radius)
            .select("page_id", "fp_id")
            .toPandas()
            .to_numpy(),
        )
    )
    # over-gate: the hint is dropped; with broadcast also disabled at
    # the planner level the join must take the real shuffle route
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        b_df = dwithin_pairs(sp, sc, radius, broadcast_max_ring_rows=0)
        plan = b_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # the gate actually rerouted
        b = set(
            map(tuple, b_df.select("page_id", "fp_id").toPandas().to_numpy())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert a == b and len(a) > 0


def test_snap_to_segment_matches_numpy_bruteforce(spark):
    """snap_to_segment vs an all-pairs numpy brute force (no cell ring,
    no bbox prefilter) at sf0.001 — certifies the midpoint-2-ring
    coverage guarantee and the clamped-projection arithmetic end to
    end, independent of both engines' SQL formulations."""
    import numpy as np
    import pandas as pd

    from pdxbldgimport_spark.queries_spatial import SNAP_DEG, _SNAP_R2
    from pdxbldgimport_spark import registry as Q
    from pdxbldgimport_spark.synth import render
    import duckdb

    eng = (
        Q.QUERIES["snap_to_segment"](spark, SF)
        .toPandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    for t in ["documents"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    pages = con.sql(
        "SELECT page_id, lon, lat FROM (" + render("pages", "duckdb") + ")"
    ).df()
    segs = con.sql(
        "SELECT way_id, wx0, wy0, wx1, wy1 FROM ("
        + render("osm_ways_base", "duckdb")
        + ")"
    ).df()
    con.close()

    px = pages["lon"].to_numpy()[:, None]
    py = pages["lat"].to_numpy()[:, None]
    ax = segs["wx0"].to_numpy()[None, :]
    ay = segs["wy0"].to_numpy()[None, :]
    qx = segs["wx1"].to_numpy()[None, :]
    qy = segs["wy1"].to_numpy()[None, :]
    len2 = (qx - ax) * (qx - ax) + (qy - ay) * (qy - ay)
    t = ((px - ax) * (qx - ax) + (py - ay) * (qy - ay)) / len2
    t = np.clip(t, 0.0, 1.0)
    dx = px - (ax + t * (qx - ax))
    dy = py - (ay + t * (qy - ay))
    d2 = dx * dx + dy * dy

    within = d2 <= _SNAP_R2
    assert within.any()
    # both clamp regimes and the interior projection are live fixtures
    snapped_t = t[within]
    assert (snapped_t == 0.0).any() or (snapped_t == 1.0).any()
    assert ((snapped_t > 0.0) & (snapped_t < 1.0)).any()

    # per-page argmin with (d2, way_id) tie-break; pages with no
    # segment within SNAP_DEG must be absent from the engine output
    way_ids = segs["way_id"].to_numpy()
    order = np.argsort(way_ids)  # way_id ascending for the tie-break
    d2o, wo = d2[:, order], way_ids[order]
    best_idx = np.argmin(d2o, axis=1)  # first (lowest way_id) min
    rows = []
    for i, pid in enumerate(pages["page_id"].to_numpy()):
        j = best_idx[i]
        if d2o[i, j] <= _SNAP_R2:
            rows.append((pid, wo[j], math.floor(d2o[i, j] * 1e12)))
    bf = (
        pd.DataFrame(rows, columns=["page_id", "way_id", "d2_e12"])
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    assert len(eng) == len(bf)
    assert (eng["page_id"].to_numpy() == bf["page_id"].to_numpy()).all()
    assert (eng["way_id"].to_numpy() == bf["way_id"].to_numpy()).all()
    assert (eng["d2_e12"].to_numpy() == bf["d2_e12"].to_numpy()).all()
