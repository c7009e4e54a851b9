"""Property tests for the graph/sketch batch: degree-oriented triangle
counting vs an O(n·m) brute force, Count-Min overcount-only estimates,
and host↔tile affinity sanity on the concentrated synthetic world."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pytest

from pdxbldgimport_spark.queries_spatial import HT_SCALE, q_host_tile_affinity
from pdxbldgimport_spark.queries_web import (
    q_heavy_hitters_cms,
    triangle_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("seed,p", [(0, 0.15), (1, 0.4), (2, 0.05)])
def test_triangle_counts_vs_bruteforce(spark, seed, p):
    rng = np.random.default_rng(seed)
    n = 40
    names = [f"n{i:02d}" for i in range(n)]
    edges = [
        (names[i], names[j])
        for i, j in combinations(range(n), 2)
        if rng.random() < p
    ]
    adj = set(edges)
    per_host = {}
    for a, b in edges:
        for c in names:
            if c > b and (a, c) in adj and (b, c) in adj:
                for h in (a, b, c):
                    per_host[h] = per_host.get(h, 0) + 1
    und = spark.createDataFrame(
        pd.DataFrame(edges, columns=["u", "v"])
    ).repartition(4)
    got = (
        triangle_counts(und)
        .toPandas()
        .set_index("host")["n_tri"]
        .to_dict()
    )
    assert got == per_host


def test_cms_overcounts_only_and_rows_conserve(spark):
    out = q_heavy_hitters_cms(spark, SF).toPandas()
    assert len(out) > 0
    assert (out.est_count >= out.true_count).all()
    # the sketch is a frequency summary: per hash row the cells sum to
    # the corpus size, so est ≤ total pages always
    total = int(out.true_count.sum())
    assert (out.est_count <= total).all()


def test_host_tile_affinity_concentration(spark):
    out = q_host_tile_affinity(spark, SF).toPandas()
    assert len(out) > 0
    # every host's pages live in one parcel (synth world) — each host's
    # best tile must show positive association (pmi_scaled > SCALE means
    # c_ht·N > c_h·c_t)
    best = out.groupby("host")["pmi_scaled"].max()
    assert (best > HT_SCALE).mean() > 0.9
