"""connected_components (alternating large-star/small-star) vs a
brute-force union-find twin on seeded random graphs, plus the shapes
that stress convergence (long paths need multiple rounds; the star
fixpoint must label every child with the component min)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pdxbldgimport_spark.operators.components import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # label = min node id of the component
    roots = {}
    for x in range(n_nodes):
        r = find(x)
        roots[r] = min(roots.get(r, r), x)
    return {x: roots[find(x)] for x in range(n_nodes)}


def _run(spark, n_nodes, edges):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    if edges:
        e = spark.createDataFrame(edges, "u long, v long")
    else:
        e = nodes.select(
            F.col("doc_id").alias("u"), F.col("doc_id").alias("v")
        ).limit(0)
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(nodes, e).collect()
    }
    assert got == _union_find(n_nodes, edges)


def test_components_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randrange(20, 80)
        m = rng.randrange(0, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]  # self-loops and duplicates included on purpose
        _run(spark, n, edges)


def test_components_long_path_multi_round(spark):
    # a 64-node path has diameter 63: naive label propagation needs 63
    # rounds, star contraction O(log n) — MAX_ROUNDS=25 only converges
    # here if the contraction actually halves distances each round.
    n = 64
    _run(spark, n, [(i, i + 1) for i in range(n - 1)])


def test_components_isolated_and_empty(spark):
    _run(spark, 10, [])
    _run(spark, 10, [(3, 3), (4, 4)])  # self-loops only → all isolated


def test_components_two_stars_share_min(spark):
    # two hubs joined by one bridge: every node must take the global min
    edges = [(0, k) for k in range(1, 6)] + [(10, k) for k in range(11, 16)]
    edges.append((5, 15))
    _run(spark, 16, edges)
