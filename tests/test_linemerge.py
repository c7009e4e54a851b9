"""G2 linemerge kernel: property tests (fragment → shuffle/reverse →
stitch recovers the ring), multi-component separation, branching-
junction safety, and the oracle-gated rel_ring_stats query shape."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pdxbldgimport_spark.geo.linemerge import canon_ring, merge_chains


def _random_ring(rng, n):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.3, 1.0, n)
    xs, ys = rad * np.cos(ang), rad * np.sin(ang)
    return np.column_stack(
        [np.append(xs, xs[0]), np.append(ys, ys[0])]
    ).ravel()


def _fragment(rng, ring, k):
    """Split a closed ring into k open chains at random cut vertices,
    randomly reversed, in random order."""
    nv = len(ring) // 2 - 1  # distinct vertices
    cuts = np.sort(rng.choice(nv, size=k, replace=False))
    pts = ring.reshape(-1, 2)[:-1]
    rolled = np.roll(pts, -cuts[0], axis=0)
    cuts = cuts - cuts[0]
    chains = []
    for i in range(k):
        lo = cuts[i]
        hi = cuts[i + 1] if i + 1 < k else nv
        if hi < nv:
            seg = rolled[lo : hi + 1]
        else:  # last chain wraps back to the cut origin
            seg = np.vstack([rolled[lo:], rolled[:1]])
        chain = seg.ravel()
        if rng.random() < 0.5:
            chain = seg[::-1].ravel()
        chains.append(chain)
    order = rng.permutation(k)
    return [chains[i] for i in order]


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_fragment_roundtrip_single_ring(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 24))
    ring = _random_ring(rng, n)
    k = int(rng.integers(2, min(n, 7)))
    rings, opens = merge_chains(_fragment(rng, ring, k))
    assert opens == []
    assert len(rings) == 1
    assert canon_ring(rings[0]) == canon_ring(ring)


def test_two_components_separate():
    rng = np.random.default_rng(5)
    r1 = _random_ring(rng, 8)
    r2 = _random_ring(rng, 6) + 10.0  # disjoint
    frags = _fragment(rng, r1, 3) + _fragment(rng, r2, 2)
    order = rng.permutation(len(frags))
    rings, opens = merge_chains([frags[i] for i in order])
    assert opens == []
    assert {canon_ring(r) for r in rings} == {canon_ring(r1), canon_ring(r2)}


def test_already_closed_passthrough():
    ring = np.array([0, 0, 1, 0, 1, 1, 0, 1, 0, 0], float)
    rings, opens = merge_chains([ring])
    assert opens == [] and len(rings) == 1
    assert np.array_equal(rings[0], ring)


def test_open_chain_stays_open():
    chain = np.array([0, 0, 1, 0, 1, 1], float)
    rings, opens = merge_chains([chain])
    assert rings == [] and len(opens) == 1


def test_branching_junction_never_merged_through():
    """Three chains meeting at one point (a T junction): ST_LineMerge
    must not pick an arbitrary pairing — nothing merges through it."""
    a = np.array([0, 0, 1, 1], float)
    b = np.array([1, 1, 2, 0], float)
    c = np.array([1, 1, 2, 2], float)
    rings, opens = merge_chains([a, b, c])
    assert rings == []
    # no output chain contains more than one input's span
    assert len(opens) == 3


def test_rel_ring_assembly_matches_structure(spark):
    """Engine assembly over the synth fragment world: every relation
    closes into the structural ring count (1, or 2 for even ids) with
    no open chains and 4-vertex rings; the edge-local stats query
    agrees on vertex counts."""
    from pdxbldgimport_spark.queries_osm import (
        q_rel_ring_assembly,
        q_rel_ring_stats,
    )

    got = q_rel_ring_assembly(spark, "/root/testdata/sf0.001").collect()
    assert got
    for r in got:
        want = 2 if r["relation_id"] % 2 == 0 else 1
        assert r["n_rings"] == want
        assert r["n_open"] == 0
        assert r["ring_nv_min"] == r["ring_nv_max"] == 4
    stats = {
        r["relation_id"]: r
        for r in q_rel_ring_stats(spark, "/root/testdata/sf0.001").collect()
    }
    for r in got:
        s = stats[r["relation_id"]]
        assert s["n_vertices"] == 4 * r["n_rings"]
        assert s["perim_udeg"] > 0
