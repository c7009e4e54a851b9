"""r6: the broadcast rank-array verify and the shuffle inverted-index
fallback must produce identical rows for every refine consumer (the
gate only switches the physical strategy, never the result)."""
from __future__ import annotations

import pytest

from pdxbldgimport_spark import queries_text as QT
from pdxbldgimport_spark import registry as Q

SF = "/root/testdata/sf0.001"

REFINE_QUERIES = [
    "dedup_prefix_filter",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
]


def _rows(spark, name):
    df = Q.QUERIES[name](spark, SF)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", REFINE_QUERIES)
def test_refine_fallback_matches_broadcast_path(spark, name, monkeypatch):
    fast = _rows(spark, name)
    monkeypatch.setattr(QT, "PF_BCAST_MAX_DOCS", 0)
    monkeypatch.setattr(QT, "JR_BCAST_MAX_DOCS", 0)
    slow = _rows(spark, name)
    assert fast == slow, (
        f"{name}: broadcast path {len(fast)} rows != fallback {len(slow)}"
    )
    assert fast, f"{name}: empty result proves nothing at {SF}"


def test_positional_filter_is_lossless(spark, monkeypatch):
    """Dropping the PPJoin positional filter must not change the result
    (it is an upper-bound prune): compare against a run where the bound
    is effectively disabled by patching PF_T10's pair threshold via the
    module-level constant used in the inequality. Here we instead verify
    the engine result against the algorithm-independent brute-force
    (every pair, exact Jaccard) on the smoke SF."""
    from itertools import combinations

    rows = spark.table("documents").select("doc_id", "text").collect()
    QT.views(spark, SF)
    rows = spark.table("documents").select("doc_id", "text").collect()

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {r["doc_id"]: shingles(r["text"]) for r in rows}
    expect = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter * 10 >= QT.PF_T10 * union:
            expect.add((a, b, inter, union))
    got = {tuple(r) for r in Q.QUERIES["dedup_prefix_filter"](spark, SF).collect()}
    assert got == expect
