"""lm_score_filter: engine output must equal a literal Python bigram-LM
scorer (same pruning, same integer floor arithmetic) over the corpus —
independent of the DuckDB oracle's SQL formulation."""

from __future__ import annotations

from collections import defaultdict

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.queries_text import LM_KEEP_MIN, LM_MIN, LM_SCALE
from tests.conftest import SF_SMOKE


def test_lm_score_filter_matches_python(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.table("documents").select("doc_id", "text").collect()
    }
    cxy: dict = defaultdict(int)
    cx: dict = defaultdict(int)
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            cxy[(a, b)] += 1
            cx[a] += 1
    lm = {
        k: LM_SCALE * c // cx[k[0]] for k, c in cxy.items() if c >= LM_MIN
    }
    expect = {}
    for doc_id, toks in docs.items():
        bgs = list(zip(toks, toks[1:]))
        assert bgs, "every synth doc must have >= 2 tokens"
        s = sum(lm.get(b, 0) for b in bgs) // len(bgs)
        expect[doc_id] = (len(bgs), s, 1 if s >= LM_KEEP_MIN else 0)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"], r["kept"])
        for r in Q.QUERIES["lm_score_filter"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # liveness: threshold splits the corpus, pruning drops bigrams, and
    # at least one doc contains an unseen/pruned (backoff) bigram
    kept = sum(v[2] for v in got.values())
    assert 0 < kept < len(got)
    assert any(c < LM_MIN for c in cxy.values())
    assert any(
        any(b not in lm for b in zip(t, t[1:])) for t in docs.values()
    )
