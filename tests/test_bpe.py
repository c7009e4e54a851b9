"""bpe_merge_topk: the engine's K merges must equal a literal Python
BPE trainer (greedy left-to-right non-overlapping merges, cnt DESC /
pair ASC tie-break) run on the same corpus — independent of the DuckDB
oracle's SQL formulation."""

from __future__ import annotations

from collections import defaultdict

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.queries_text import BPE_K
from tests.conftest import SF_SMOKE


def _merge_seq(syms: list[str], s1: str, s2: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
            out.append(s1 + s2)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_merge_topk_matches_python_bpe(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    freq: dict = defaultdict(int)
    for r in spark.table("documents").select("text").collect():
        for w in r["text"].split(" "):
            freq[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in freq.items()}

    expect = []
    for step in range(1, BPE_K + 1):
        pairs: dict = defaultdict(int)
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        assert pairs, "corpus exhausted before K merges — make K smaller"
        (s1, s2), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expect.append((step, s1, s2, s1 + s2, cnt))
        vocab = {
            tuple(_merge_seq(list(k), s1, s2)): c for k, c in vocab.items()
        }

    got = [
        (r["step"], r["s1"], r["s2"], r["merged"], r["cnt"])
        for r in Q.QUERIES["bpe_merge_topk"](spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # liveness: at least one merge builds on an earlier merge's output
    # (a multi-char symbol appears on the left or right of a later pair)
    assert any(len(s1) > 1 or (len(s2) > 1 and s2 != "</w>")
               for _, s1, s2, _, _ in expect)
    # and the overlap semantics were exercised: some word contains a
    # repeated adjacent pair at some point — guaranteed by construction
    # of the greedy reference; the equality above is the real check.
