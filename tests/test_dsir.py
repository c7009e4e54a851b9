"""dsir_importance: engine output must equal a literal Python DSIR
scorer (md5 bucket hashing, smoothed integer count-ratio weights, floor
mean) over the corpus — independent of the DuckDB oracle's SQL
formulation."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.queries_text import (
    DSIR_NB,
    DSIR_SCALE,
    DSIR_TARGET_LANG,
)
from tests.conftest import SF_SMOKE


def _bucket(w1: str, w2: str) -> int:
    hx = hashlib.md5((w1 + "\x1f" + w2).encode()).hexdigest()
    h60 = sum(int(hx[n], 16) * 16 ** n for n in range(15))
    return h60 % DSIR_NB


def test_dsir_importance_matches_python(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    docs = {
        r["doc_id"]: (r["lang"], r["text"].split(" "))
        for r in spark.table("documents")
        .select("doc_id", "lang", "text")
        .collect()
    }
    cr: dict = defaultdict(int)
    ct: dict = defaultdict(int)
    for lang, toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            k = _bucket(a, b)
            cr[k] += 1
            if lang == DSIR_TARGET_LANG:
                ct[k] += 1
    wgt = {k: DSIR_SCALE * (ct[k] + 1) // (c + 1) for k, c in cr.items()}
    sums = {}
    for doc_id, (_, toks) in docs.items():
        bgs = list(zip(toks, toks[1:]))
        assert bgs, "every synth doc must have >= 2 tokens"
        sums[doc_id] = (len(bgs), sum(wgt[_bucket(a, b)] for a, b in bgs))
    g = sum(sw for _, sw in sums.values()) // sum(n for n, _ in sums.values())
    expect = {
        d: (n, sw // n, 1 if sw // n >= g else 0)
        for d, (n, sw) in sums.items()
    }

    got = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_weight"], r["kept"])
        for r in Q.QUERIES["dsir_importance"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # liveness: the threshold splits the corpus, and the target class is
    # enriched among the kept docs (the whole point of DSIR)
    kept = sum(v[2] for v in got.values())
    assert 0 < kept < len(got)
    n_t = sum(1 for lang, _ in docs.values() if lang == DSIR_TARGET_LANG)
    kept_t = sum(
        got[d][2]
        for d, (lang, _) in docs.items()
        if lang == DSIR_TARGET_LANG
    )
    # target recall among kept exceeds the target's base rate
    assert kept_t * len(docs) > kept * n_t
