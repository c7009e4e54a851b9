"""r6: dedup_embedding_cosine's per-bucket Gram refine must equal the
algorithm-independent full pairwise scan (exact int64 arithmetic)."""
from __future__ import annotations

import numpy as np

from pdxbldgimport_spark import queries_text as QT
from pdxbldgimport_spark import registry as Q

SF = "/root/testdata/sf0.001"


def test_embedding_cosine_matches_bruteforce(spark):
    QT.views(spark, SF)
    rows = QT._eq_with_clones(spark).collect()
    vecs = {r["vec_id"]: np.asarray(r["q"], dtype=np.int64) for r in rows}
    # LSH buckets only GENERATE candidates; brute force must therefore
    # apply the same sig-equality constraint the query family defines
    # (pairs outside a shared bucket are out of scope by construction).
    sigs = {
        r["vec_id"]: tuple(
            int(np.dot(np.asarray(p, dtype=np.int64), vecs[r["vec_id"]]) > 0)
            for p in [QT._plane(i) for i in range(QT.N_PLANES)]
        )
        for r in rows
    }
    expect = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if sigs[a] != sigs[b]:
                continue
            dot = int(vecs[a] @ vecs[b])
            na2 = int(vecs[a] @ vecs[a])
            nb2 = int(vecs[b] @ vecs[b])
            if dot > 0 and dot * dot >= (QT.COS_TAU2_PPM * na2) // 1000000 * nb2:
                expect.add((a, b, dot))
    got = {
        (r["vec_a"], r["vec_b"], r["dot"])
        for r in Q.QUERIES["dedup_embedding_cosine"](spark, SF).collect()
    }
    assert got == expect
    assert got, "empty result proves nothing at this SF"
