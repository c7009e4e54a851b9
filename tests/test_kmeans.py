"""kmeans_fit: the engine's K clusters must equal a literal Python/
numpy Lloyd's run (same quantization, init, tie-break, floor-divide
update) on the same vectors — independent of the DuckDB oracle."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.queries_text import KM_ITERS, KM_K, KM_OFFSET
from tests.conftest import SF_SMOKE


def test_kmeans_fit_matches_python_lloyds(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = (
        spark.table("embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    qm = np.array(
        [
            [math.floor(float(x) * 1000.0) + KM_OFFSET for x in r["embedding"]]
            for r in rows
        ],
        dtype=np.int64,
    )
    cents = qm[:KM_K].copy()
    for it in range(KM_ITERS + 1):
        d2 = (
            (qm * qm).sum(1, keepdims=True)
            - 2 * (qm @ cents.T)
            + (cents * cents).sum(1)
        )
        cid = d2.argmin(1)  # first occurrence → lowest cid
        best = d2[np.arange(len(qm)), cid]
        if it == KM_ITERS:
            break
        new = cents.copy()
        for k in range(KM_K):
            m = cid == k
            if m.any():
                new[k] = qm[m].sum(0) // m.sum()
        cents = new

    expect = {
        k: (
            int((cid == k).sum()),
            int(best[cid == k].sum()),
            hashlib.md5(",".join(map(str, cents[k])).encode()).hexdigest(),
        )
        for k in range(KM_K)
        if (cid == k).any()
    }
    got = {
        r["cid"]: (r["n_vectors"], r["inertia"], r["c_sig"])
        for r in Q.QUERIES["kmeans_fit"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # liveness: all K clusters populated, the iterations actually moved
    # the centroids (final sig differs from the init vector's), and the
    # assignment is non-trivial (no cluster owns everything)
    assert len(got) == KM_K
    init_sigs = {
        hashlib.md5(",".join(map(str, qm[k])).encode()).hexdigest()
        for k in range(KM_K)
    }
    assert any(v[2] not in init_sigs for v in got.values())
    assert max(v[0] for v in got.values()) < len(qm)
