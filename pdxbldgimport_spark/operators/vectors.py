"""Embedding-vector kernels for the ANN / embedding-dedup family.

Design rule (same as the PIP slot cover, operators/pip_join.py): the
corpus-side and candidate-pair arithmetic must stay inside whole-stage
codegen. ``F.aggregate``/``zip_with`` higher-order functions are
CodegenFallback — one HOF drops the fused stage to interpreted row-at-a-
time evaluation (~25× measured in PLANS.md) — so dot products are built
as flat ``element_at`` product sums (CreateArray/ElementAt are
codegen'd), and the only Python pass is the IVF centroid assignment,
where a numpy matmul replaces a 16× explode + window shuffle.

All arithmetic is int64-exact (quantized milli-unit vectors), so the
DuckDB oracles compare bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

DIMS = 64


def quantize_expr(emb_col: str = "embedding") -> Column:
    """array<long> of floor(x*1000) per dim. transform HOF for the same
    measured reason as ``dot_expr``: one tight loop beats a 64-slot
    CreateArray of ElementAt terms that overflows Janino's method
    limit."""
    return F.transform(
        F.col(emb_col), lambda x: F.floor(x * F.lit(1000.0)).cast("long")
    )


def dot_expr(a: str, b: str) -> Column:
    """Integer dot product of two array<long> columns (exact int64, no
    overflow at |x|≤1000: |dot| ≤ 64e6).

    Strategy is MEASURED, not assumed (1M candidate pairs, local[32]):
    - zip_with+aggregate HOF: 10.4 s — CodegenFallback, but its eval is
      one tight loop over the two arrays per row;
    - flat 64-term element_at tree: 57.5 s — blows Janino's 64KB method
      limit, falls back to interpreted eval of 64 boxed ElementAt nodes;
      8-term chunking (codegen-splittable) still 28.4 s;
    - numpy dot via mapInPandas: 311 s — per-pair Arrow transfer of two
      64-element arrays and per-row object stacking dwarf the matmul.
    So: per-PAIR arithmetic stays a HOF; the scale lever is keeping the
    pair count small (banded LSH / inverted lists — the bucketing around
    this call) and doing per-VECTOR work in the batch kernels below."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def with_sig(
    vecs: DataFrame,
    planes: list[list[int]],
    id_col: str = "vec_id",
    q_col: str = "q",
    norms: bool = False,
) -> DataFrame:
    """(id, q, sig[, n2]): LSH signature (bit i set iff q·plane_i > 0)
    and optionally the squared norm, via one Arrow/numpy matmul pass.
    (A flat JVM expression for the 8×64-term signature exceeds Janino's
    method-size limit and drops the whole fused stage to interpreted —
    the kernel is the faster AND scale-correct path; it runs once per
    corpus at ingest and is stage-materialized by callers.)"""
    pmat = np.asarray(planes, dtype=np.int64).T  # dims × n_planes
    weights = (1 << np.arange(pmat.shape[1], dtype=np.int64))
    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField(q_col, T.ArrayType(T.LongType())),
        T.StructField("sig", T.LongType()),
    ]
    if norms:
        fields.append(T.StructField("n2", T.LongType()))
    schema = T.StructType(fields)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            qm = np.stack(pdf[q_col].to_numpy()).astype(np.int64)
            sig = ((qm @ pmat) > 0) @ weights
            out = {
                id_col: pdf[id_col].to_numpy(),
                q_col: pdf[q_col].to_numpy(),
                "sig": sig,
            }
            if norms:
                out["n2"] = np.einsum("ij,ij->i", qm, qm)
            yield pd.DataFrame(out)

    return vecs.select(id_col, q_col).mapInPandas(gen, schema)


def ivf_assign(
    vecs: DataFrame,
    centroids: list[list[int]],
    nprobe: int,
    id_col: str = "vec_id",
    q_col: str = "q",
) -> DataFrame:
    """(id, q, cid, crn) rows for each vector's ``nprobe`` best centroids
    by integer dot (ties → lowest cid), via one Arrow/numpy matmul pass —
    replaces the explode-16×-then-window plan, whose window shuffle on
    vec_id is the scale bottleneck; this is map-side only."""
    cmat = np.asarray(centroids, dtype=np.int64).T  # dims × nlist
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(q_col, T.ArrayType(T.LongType())),
            T.StructField("cid", T.IntegerType()),
            T.StructField("crn", T.IntegerType()),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            qm = np.stack(pdf[q_col].to_numpy()).astype(np.int64)  # n × dims
            dots = qm @ cmat  # n × nlist, exact int64
            # dot desc, cid asc: stable argsort over -dots keeps cid order
            order = np.argsort(-dots, axis=1, kind="stable")[:, :nprobe]
            n, k = order.shape
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), k),
                    q_col: pdf[q_col].to_numpy().repeat(k),
                    "cid": order.ravel().astype(np.int32),
                    "crn": np.tile(np.arange(1, k + 1, dtype=np.int32), n),
                }
            )

    return vecs.select(id_col, q_col).mapInPandas(gen, schema)


def kmeans_partials(
    vecs: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    q_col: str = "q",
) -> DataFrame:
    """Per-Arrow-batch Lloyd's partials under the given centroids: each
    batch assigns its vectors to the nearest centroid by exact int64
    squared-L2 (ties → lowest cid, via argmin-first-occurrence) and
    emits ONE row per non-empty cid: (cid, n, inertia, sums[dims]).
    The corpus never leaves the map side — the downstream update agg
    sees at most K rows per batch, so a Lloyd's round is one map pass
    plus a K-row-per-partition aggregation regardless of corpus size.
    d2 uses the |q|² − 2q·c + |c|² expansion so the heavy term is one
    numpy matmul; everything is int64-exact (|q|≤1600 offset space →
    d2 ≤ ~6.6e8 per vector, batch partial sums ≪ int64)."""
    cmat = np.asarray(centroids, dtype=np.int64)  # K × dims
    n_cent = cmat.shape[0]
    c2 = (cmat * cmat).sum(axis=1)
    schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("inertia", T.LongType()),
            T.StructField("sums", T.ArrayType(T.LongType())),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            qm = np.stack(pdf[q_col].to_numpy()).astype(np.int64)
            d2 = (
                (qm * qm).sum(axis=1, keepdims=True)
                - 2 * (qm @ cmat.T)
                + c2
            )
            cid = d2.argmin(axis=1)  # first occurrence → lowest cid
            best = d2[np.arange(len(qm)), cid]
            rows = []
            for k in range(n_cent):
                m = cid == k
                if not m.any():
                    continue
                rows.append(
                    (
                        k,
                        int(m.sum()),
                        int(best[m].sum()),
                        qm[m].sum(axis=0).tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["cid", "n", "inertia", "sums"]
            )

    return vecs.select(id_col, q_col).mapInPandas(gen, schema)


def gram_partials(
    vecs: DataFrame,
    q_col: str = "q",
) -> DataFrame:
    """Upper-triangle Gram-matrix partials: one Arrow batch → ONE
    dims·(dims+1)/2-row partial (i, j, g) with g = Σ q_i·q_j over the
    batch, i ≤ j, 0-based. The corpus never leaves the map side — the
    downstream SUM agg sees ≤ 2080 rows per batch (dims = 64)
    regardless of corpus size, so the full second-moment matrix (the
    input to PCA / whitening / covariance, which derive from it plus
    the column-sum vector) is one map pass + one bounded aggregation.

    int64-exact: |q| ≤ 1000 per dim → per-row product ≤ 1e6; a batch
    partial of 10^6 rows is ≤ 1e12, and the final cross-corpus sums
    stay < 9.2e18 up to ~10^12 rows — within int64, and bit-identical
    to the DuckDB oracle's HUGEINT-free BIGINT sum."""
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("g", T.LongType()),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            qm = np.stack(pdf[q_col].to_numpy()).astype(np.int64)
            gm = qm.T @ qm
            iu, ju = np.triu_indices(gm.shape[0])
            yield pd.DataFrame(
                {"i": iu.astype(np.int32), "j": ju.astype(np.int32),
                 "g": gm[iu, ju]}
            )

    return vecs.select(q_col).mapInPandas(gen, schema)
