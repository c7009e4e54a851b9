"""Property tests for doc_chunk (coverage arithmetic) and
bigram_lm_score (brute-force model replication in pure Python)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.queries_text import (
    _NCHUNKS_SQL,
    CHUNK_STRIDE,
    CHUNK_W,
)
from tests.conftest import SF_SMOKE


def test_doc_chunk_covers_every_document_exactly(spark):
    chunks = Q.QUERIES["doc_chunk"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[
        ["doc_id", "n_chars"]
    ]
    g = chunks.groupby("doc_id").agg(
        n_chunks=("chunk_idx", "max"), total=("chunk_len", "sum")
    )
    g["n_chunks"] += 1
    m = g.join(docs.set_index("doc_id"), how="outer")
    assert not m.isna().any().any()  # every doc chunked, no orphans
    for doc_id, row in m.iterrows():
        ln, n = int(row["n_chars"]), int(row["n_chunks"])
        want = (
            1
            if ln <= CHUNK_W
            else 1 + math.ceil((ln - CHUNK_W) / CHUNK_STRIDE)
        )
        assert n == want, (doc_id, ln, n, want)
        # last chunk reaches exactly the end of the doc
        last_start = 1 + (n - 1) * CHUNK_STRIDE
        assert last_start <= ln
        assert last_start + CHUNK_W - 1 >= ln
    # per-chunk length = min(W, len - start + 1)
    j = chunks.merge(docs, on="doc_id")
    start = 1 + j["chunk_idx"] * CHUNK_STRIDE
    want_len = (j["n_chars"] - start + 1).clip(upper=CHUNK_W)
    assert (j["chunk_len"] == want_len).all()


def test_doc_chunk_md5_matches_duckdb_substring(spark):
    """The chunk text itself (via its md5) round-trips the same bytes
    in both engines — the byte-identical-per-url invariant applied at
    chunk granularity."""
    chunks = (
        Q.QUERIES["doc_chunk"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    du = con.sql(
        f"""
        WITH d AS (
          SELECT doc_id, text
          FROM read_parquet('{SF_SMOKE}/documents.parquet')
        )
        SELECT doc_id,
               md5(substring(text, CAST(1 + i * {CHUNK_STRIDE} AS INT),
                             {CHUNK_W})) AS chunk_md5
        FROM d, (SELECT UNNEST(range(0, 64)) AS i)
        WHERE i < ({_NCHUNKS_SQL})
        """
    ).df()
    con.close()
    # align on (doc_id, rank) — duck side over-generates then filters
    du = du.sort_values(["doc_id", "chunk_md5"])
    sp = chunks.sort_values(["doc_id", "chunk_md5"])
    assert list(sp["chunk_md5"]) == list(du["chunk_md5"])


def test_bigram_lm_score_matches_pure_python_bruteforce(spark):
    eng = (
        Q.QUERIES["bigram_lm_score"](spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[
        ["doc_id", "text"]
    ]
    c2: Counter = Counter()
    c1: Counter = Counter()
    toks = {}
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        toks[r["doc_id"]] = ws
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    for doc_id, ws in toks.items():
        if len(ws) < 2:
            assert doc_id not in eng.index
            continue
        n = len(ws) - 1
        s = sum(
            math.floor(c2[(a, b)] * 1000000.0 / c1[a] + 0.5)
            for a, b in zip(ws, ws[1:])
        )
        assert int(eng.loc[doc_id, "n_bigrams"]) == n
        assert int(eng.loc[doc_id, "lm_ppm"]) == s
