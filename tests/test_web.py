"""Brute-force property checks for the web-graph/retrieval operators
(queries_web.py): each must equal a literal per-row Python reference
over the real sf0.001 pages/documents — independent of the DuckDB
oracle's SQL formulation, so a shared SQL misunderstanding can't hide."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.queries_web import (
    BM25_K,
    BM25_TERMS,
    IDF_SCALE,
    PR_ITERS,
    PR_SCALE,
    _PR_BASE,
)
from pdxbldgimport_spark.synth import NP
from tests.conftest import SF_SMOKE


def _canonical(url: str) -> str:
    m = re.match(r"^[A-Za-z]+://[^/?#]*", url)
    auth = m.group(0) if m else ""
    rest = url[len(auth):]
    auth = re.sub(r":(443|80)$", "", auth).lower()
    rest = re.sub(r"#.*", "", rest)
    path = re.sub(r"/$", "", re.sub(r"\?.*", "", rest))
    qm = re.search(r"\?(.*)", rest)
    q = qm.group(1) if qm else ""
    q = re.sub(r"^&+", "", re.sub(r"(^|&)utm_[^&]*", "", q))
    return auth + path + ("?" + q if q else "")


def test_url_canonical_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    pages = [
        (r["page_id"], r["url"])
        for r in spark.sql("SELECT page_id, url FROM pages").collect()
    ]
    expect: dict[str, list[int]] = defaultdict(list)
    for pid, url in pages:
        expect[_canonical(url)].append(pid)
    got = {
        r["canonical_url"]: (r["n_pages"], r["first_page_id"])
        for r in Q.QUERIES["dedup_url_canonical"](spark, SF_SMOKE).collect()
    }
    assert got == {c: (len(ps), min(ps)) for c, ps in expect.items()}
    # the colliding fixture (synth: page_id % 7 = 3 AND % 4 = 1 decorates
    # the URL of page_id-7) must produce real multi-page groups
    assert any(n > 1 for n, _ in got.values())


def test_bm25_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.sql("SELECT doc_id, text FROM documents").collect()
    }
    S = sum(len(t) for t in docs.values())
    N = len(docs)
    df = Counter()
    for toks in docs.values():
        for w in set(toks) & set(BM25_TERMS):
            df[w] += 1
    scores = {}
    for d, toks in docs.items():
        dl, tf = len(toks), Counter(toks)
        s = 0
        for w in BM25_TERMS:
            if tf[w] == 0:
                continue
            idf = (IDF_SCALE * (2 * (N - df[w]) + 1)) // (2 * df[w] + 1)
            s += (idf * 22 * S * tf[w]) // (10 * S * tf[w] + 3 * S + 9 * dl * N)
        if s:
            scores[d] = s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_K]
    got = [
        (r["doc_id"], r["bm25_scaled"])
        for r in Q.QUERIES["bm25_topk"](spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_pagerank_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    pages = spark.sql("SELECT page_id, pid FROM pages").collect()
    w = Counter((r["pid"], (r["page_id"] * 13 + 7) % NP) for r in pages)
    ow = Counter()
    for (src, _), n in w.items():
        ow[src] += n
    hosts = {s for s, _ in w} | {d for _, d in w}
    r = {h: PR_SCALE for h in hosts}
    for _ in range(PR_ITERS):
        nxt = {h: _PR_BASE for h in hosts}
        for (src, dst), wt in w.items():
            nxt[dst] += (850 * r[src] * wt) // (1000 * ow[src])
        r = nxt
    got = {
        row["host"]: row["rank_scaled"]
        for row in Q.QUERIES["host_pagerank"](spark, SF_SMOKE).collect()
    }
    assert got == {f"h{h}.example.com": v for h, v in r.items()}
    # total mass sanity: every host floors at the (1-d) base
    assert all(v >= _PR_BASE for v in got.values())


def test_cross_dup_spans_matches_bruteforce(spark):
    from collections import Counter as Ctr

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.sql("SELECT doc_id, text FROM documents").collect()
    }
    grams = {
        d: [" ".join(t[i : i + 3]) for i in range(len(t) - 2)]
        for d, t in docs.items()
    }
    df = Ctr()
    for d, gs in grams.items():
        for g in set(gs):
            df[g] += 1
    expect = {}
    for d, gs in grams.items():
        if not gs:
            continue
        dup = sum(1 for g in gs if df[g] >= 2)
        expect[d] = (len(gs), dup, (1_000_000 * dup) // len(gs))
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_ppm"])
        for r in Q.QUERIES["cross_dup_spans"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # the corpus has near-dup fixtures: the signal must be live
    assert any(v[1] > 0 for v in got.values())


def test_doclen_quantiles_matches_bruteforce(spark):
    import math

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import DOCLEN_QS

    views(spark, SF_SMOKE)
    lens = sorted(
        r["n_chars"] for r in spark.sql("SELECT n_chars FROM documents").collect()
    )
    n = len(lens)
    expect = {q: lens[math.ceil(q * n / 100) - 1] for q in DOCLEN_QS}
    got = {
        r["q"]: r["n_chars_percentile"]
        for r in Q.QUERIES["doclen_quantiles"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_url_canonical_expr_randomized_property(spark):
    """canonical_url_expr (the Spark expression pipeline) vs the Python
    regex reference over a seeded random URL space — cases the fixed
    synth fixtures never produce (non-default ports kept, utm in the
    middle of a param list, bare '?', mixed-case paths preserved,
    ':8080' not mistaken for ':80'). One batch, one job."""
    import random

    from pdxbldgimport_spark.queries_web import canonical_url_expr

    rng = random.Random(20260817)
    schemes = ["http", "https", "HTTPS", "HtTp"]
    hosts = ["a.example.com", "A.Example.COM", "h0.EXAMPLE.com"]
    ports = ["", ":443", ":80", ":8080", ":4443"]
    paths = ["", "/", "/p/1", "/P/1/", "/a/b.html"]
    queries = [
        "", "?", "?a=1", "?utm_x=1", "?a=1&utm_y=2", "?utm_a=1&b=2",
        "?utm_a=1&utm_b=2", "?a=1&b=2",
    ]
    frags = ["", "#x", "#", "#s2"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(400)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["c"] for r in
        df.select(canonical_url_expr("url").alias("c")).collect()
    ]
    assert got == [_canonical(u) for u in urls]
