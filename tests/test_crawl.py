"""Brute-force property checks for the crawl-hygiene operators
(queries_crawl.py): each must equal a literal per-row Python reference
over the real sf0.001 pages — independent of the DuckDB oracle's SQL
formulation, so a shared SQL misunderstanding can't hide."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.queries_crawl import (
    BLOCK_MOD,
    BLOCK_RESIDUE,
    FUNNEL_LANG,
    FUNNEL_MAX_CHARS,
    FUNNEL_MIN_CHARS,
    FUNNEL_MIN_WORDS,
    PII_EMAIL,
    PII_IP,
    PII_PHONE,
)
from pdxbldgimport_spark.synth import NP
from tests.conftest import SF_SMOKE
from tests.test_web import _canonical


def _pages(spark, *cols):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    return spark.table("pages").select(*cols).collect()


def test_pii_scrub_matches_python_re(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    raw = {
        r["page_id"]: r["text"]
        for r in spark.table("pages_pii").collect()
    }
    got = {
        r["page_id"]: (
            r["n_email"], r["n_phone"], r["n_ip"],
            r["scrub_md5"], r["scrub_len"],
        )
        for r in Q.QUERIES["pii_scrub"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(raw)
    n_with_pii = 0
    # re.ASCII: Java regex and DuckDB's RE2 both treat \b/\d/\w as
    # ASCII by default; Python's re is the unicode-aware outlier.
    A = re.ASCII
    for pid, text in raw.items():
        s = re.sub(PII_EMAIL, "<EMAIL>", text, flags=A)
        s = re.sub(PII_PHONE, "<PHONE>", s, flags=A)
        s = re.sub(PII_IP, "<IP>", s, flags=A)
        expect = (
            len(re.findall(PII_EMAIL, text, flags=A)),
            len(re.findall(PII_PHONE, text, flags=A)),
            len(re.findall(PII_IP, text, flags=A)),
            hashlib.md5(s.encode()).hexdigest(),
            len(s),
        )
        assert got[pid] == expect, pid
        if expect[0] or expect[1] or expect[2]:
            n_with_pii += 1
    # the planted fixtures are live: plenty of redactions, plenty of
    # untouched rows, and the double-email rows count 2
    assert 0 < n_with_pii < len(raw)
    assert any(g[0] == 2 for g in got.values())
    assert any(
        g[0] and g[1] and g[2] for g in got.values()
    ), "no row carries all three PII kinds — moduli fixture broken"


def test_host_blocklist_matches_bruteforce(spark):
    rows = _pages(spark, "page_id", "url")
    blocked = {
        f"h{p}.example.com"
        for p in range(NP)
        if p % BLOCK_MOD == BLOCK_RESIDUE
    }
    expect: dict = defaultdict(lambda: [0, None])
    for r in rows:
        host = re.match(
            r"^[A-Za-z]+://([^/:?#]+)", r["url"]
        ).group(1).lower()
        if host in blocked:
            continue
        e = expect[host]
        e[0] += 1
        e[1] = r["page_id"] if e[1] is None else min(e[1], r["page_id"])
    got = {
        r["host"]: [r["n_pages"], r["first_page_id"]]
        for r in Q.QUERIES["host_blocklist_filter"](spark, SF_SMOKE).collect()
    }
    assert got == dict(expect)
    assert len(got) == NP - len(blocked)


def test_url_latest_capture_matches_bruteforce(spark):
    rows = _pages(spark, "page_id", "url", "warc_ts")
    best: dict = {}
    n: dict = defaultdict(int)
    for r in rows:
        c = _canonical(r["url"])
        n[c] += 1
        key = (r["warc_ts"], r["page_id"])
        if c not in best or key > best[c]:
            best[c] = key
    got = {
        r["canonical_url"]: (r["last_ts"], r["keep_page_id"], r["n_captures"])
        for r in Q.QUERIES["url_latest_capture"](spark, SF_SMOKE).collect()
    }
    expect = {c: (ts, pid, n[c]) for c, (ts, pid) in best.items()}
    assert got == expect
    # collision groups exist and pick the newer capture, not the first
    multi = [c for c, k in n.items() if k > 1]
    assert multi
    assert any(
        got[c][1] != min(
            r["page_id"] for r in rows if _canonical(r["url"]) == c
        )
        for c in multi
    )


def test_pipeline_funnel_matches_bruteforce(spark):
    rows = _pages(spark, "page_id", "text", "lang")
    s = [0, 0, 0, 0, 0]
    f3 = []
    for r in rows:
        t = r["text"]
        s[0] += 1
        b1 = r["lang"] == FUNNEL_LANG
        b2 = b1 and FUNNEL_MIN_CHARS <= len(t) <= FUNNEL_MAX_CHARS
        words = len(t) - len(t.replace(" ", "")) + 1
        b3 = b2 and words >= FUNNEL_MIN_WORDS
        s[1] += b1
        s[2] += b2
        s[3] += b3
        if b3:
            f3.append((hashlib.md5(t.encode()).hexdigest(), r["page_id"]))
    first: dict = {}
    for h, pid in f3:
        first[h] = min(first.get(h, pid), pid)
    s[4] = sum(1 for h, pid in f3 if first[h] == pid)
    got = {
        r["stage"]: r["n_pages"]
        for r in Q.QUERIES["pipeline_funnel"](spark, SF_SMOKE).collect()
    }
    assert got == {
        "s0_total": s[0], "s1_lang": s[1], "s2_len": s[2],
        "s3_words": s[3], "s4_dedup": s[4],
    }
    # every stage strictly prunes at this SF — the funnel is live
    assert s[0] > s[1] > s[2] > s[3] > s[4] > 0
