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


def test_crawl_snapshot_diff_matches_bruteforce(spark):
    rows = _pages(spark, "page_id", "url", "warc_ts", "text")
    sides: dict = defaultdict(lambda: [None, None])  # canon -> [old, new]
    text_by_pid = {}
    for r in rows:
        c = _canonical(r["url"])
        s = r["warc_ts"].second % 2
        key = (r["warc_ts"], r["page_id"])
        if sides[c][s] is None or key > sides[c][s]:
            sides[c][s] = key
        text_by_pid[r["page_id"]] = r["text"]
    expect: dict = defaultdict(lambda: [0, None])
    for c, (o, n) in sides.items():
        if o is None:
            st = "added"
        elif n is None:
            st = "removed"
        elif text_by_pid[o[1]] != text_by_pid[n[1]]:
            st = "changed"
        else:
            st = "unchanged"
        host = re.match(r"^[a-z]+://([^/:?#]+)", c).group(1)
        e = expect[(host, st)]
        e[0] += 1
        e[1] = c if e[1] is None else min(e[1], c)
    got = {
        (r["host"], r["status"]): [r["n_urls"], r["first_url"]]
        for r in Q.QUERIES["crawl_snapshot_diff"](spark, SF_SMOKE).collect()
    }
    assert got == dict(expect)
    # every status is live at this SF — the fixture matrix works
    assert {"added", "removed", "changed", "unchanged"} <= {
        s for _, s in got
    }


def test_index_postings_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_web import INDEX_SEG_DOCS

    views(spark, SF_SMOKE)
    docs = spark.table("documents").select("doc_id", "text").collect()
    seg_posts: dict = defaultdict(list)  # (term, seg) -> [(doc, pos)]
    for r in docs:
        seg = r["doc_id"] // INDEX_SEG_DOCS
        for pos, w in enumerate(r["text"].split(" ")):
            seg_posts[(w, seg)].append((r["doc_id"], pos))
    per_term: dict = defaultdict(list)
    for (w, seg), ps in seg_posts.items():
        ps.sort()
        blob = ",".join(f"{d}:{p}" for d, p in ps)
        per_term[w].append(
            (seg, hashlib.md5(blob.encode()).hexdigest(),
             len({d for d, _ in ps}), len(ps))
        )
    expect = {}
    for w, segs in per_term.items():
        segs.sort()
        manifest = ";".join(f"{s}:{m}" for s, m, _, _ in segs)
        expect[w] = (
            sum(df for _, _, df, _ in segs),
            sum(cf for _, _, _, cf in segs),
            len(segs),
            hashlib.md5(manifest.encode()).hexdigest(),
        )
    got = {
        r["term"]: (r["df"], r["cf"], r["n_segs"], r["index_md5"])
        for r in Q.QUERIES["index_postings"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # multi-segment terms exist (the manifest merge is live)
    assert any(v[2] > 1 for v in got.values())


def test_outlink_extract_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries_web import LINK_TAG_RE

    rows = _pages(spark, "page_id", "html")
    expect = {}
    for r in rows:
        html = bytes(r["html"]).decode()
        for pos, m in enumerate(re.finditer(LINK_TAG_RE, html)):
            expect[(r["page_id"], pos)] = (_canonical(m.group(1)), m.group(2))
    got = {
        (r["page_id"], r["pos"]): (r["dst_url"], r["anchor"])
        for r in Q.QUERIES["outlink_extract"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # fixture liveness: pages with 1, 2 and 3 links all exist, and the
    # decorated hrefs canonicalize (no uppercase scheme survives)
    per_page = defaultdict(int)
    for pid, _ in got:
        per_page[pid] += 1
    assert {1, 2, 3} <= set(per_page.values())
    assert all(u.startswith("https://h") for u, _ in got.values())


def test_anchor_text_agg_matches_bruteforce(spark):
    got = {
        r["dst_url"]: (
            r["n_refs"], r["n_src_hosts"], r["anchors_md5"],
            r["first_anchor"],
        )
        for r in Q.QUERIES["anchor_text_agg"](spark, SF_SMOKE).collect()
    }
    from pdxbldgimport_spark.queries_web import LINK_TAG_RE

    rows = _pages(spark, "page_id", "url", "html")
    refs = defaultdict(list)
    for r in rows:
        html = bytes(r["html"]).decode()
        src_host = re.match(
            r"^[A-Za-z]+://([^/:?#]+)", r["url"]
        ).group(1).lower()
        for pos, m in enumerate(re.finditer(LINK_TAG_RE, html)):
            refs[_canonical(m.group(1))].append(
                (m.group(2), r["page_id"], pos, src_host)
            )
    expect = {}
    for dst, rs in refs.items():
        rs.sort()
        blob = ",".join(f"{a}:{p}:{o}" for a, p, o, _ in rs)
        expect[dst] = (
            len(rs),
            len({h for _, _, _, h in rs}),
            hashlib.md5(blob.encode()).hexdigest(),
            rs[0][0],
        )
    assert got == expect
    # multi-ref targets from multiple hosts exist — the index is live
    assert any(v[0] > 1 and v[1] > 1 for v in got.values())


def test_lang_quota_sample_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import QUOTA_MARGIN, QUOTA_N

    views(spark, SF_SMOKE)
    docs = spark.table("documents").select("lang", "doc_id").collect()
    by_lang = defaultdict(list)
    for r in docs:
        hx = hashlib.md5(f"qs:{r['doc_id']}".encode()).hexdigest()
        # _h60_sql: nibble n contributes digit_n * 16^n — the first hex
        # char is the LEAST significant
        h = int(hx[:15][::-1], 16)
        by_lang[r["lang"]].append((h, r["doc_id"]))
    expect = {}
    for lang, hs in by_lang.items():
        hs.sort()
        for rank, (h, d) in enumerate(hs[:QUOTA_N], start=1):
            expect[(lang, rank)] = (d, h)
        # the oversample threshold has healthy headroom on this data:
        # at least N candidates fall under it for every lang
        cnt = len(hs)
        lim = (1 << 60) * QUOTA_MARGIN * QUOTA_N
        n_cand = sum(1 for h, _ in hs if h * cnt < lim)
        assert n_cand >= min(QUOTA_N, cnt), lang
    got = {
        (r["lang"], r["rank"]): (r["doc_id"], r["h"])
        for r in Q.QUERIES["lang_quota_sample"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def _host_edges_bruteforce(rows):
    from pdxbldgimport_spark.queries_web import LINK_TAG_RE

    edges = []
    for r in rows:
        html = bytes(r["html"]).decode()
        src = re.match(
            r"^[A-Za-z]+://([^/:?#]+)", r["url"]
        ).group(1).lower()
        for m in re.finditer(LINK_TAG_RE, html):
            dst = re.match(
                r"^[a-z]+://([^/:?#]+)", _canonical(m.group(1))
            ).group(1)
            edges.append((src, dst))
    return edges


def test_link_degree_dist_matches_bruteforce(spark):
    rows = _pages(spark, "page_id", "url", "html")
    e = set(_host_edges_bruteforce(rows))
    outd: dict = defaultdict(int)
    ind: dict = defaultdict(int)
    for s, d in e:
        outd[s] += 1
        ind[d] += 1
    got = {
        r["host"]: (r["out_deg"], r["in_deg"])
        for r in Q.QUERIES["link_degree_dist"](spark, SF_SMOKE).collect()
    }
    expect = {
        h: (outd.get(h, 0), ind.get(h, 0)) for h in set(outd) | set(ind)
    }
    assert got == expect
    assert any(o > 1 and i > 1 for o, i in got.values())


def test_host_hits_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries_web import (
        HITS_ITERS,
        HITS_SCALE,
        HITS_SHIFT,
    )

    rows = _pages(spark, "page_id", "url", "html")
    w: dict = defaultdict(int)
    for s, d in _host_edges_bruteforce(rows):
        w[(s, d)] += 1
    hosts = {s for s, _ in w} | {d for _, d in w}
    h = {x: HITS_SCALE for x in hosts}
    for _ in range(HITS_ITERS):
        a = {x: 0 for x in hosts}
        for (s, d), wt in w.items():
            a[d] += h[s] * wt
        a = {x: v >> HITS_SHIFT for x, v in a.items()}
        h = {x: 0 for x in hosts}
        for (s, d), wt in w.items():
            h[s] += a[d] * wt
        h = {x: v >> HITS_SHIFT for x, v in h.items()}
    got = {
        r["host"]: (r["auth_scaled"], r["hub_scaled"])
        for r in Q.QUERIES["host_hits"](spark, SF_SMOKE).collect()
    }
    assert got == {x: (a[x], h[x]) for x in hosts}
    assert any(v[0] > 0 for v in got.values())
    assert any(v[1] > 0 for v in got.values())


def test_dedup_incremental_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries_crawl import CORPUS_HOURS

    rows = _pages(spark, "page_id", "url", "warc_ts", "text")
    corpus = {
        hashlib.md5(r["text"].encode()).hexdigest()
        for r in rows
        if r["warc_ts"].hour < CORPUS_HOURS
    }
    expect: dict = {}
    for r in rows:
        if r["warc_ts"].hour < CORPUS_HOURS:
            continue
        host = re.match(
            r"^[A-Za-z]+://([^/:?#]+)", r["url"]
        ).group(1).lower()
        e = expect.setdefault(host, [0, 0, None])
        e[0] += 1
        if hashlib.md5(r["text"].encode()).hexdigest() not in corpus:
            e[1] += 1
            e[2] = r["page_id"] if e[2] is None else min(e[2], r["page_id"])
    got = {
        r["host"]: [r["n_pages"], r["n_new"], r["first_new_page_id"]]
        for r in Q.QUERIES["dedup_incremental"](spark, SF_SMOKE).collect()
    }
    assert got == {h: list(v) for h, v in expect.items()}
    # liveness: the increment contains BOTH new and already-seen content
    tot_pages = sum(v[0] for v in got.values())
    tot_new = sum(v[1] for v in got.values())
    assert 0 < tot_new < tot_pages


def test_colloc_pmi_topk_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import (
        PMI_K,
        PMI_MIN_COUNT,
        PMI_SCALE,
    )

    views(spark, SF_SMOKE)
    docs = spark.table("documents").select("text").collect()
    uni: dict = defaultdict(int)
    cxy: dict = defaultdict(int)
    n = 0
    for r in docs:
        toks = r["text"].split(" ")
        for w in toks:
            uni[w] += 1
        for a, b in zip(toks, toks[1:]):
            cxy[(a, b)] += 1
            n += 1
    scored = [
        (
            PMI_SCALE * c * n // (uni[a] * uni[b]),
            a,
            b,
            c,
        )
        for (a, b), c in cxy.items()
        if c >= PMI_MIN_COUNT
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = {
        (a, b): (c, s) for s, a, b, c in scored[:PMI_K]
    }
    got = {
        (r["w1"], r["w2"]): (r["c_xy"], r["pmi_scaled"])
        for r in Q.QUERIES["colloc_pmi_topk"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # scores discriminate (not all equal), the top-K limit bites, and
    # the min-count prune actually excludes bigrams on this data
    assert len({v[1] for v in got.values()}) > 1
    assert len(scored) > PMI_K
    assert any(c < PMI_MIN_COUNT for c in cxy.values())


def test_dup_cluster_stats_matches_component_rollup(spark):
    # the components themselves are independently oracle- and
    # property-tested (test_components.py); what's new here is the
    # reporting rollup — recompute it in python from the CC output
    comp = [
        r["component_id"]
        for r in Q.QUERIES["dedup_components"](spark, SF_SMOKE).collect()
    ]
    by_cid: dict = defaultdict(int)
    for c in comp:
        by_cid[c] += 1
    hist: dict = defaultdict(lambda: [0, 0, None])
    for cid, size in by_cid.items():
        e = hist[size]
        e[0] += 1
        e[1] += size
        e[2] = cid if e[2] is None else min(e[2], cid)
    got = {
        r["cluster_size"]: [r["n_clusters"], r["n_docs"], r["first_component"]]
        for r in Q.QUERIES["dup_cluster_stats"](spark, SF_SMOKE).collect()
    }
    assert got == dict(hist)
    # real near-dup clusters exist (size >= 2), plus singletons
    assert 1 in got and any(k >= 2 for k in got)


def test_robots_path_filter_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries_crawl import (
        ROBOTS_MOD,
        ROBOTS_PREFIX,
        ROBOTS_RESIDUE,
    )

    rows = _pages(spark, "page_id", "url")
    rule_hosts = {
        f"h{p}.example.com"
        for p in range(NP)
        if p % ROBOTS_MOD == ROBOTS_RESIDUE
    }
    expect: dict = {}
    for r in rows:
        m = re.match(r"^([A-Za-z]+)://([^/:?#]+)(?::\d+)?([^?#]*)", r["url"])
        host = m.group(2).lower()
        path = m.group(3)
        e = expect.setdefault(host, [0, 0, None])
        e[0] += 1
        if host in rule_hosts and path.startswith(ROBOTS_PREFIX):
            e[1] += 1
            e[2] = r["page_id"] if e[2] is None else min(e[2], r["page_id"])
    got = {
        r["host"]: [r["n_pages"], r["n_blocked"], r["first_blocked_page_id"]]
        for r in Q.QUERIES["robots_path_filter"](spark, SF_SMOKE).collect()
    }
    assert got == {h: list(v) for h, v in expect.items()}
    # prefix semantics are live: rule hosts have BOTH blocked and kept
    # pages (exact-host blocking would block everything on the host)
    assert any(
        0 < v[1] < v[0] for h, v in got.items() if h in rule_hosts
    )


def test_paragraph_dedup_matches_python_reference(spark):
    """Corpus-wide first-occurrence paragraph dedup vs a literal Python
    reference (dict insertion over (doc_id, pos)-sorted paragraphs)."""
    import hashlib as H

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import PARA_TOKENS

    views(spark, SF_SMOKE)
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.table("documents").select("doc_id", "text").collect()
    }
    chunks = {}  # doc_id -> [para]
    for d, text in docs.items():
        ws = text.split(" ")
        chunks[d] = [
            " ".join(ws[i : i + PARA_TOKENS])
            for i in range(0, len(ws), PARA_TOKENS)
        ]
    first = {}
    for d in sorted(chunks):
        for pos, para in enumerate(chunks[d]):
            first.setdefault(para, (d, pos))
    expect = {}
    any_dropped = False
    for d in sorted(chunks):
        kept = [
            p for pos, p in enumerate(chunks[d]) if first[p] == (d, pos)
        ]
        any_dropped = any_dropped or len(kept) < len(chunks[d])
        clean = " ".join(kept)
        expect[d] = (
            len(chunks[d]),
            len(kept),
            H.md5(clean.encode()).hexdigest(),
            len(clean),
        )
    # the fixture must exercise the drop path, not just identity keeps
    assert any_dropped
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_md5"], r["clean_len"])
        for r in Q.QUERIES["paragraph_dedup"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_pack_sequences_matches_bruteforce(spark):
    """Concat-and-chunk packing vs a literal Python reference: md5-derived
    shard, doc_id-ordered cumulative token offsets, SEQ_LEN cuts."""
    import hashlib as H

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import PACK_NSHARDS, PACK_SEQ_LEN

    views(spark, SF_SMOKE)
    docs = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in spark.table("documents").select("doc_id", "text").collect()
    }

    def h60(s):
        hx = H.md5(s.encode()).hexdigest()
        return sum(int(hx[n], 16) * 16**n for n in range(15))

    shards = {}
    for d in sorted(docs):
        shards.setdefault(h60(f"pk:{d}") % PACK_NSHARDS, []).append(d)
    expect = {}
    for sh, ds in shards.items():
        off = 0
        for d in ds:  # already doc_id-sorted
            n = docs[d]
            first = off // PACK_SEQ_LEN
            last = (off + n - 1) // PACK_SEQ_LEN
            expect[d] = (sh, n, off, first, last - first + 1)
            off += n
    got = {
        r["doc_id"]: (
            r["shard"], r["n_tokens"], r["start_off"], r["seq_first"],
            r["n_seqs"],
        )
        for r in Q.QUERIES["pack_sequences"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # liveness: the fixture exercises multi-sequence spans and >1 shard
    assert len(shards) > 1
    assert any(v[4] > 1 for v in got.values())


def test_dedup_keep_best_policy_matches_bruteforce(spark):
    """Representative selection vs Python argmax(n_chars, -doc_id) over
    the (independently oracle-certified) component labels."""
    comp = {
        r["doc_id"]: r["component_id"]
        for r in Q.QUERIES["dedup_components"](spark, SF_SMOKE).collect()
    }
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in spark.table("documents").select("doc_id", "n_chars").collect()
    }
    clusters = {}
    for d, c in comp.items():
        clusters.setdefault(c, []).append(d)
    expect = {}
    for c, ds in clusters.items():
        best = min(ds, key=lambda d: (-chars[d], d))
        expect[c] = (len(ds), best, chars[best], len(ds) - 1)
    got = {
        r["component_id"]: (
            r["cluster_size"], r["kept_doc"], r["kept_n_chars"],
            r["n_dropped"],
        )
        for r in Q.QUERIES["dedup_keep_best"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # liveness: real multi-doc clusters exist and something is dropped
    assert any(v[0] > 1 for v in got.values())
    assert sum(v[3] for v in got.values()) > 0


def test_boilerplate_remove_matches_python_reference(spark):
    """Per-source repeated-paragraph strip vs a literal Python reference
    (chunk → per-(source, para) distinct-doc counts → kill → reassemble)."""
    import hashlib as H

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import BP_MIN_DOCS, PARA_TOKENS

    views(spark, SF_SMOKE)
    rows = spark.table("documents").select(
        "doc_id", "source", "text"
    ).collect()
    chunks, src = {}, {}
    for r in rows:
        ws = r["text"].split(" ")
        chunks[r["doc_id"]] = [
            " ".join(ws[i : i + PARA_TOKENS])
            for i in range(0, len(ws), PARA_TOKENS)
        ]
        src[r["doc_id"]] = r["source"]
    per_src = {}  # (source, para) -> set(doc_id)
    for d, ps in chunks.items():
        for p in ps:
            per_src.setdefault((src[d], p), set()).add(d)
    kill = {k for k, v in per_src.items() if len(v) >= BP_MIN_DOCS}
    expect = {}
    any_stripped = False
    for d, ps in chunks.items():
        kept = [p for p in ps if (src[d], p) not in kill]
        any_stripped = any_stripped or len(kept) < len(ps)
        clean = " ".join(kept)
        expect[d] = (
            len(ps), len(kept),
            H.md5(clean.encode()).hexdigest(), len(clean),
        )
    assert any_stripped  # fixture exercises the strip path
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_md5"], r["clean_len"])
        for r in Q.QUERIES["boilerplate_remove"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_split_by_host_matches_python(spark):
    rows = _pages(spark, "url", "text")
    agg: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        m = re.match(r"^[A-Za-z]+://([^/:?#]+)", r["url"])
        host = m.group(1).lower()
        a = agg[host]
        a[0] += 1
        a[1] += len(r["text"])
    from pdxbldgimport_spark.queries_crawl import (
        SPLIT_TEST_BUCKETS,
        SPLIT_VAL_BUCKETS,
    )

    def split_of(host: str) -> str:
        hx = hashlib.md5(host.encode()).hexdigest()
        h60 = sum(int(hx[n], 16) * 16 ** n for n in range(15))
        b = h60 % 100
        if b < SPLIT_VAL_BUCKETS:
            return "val"
        if b < SPLIT_VAL_BUCKETS + SPLIT_TEST_BUCKETS:
            return "test"
        return "train"

    expect = {
        h: (split_of(h), c[0], c[1]) for h, c in agg.items()
    }
    got = {
        r["host"]: (r["split"], r["n_pages"], r["n_chars"])
        for r in Q.QUERIES["split_by_host"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # the split must actually split: at 250 hosts all three classes
    # should be populated (5/5/90 expected)
    assert {s for s, _, _ in got.values()} == {"train", "val", "test"}


def test_domain_mix_report_matches_python(spark):
    from pdxbldgimport_spark.queries_crawl import MIX_TOP_K

    rows = _pages(spark, "url", "text")
    agg: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        m = re.match(r"^[A-Za-z]+://([^/:?#]+)", r["url"])
        host = m.group(1).lower()
        a = agg[host]
        a[0] += 1
        a[1] += len(r["text"].split(" "))
    tp = sum(a[0] for a in agg.values())
    tt = sum(a[1] for a in agg.values())
    head = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:MIX_TOP_K]
    expect = {}
    cum = 0
    for i, (host, (np_, nt)) in enumerate(head, start=1):
        cum += nt
        expect[i] = (host, np_, nt, 1000000 * nt // tt, 1000000 * cum // tt)
    sp = sum(np_ for _, (np_, _) in head)
    st = sum(nt for _, (_, nt) in head)
    expect[MIX_TOP_K + 1] = (
        "__rest__", tp - sp, tt - st, 1000000 * (tt - st) // tt, 1000000,
    )
    got = {
        r["rank"]: (
            r["host"], r["n_pages"], r["n_tokens"],
            r["share_ppm"], r["cum_share_ppm"],
        )
        for r in Q.QUERIES["domain_mix_report"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_cdc_apply_all_five_merge_statuses_live(spark):
    """Fixture-liveness guard: the synth CDC derivation must keep every
    MERGE arm populated at the oracle SF (a synth change that silently
    empties an arm would leave that branch untested by the gate)."""
    from tests.conftest import SF_ORACLE

    rows = Q.QUERIES["cdc_apply"](spark, SF_ORACLE).toPandas()
    assert set(rows["status"]) == {
        "unchanged",
        "updated",
        "inserted",
        "deleted",
        "void",
    }
