"""Brute-force property checks for the round-5 analytics batch:
events_funnel / events_retention vs literal per-user Python over the
real sf0.001 events, tile_rollup vs a dict-roll of the per-tile counts,
and url_frontier vs a per-host sort — each independent of the DuckDB
oracle's SQL formulation, so a shared SQL misunderstanding can't hide."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timedelta

from pdxbldgimport_spark import registry as Q
from tests.conftest import SF_SMOKE


def _events(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.sql(
        "SELECT event_id, user_id, event_type, "
        "cast(ts as timestamp) AS ts, "
        "unix_micros(cast(ts as timestamp)) AS us FROM events"
    ).collect()
    return [r.asDict() for r in rows]


def test_events_funnel_matches_bruteforce(spark):
    ev = _events(spark)
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e)
    n = [0, 0, 0]
    lag = [0, 0, 0]
    for rows in by_user.values():
        t1 = min((r["us"] for r in rows if r["event_type"] == "view"),
                 default=None)
        if t1 is None:
            continue
        n[0] += 1
        t2 = min((r["us"] for r in rows
                  if r["event_type"] == "click" and r["us"] >= t1),
                 default=None)
        if t2 is None:
            continue
        n[1] += 1
        lag[1] += t2 - t1
        t3 = min((r["us"] for r in rows
                  if r["event_type"] == "purchase" and r["us"] >= t2),
                 default=None)
        if t3 is None:
            continue
        n[2] += 1
        lag[2] += t3 - t2
    got = {
        r["step"]: (r["n_users"], r["lag_us_sum"])
        for r in (x.asDict()
                  for x in Q.QUERIES["events_funnel"](spark, SF_SMOKE).collect())
    }
    assert got == {1: (n[0], 0), 2: (n[1], lag[1]), 3: (n[2], lag[2])}
    assert n[0] > 0 and n[2] <= n[1] <= n[0]


def _monday(ts: datetime) -> datetime:
    d = ts.date() - timedelta(days=ts.weekday())
    return datetime(d.year, d.month, d.day)


def test_events_retention_matches_bruteforce(spark):
    ev = _events(spark)
    first = {}
    for e in ev:
        u = e["user_id"]
        if u not in first or e["ts"] < first[u]:
            first[u] = e["ts"]
    cohort = {u: _monday(t) for u, t in first.items()}
    cells = defaultdict(set)
    for e in ev:
        w = _monday(e["ts"])
        off = (w - cohort[e["user_id"]]).days // 7
        cells[(cohort[e["user_id"]], off)].add(e["user_id"])
    expect = {k: len(v) for k, v in cells.items()}
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in (x.asDict() for x in
                  Q.QUERIES["events_retention"](spark, SF_SMOKE).collect())
    }
    assert got == expect and all(
        (c, 0) in got for c, _ in got
    )  # every cohort has an offset-0 cell by construction


def test_tile_rollup_matches_dict_roll(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    from pdxbldgimport_spark.geo import cells as C
    from pdxbldgimport_spark.queries import _ix_sql, _iy_sql

    detail = {
        (r["ix"], r["iy"]): r["n"]
        for r in spark.sql(
            f"SELECT {_ix_sql('lon', C.RES_TILE)} AS ix, "
            f"{_iy_sql('lat', C.RES_TILE)} AS iy, COUNT(*) AS n "
            "FROM pages GROUP BY 1, 2"
        ).collect()
    }
    expect = {}
    for (ix, iy), v in detail.items():
        expect[(ix, iy, 0)] = expect.get((ix, iy, 0), 0) + v
        expect[(ix, -1, 1)] = expect.get((ix, -1, 1), 0) + v
        expect[(-1, -1, 3)] = expect.get((-1, -1, 3), 0) + v
    got = {
        (r["ix"], r["iy"], r["gid"]): r["n_pages"]
        for r in (x.asDict() for x in
                  Q.QUERIES["tile_rollup"](spark, SF_SMOKE).collect())
    }
    assert got == expect
    assert got[(-1, -1, 3)] == sum(detail.values())


def test_url_frontier_matches_per_host_sort(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_crawl import FRONTIER_WAVES
    from pdxbldgimport_spark.queries_text import _h60_sql
    from pdxbldgimport_spark.queries_web import RAW_HOST_RE

    views(spark, SF_SMOKE)
    h = _h60_sql("md5(cast(url as binary))", "instr")
    rows = spark.sql(
        f"SELECT page_id, lower(regexp_extract(url, '{RAW_HOST_RE}', 1)) "
        f"AS host, {h} AS h FROM pages"
    ).collect()
    by_host = defaultdict(list)
    for r in rows:
        by_host[r["host"]].append((r["h"], r["page_id"]))
    expect = {}
    for host, lst in by_host.items():
        delay = 1 + int("".join(c for c in host if c.isdigit()) or 0) % 5
        for wave, (_, pid) in enumerate(sorted(lst)):
            if wave >= FRONTIER_WAVES:
                break
            expect[pid] = (host, wave, wave * delay)
    got = {
        r["page_id"]: (r["host"], r["wave"], r["sched_s"])
        for r in (x.asDict() for x in
                  Q.QUERIES["url_frontier"](spark, SF_SMOKE).collect())
    }
    assert got == expect and len(got) > 0
    # politeness invariant: waves within a host are dense from 0
    per_host = defaultdict(list)
    for host, wave, _ in got.values():
        per_host[host].append(wave)
    for waves in per_host.values():
        assert sorted(waves) == list(range(len(waves)))


def test_score_normalize_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    docs = [r.asDict() for r in
            spark.sql("SELECT doc_id, lang, n_chars FROM documents").collect()]
    by_lang = defaultdict(list)
    for d in docs:
        by_lang[d["lang"]].append(d["n_chars"])
    bounds = {}
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)

        def pct(p):
            # smallest value whose cumulative count reaches p% of n
            cum = 0
            seen = 0
            for v in vals:
                cum += 1
                if 100 * cum >= p * n:
                    return v
            return vals[-1]

        bounds[lang] = (pct(5), pct(95))
    expect = {}
    for d in docs:
        lo, hi = bounds[d["lang"]]
        c = min(max(d["n_chars"], lo), hi)
        ppm = 0 if hi == lo else (1000000 * (c - lo)) // (hi - lo)
        expect[d["doc_id"]] = (d["lang"], lo, hi, ppm)
    got = {
        r["doc_id"]: (r["lang"], r["lo"], r["hi"], r["norm_ppm"])
        for r in (x.asDict() for x in
                  Q.QUERIES["score_normalize"](spark, SF_SMOKE).collect())
    }
    assert got == expect and len(got) == len(docs)
    assert all(0 <= v[3] <= 1_000_000 for v in got.values())


def test_phrase_search_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_web import (
        PHRASE_TOP_K,
        PHRASE_W1,
        PHRASE_W2,
    )

    views(spark, SF_SMOKE)
    docs = [r.asDict() for r in
            spark.sql("SELECT doc_id, text FROM documents").collect()]
    counts = {}
    for d in docs:
        w = d["text"].split(" ")
        n = sum(
            1
            for i in range(len(w) - 1)
            if w[i] == PHRASE_W1 and w[i + 1] == PHRASE_W2
        )
        if n > 0:
            counts[d["doc_id"]] = n
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = expect[:PHRASE_TOP_K]
    got = [
        (r["doc_id"], r["n_occ"])
        for r in (x.asDict() for x in
                  Q.QUERIES["phrase_search"](spark, SF_SMOKE).collect())
    ]
    assert got == expect and len(got) > 0


def test_skyline_pareto_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    docs = [
        (r["doc_id"], r["n_chars"], len(set(r["text"].split(" "))))
        for r in spark.table("documents").collect()
    ]
    expect = {
        (i, x, y)
        for i, x, y in docs
        if not any(
            bx >= x and by >= y and (bx > x or by > y)
            for _, bx, by in docs
        )
    }
    got = {
        (r["doc_id"], r["n_chars"], r["n_types"])
        for r in Q.QUERIES["skyline_pareto"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert got  # frontier is never empty


def test_embedding_gram_matches_numpy(spark):
    import numpy as np

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    raw = spark.table("embeddings").collect()
    qm = np.floor(
        np.array([r["embedding"] for r in raw], dtype=np.float64) * 1000.0
    ).astype(np.int64)
    gm = qm.T @ qm
    got = {
        (r["i"], r["j"]): r["g"]
        for r in Q.QUERIES["embedding_gram"](spark, SF_SMOKE).collect()
    }
    d = qm.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), g in got.items():
        assert g == int(gm[i, j]), (i, j)


def test_zorder_layout_matches_python_sort(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_spatial import (
        RES_Z,
        ZORDER_ROWS_PER_FILE,
    )
    from pdxbldgimport_spark.geo import cells as C

    views(spark, SF_SMOKE)
    n = 1 << RES_Z
    pages = spark.sql("SELECT page_id, lon, lat FROM pages").collect()

    import math

    def zkey(lon, lat):
        ix = min(max(int(math.floor((lon - C.LON_W) / C.SPAN_X * n)), 0), n - 1)
        iy = min(max(int(math.floor((lat - C.LAT_S) / C.SPAN_Y * n)), 0), n - 1)
        z = 0
        for b in range(RES_Z):
            z |= ((ix >> b) & 1) << (2 * b + 1)
            z |= ((iy >> b) & 1) << (2 * b)
        return z

    order = sorted((zkey(r["lon"], r["lat"]), r["page_id"]) for r in pages)
    expect = {
        pid: (z, pos // ZORDER_ROWS_PER_FILE)
        for pos, (z, pid) in enumerate(order)
    }
    got = {
        r["page_id"]: (r["zkey"], r["file_id"])
        for r in Q.QUERIES["zorder_layout"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_events_transitions_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries_events import SESSION_GAP_S

    ev = _events(spark)
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e)
    expect = defaultdict(lambda: [0, 0])
    for rows in by_user.values():
        rows.sort(key=lambda e: (e["ts"], e["event_id"]))
        for a, b in zip(rows, rows[1:]):
            gap = b["us"] - a["us"]
            if gap <= SESSION_GAP_S * 1_000_000:
                cell = expect[(a["event_type"], b["event_type"])]
                cell[0] += 1
                cell[1] += gap
    got = {
        (r["src"], r["dst"]): [r["n_trans"], r["gap_us_sum"]]
        for r in Q.QUERIES["events_transitions"](spark, SF_SMOKE).collect()
    }
    assert got == dict(expect)
    assert got


def test_events_anomaly_matches_bruteforce(spark):
    ev = _events(spark)
    grid = defaultdict(int)
    for e in ev:
        hr = e["ts"].replace(minute=0, second=0, microsecond=0)
        grid[(e["event_type"], hr)] += 1
    by_type = defaultdict(list)
    for (et, hr), c in grid.items():
        by_type[et].append((hr, c))
    expect = set()
    for et, cells in by_type.items():
        n = len(cells)
        s = sum(c for _, c in cells)
        q = sum(c * c for _, c in cells)
        for hr, c in cells:
            if (n * c - s) ** 2 > 9 * (n * q - s * s):
                expect.add((et, hr, c))
    got = {
        (r["event_type"], r["hr"], r["c"])
        for r in Q.QUERIES["events_anomaly"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def _geohash_ref(lon: float, lat: float, nchars: int = 6) -> str:
    """Textbook interval-halving geohash encoder (independent of the
    engine's Morton formulation)."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo = [-90.0, -180.0]  # lat, lon
    hi = [90.0, 180.0]
    vals = {0: lat, 1: lon}
    bits = []
    axis = 1  # geohash starts with a longitude bit
    while len(bits) < 5 * nchars:
        mid = (lo[axis] + hi[axis]) / 2
        if vals[axis] >= mid:
            bits.append(1)
            lo[axis] = mid
        else:
            bits.append(0)
            hi[axis] = mid
        axis = 1 - axis
    out = []
    for k in range(nchars):
        v = 0
        for b in bits[5 * k : 5 * k + 5]:
            v = v * 2 + b
        out.append(alphabet[v])
    return "".join(out)


def test_geohash_encode_matches_interval_halving(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    pages = spark.sql("SELECT page_id, lon, lat FROM pages").collect()
    expect = {
        r["page_id"]: _geohash_ref(r["lon"], r["lat"]) for r in pages
    }
    got = {
        r["page_id"]: r["geohash6"]
        for r in Q.QUERIES["geohash_encode"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_events_downsample_matches_bruteforce(spark):
    import math

    ev = _events(spark)
    vals = {
        r["event_id"]: r
        for r in (
            x.asDict()
            for x in spark.sql(
                "SELECT event_id, value FROM events"
            ).collect()
        )
    }
    groups = defaultdict(list)
    for e in ev:
        hr = e["ts"].replace(minute=0, second=0, microsecond=0)
        cents = int(math.floor(vals[e["event_id"]]["value"] * 100 + 0.5))
        groups[(e["event_type"], hr)].append((e["us"], e["event_id"], cents))
    expect = {}
    for k, rows in groups.items():
        rows.sort()
        cents = [c for _, _, c in rows]
        expect[k] = (
            rows[0][2], rows[-1][2], min(cents), max(cents),
            len(rows), sum(cents),
        )
    got = {
        (r["event_type"], r["hr"]): (
            r["open_cents"], r["close_cents"], r["lo_cents"],
            r["hi_cents"], r["n_events"], r["vol_cents"],
        )
        for r in (
            x.asDict()
            for x in Q.QUERIES["events_downsample"](spark, SF_SMOKE).collect()
        )
    }
    assert got == expect and len(got) > 0


def test_session_path_topk_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries_events import K_PATHS, SESSION_GAP_S

    ev = _events(spark)
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append((e["us"], e["event_id"], e["event_type"]))
    paths = defaultdict(int)
    for rows in by_user.values():
        rows.sort()
        cur = []
        prev = None
        for us, _, et in rows:
            if prev is not None and us - prev > SESSION_GAP_S * 1_000_000:
                paths[">".join(cur)] += 1
                cur = []
            cur.append(et)
            prev = us
        if cur:
            paths[">".join(cur)] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:K_PATHS]
    got = [
        (r["path"], r["n_sessions"])
        for r in (
            x.asDict()
            for x in Q.QUERIES["session_path_topk"](spark, SF_SMOKE).collect()
        )
    ]
    assert got == expect and len(got) > 0


def test_host_reach2_matches_set_algebra(spark):
    """2-hop logic vs Python set algebra over the SAME extracted edge
    list (the extraction itself is gated by outlink_extract's oracle +
    test_web.py) — verifies the join/distinct/count composition."""
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_web import _host_edges_df

    views(spark, SF_SMOKE)
    edges = {
        (r["src_host"], r["dst_host"])
        for r in _host_edges_df(spark).distinct().collect()
    }
    out = defaultdict(set)
    for s, d in edges:
        out[s].add(d)
    expect = {}
    for s in out:
        two = {d2 for x in out[s] for d2 in out.get(x, ()) if d2 != s}
        if two:
            expect[s] = len(two)
    got = {
        r["host"]: r["reach2"]
        for r in Q.QUERIES["host_reach2"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_tfidf_topk_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import N_TFIDF_TOP

    views(spark, SF_SMOKE)
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.table("documents").collect()
    }
    n_docs = len(docs)
    df = defaultdict(int)
    for toks in docs.values():
        for w in set(toks):
            df[w] += 1
    expect = set()
    for d, toks in docs.items():
        tf = defaultdict(int)
        for w in toks:
            tf[w] += 1
        scored = sorted(
            ((tf[w] * n_docs * 1_000_000) // df[w], w) for w in tf
        )
        top = sorted(scored, key=lambda sw: (-sw[0], sw[1]))[:N_TFIDF_TOP]
        for s, w in top:
            expect.add((d, w, tf[w], df[w], s))
    got = {
        (r["doc_id"], r["w"], r["tf"], r["df"], r["score"])
        for r in Q.QUERIES["tfidf_topk"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_bloom_dedup_probe_matches_bruteforce(spark):
    import hashlib

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import BLOOM_K, BLOOM_M

    views(spark, SF_SMOKE)
    docs = [
        (r["doc_id"], hashlib.md5(r["text"].encode()).hexdigest())
        for r in spark.table("documents").collect()
    ]

    def h60(hx, off):
        return sum(int(hx[off + n], 16) * 16 ** n for n in range(15))

    def positions(hx):
        h1, h2 = h60(hx, 0), h60(hx, 15)
        return {(h1 + i * h2) % BLOOM_M for i in range(BLOOM_K)}

    seen = [(d, m) for d, m in docs if d % 3 != 0]
    cand = [(d, m) for d, m in docs if d % 3 == 0]
    bits = set()
    for _, m in seen:
        bits |= positions(m)
    seen_h = {m for _, m in seen}
    expect = {
        (d, int(positions(m) <= bits), int(m in seen_h)) for d, m in cand
    }
    got = {
        (r["doc_id"], r["bloom_hit"], r["true_dup"])
        for r in Q.QUERIES["bloom_dedup_probe"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0
    # a Bloom filter never false-negatives: every true dup must hit
    assert all(bh == 1 for _, bh, td in got if td == 1)


def test_events_value_quantiles_matches_bruteforce(spark):
    import math

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.sql(
        "SELECT event_type, value FROM events"
    ).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(
            int(math.floor(r["value"] * 100 + 0.5))
        )
    expect = {}
    for t, cents in by_type.items():
        cents.sort()
        n = len(cents)

        def pick(k):
            for i, c in enumerate(cents, 1):
                if 100 * i >= k * n:
                    return c

        expect[t] = (pick(50), pick(90), pick(99), n)
    got = {
        r["event_type"]: (
            r["p50_cents"], r["p90_cents"], r["p99_cents"], r["n_events"]
        )
        for r in Q.QUERIES["events_value_quantiles"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_type_cooccurrence_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.sql("SELECT user_id, event_type FROM events").collect()
    types = defaultdict(set)
    for r in rows:
        types[r["user_id"]].add(r["event_type"])
    pairs = defaultdict(int)
    for ts in types.values():
        s = sorted(ts)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pairs[(s[i], s[j])] += 1
    got = {
        (r["type_a"], r["type_b"]): r["n_users"]
        for r in Q.QUERIES["type_cooccurrence"](spark, SF_SMOKE).collect()
    }
    assert got == dict(pairs) and len(got) > 0


def test_host_gini_matches_bruteforce(spark):
    import re

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    urls = [r["url"] for r in spark.sql("SELECT url FROM pages").collect()]
    counts = defaultdict(int)
    for u in urls:
        counts[re.match(r"^[A-Za-z]+://([^/:?#]+)", u).group(1).lower()] += 1
    xs = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    sx = sum(x for _, x in xs)
    s1 = sum(i * x for i, (_, x) in enumerate(xs, 1))
    gini_ppm = ((2 * s1 - (n + 1) * sx) * 1_000_000) // (n * sx)
    row = Q.QUERIES["host_gini"](spark, SF_SMOKE).collect()[0]
    assert (row["gini_ppm"], row["n_hosts"], row["n_pages"]) == (
        gini_ppm, n, sx,
    )


def test_link_reciprocity_matches_set_algebra(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_web import _host_edges_df

    views(spark, SF_SMOKE)
    edges = {
        (r["src_host"], r["dst_host"])
        for r in _host_edges_df(spark).distinct().collect()
        if r["src_host"] != r["dst_host"]
    }
    n_mutual = sum(1 for s, d in edges if (d, s) in edges)
    row = Q.QUERIES["link_reciprocity"](spark, SF_SMOKE).collect()[0]
    assert (row["n_edges"], row["n_mutual"], row["reciprocity_ppm"]) == (
        len(edges), n_mutual, n_mutual * 1_000_000 // len(edges),
    )
    assert len(edges) > 0


def test_events_rate_flags_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries_events import RATE_K, RATE_WINDOW_S

    ev = _events(spark)
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append((e["us"], e["event_id"]))
    expect = {}
    win = RATE_WINDOW_S * 1_000_000
    for rows in by_user.values():
        for us, eid in rows:
            n = sum(1 for u2, _ in rows if us - win <= u2 <= us)
            expect[eid] = (n, int(n > RATE_K))
    got = {
        r["event_id"]: (r["n_win"], r["flagged"])
        for r in Q.QUERIES["events_rate_flags"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_token_diversity_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.table("documents").collect()
    }
    expect = {}
    for d, toks in docs.items():
        c = defaultdict(int)
        for w in toks:
            c[w] += 1
        n = len(toks)
        sumsq = sum(v * v for v in c.values())
        expect[d] = (
            n, len(c), len(c) * 1_000_000 // n,
            (n * n - sumsq) * 1_000_000 // (n * n),
        )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_types"], r["ttr_ppm"], r["impurity_ppm"]
        )
        for r in Q.QUERIES["token_diversity"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_host_components_matches_union_find(spark):
    import hashlib

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_web import _host_edges_df

    views(spark, SF_SMOKE)
    edges = {
        (r["src_host"], r["dst_host"])
        for r in _host_edges_df(spark).distinct().collect()
        if r["src_host"] != r["dst_host"]
    }
    hosts = {h for e in edges for h in e}

    def h60(h):
        hx = hashlib.md5(h.encode()).hexdigest()
        return sum(int(hx[n], 16) * 16 ** n for n in range(15))

    parent = {h: h for h in hosts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = defaultdict(set)
    for h in hosts:
        comps[find(h)].add(h)
    expect = {}
    for members in comps.values():
        label = min(h60(h) for h in members)
        for h in members:
            expect[h] = label
    got = {
        r["host"]: r["component_id"]
        for r in Q.QUERIES["host_components"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_events_dau_wau_matches_bruteforce(spark):
    ev = _events(spark)
    by_day = defaultdict(set)
    for e in ev:
        by_day[e["us"] // 86_400_000_000].add(e["user_id"])
    expect = {}
    for d, users in by_day.items():
        wau = set()
        for k in range(7):
            wau |= by_day.get(d - k, set())
        expect[d] = (len(users), len(wau))
    got = {
        r["day_idx"]: (r["dau"], r["wau"])
        for r in Q.QUERIES["events_dau_wau"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_tile_rate_smoothed_matches_bruteforce(spark):
    import math

    from pdxbldgimport_spark.geo import cells as GC
    from pdxbldgimport_spark.queries import SMOOTH_K, SMOOTH_TERM, views

    views(spark, SF_SMOKE)
    rows = spark.sql("SELECT lon, lat, text FROM pages").collect()
    g = defaultdict(lambda: [0, 0])
    for r in rows:
        ix = min(max(math.floor((r["lon"] - GC.LON_W) / GC.SPAN_X * 32), 0), 31)
        iy = min(max(math.floor((r["lat"] - GC.LAT_S) / GC.SPAN_Y * 32), 0), 31)
        t = iy * 32 + ix
        g[t][0] += 1
        g[t][1] += int(SMOOTH_TERM in r["text"])
    nn = sum(v[0] for v in g.values())
    cc = sum(v[1] for v in g.values())
    expect = {
        t: (n, c, c * 1_000_000 // n,
            (c * nn + SMOOTH_K * cc) * 1_000_000 // (nn * (n + SMOOTH_K)))
        for t, (n, c) in g.items()
    }
    got = {
        r["tile_id"]: (r["n"], r["c"], r["raw_ppm"], r["smoothed_ppm"])
        for r in Q.QUERIES["tile_rate_smoothed"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0
    # shrinkage sanity: sparse tiles sit closer to the corpus rate
    corpus_ppm = cc * 1_000_000 // nn
    for t, (n, c, raw, sm) in got.items():
        assert min(raw, corpus_ppm) - 1 <= sm <= max(raw, corpus_ppm) + 1


def test_crawl_budget_apportion_sums_exactly(spark):
    import re

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_crawl import CRAWL_BUDGET

    views(spark, SF_SMOKE)
    urls = [r["url"] for r in spark.sql("SELECT url FROM pages").collect()]
    counts = defaultdict(int)
    for u in urls:
        counts[re.match(r"^[A-Za-z]+://([^/:?#]+)", u).group(1).lower()] += 1
    sx = sum(counts.values())
    base = {h: CRAWL_BUDGET * x // sx for h, x in counts.items()}
    rem = {h: CRAWL_BUDGET * x % sx for h, x in counts.items()}
    topup = CRAWL_BUDGET - sum(base.values())
    order = sorted(counts, key=lambda h: (-rem[h], h))
    expect = {
        h: (counts[h], base[h] + (1 if i < topup else 0))
        for i, h in enumerate(order)
    }
    got = {
        r["host"]: (r["x"], r["alloc"])
        for r in Q.QUERIES["crawl_budget_apportion"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert sum(a for _, a in got.values()) == CRAWL_BUDGET


def test_corpus_drift_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_crawl import (
        CORPUS_HOURS, DRIFT_BUCKET_CHARS,
    )

    views(spark, SF_SMOKE)
    rows = spark.sql(
        "SELECT length(text) AS L, hour(warc_ts) AS h FROM pages"
    ).collect()
    g = defaultdict(lambda: [0, 0])
    for r in rows:
        g[r["L"] // DRIFT_BUCKET_CHARS][0 if r["h"] < CORPUS_HOURS else 1] += 1
    na = sum(v[0] for v in g.values())
    nb = sum(v[1] for v in g.values())
    expect = {}
    for k, (a, b) in g.items():
        sa, sb = a * 1_000_000 // na, b * 1_000_000 // nb
        expect[k] = (a, b, sa, sb, (sa - sb) * (sa - sb) // (sa + sb + 1))
    got = {
        r["len_bucket"]: (
            r["a"], r["b"], r["share_a_ppm"], r["share_b_ppm"],
            r["drift_score"],
        )
        for r in Q.QUERIES["corpus_drift"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_table_profile_matches_bruteforce(spark):
    import math

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = [r.asDict() for r in spark.table("lineitem").collect()]

    def canon(c, v):
        # mirror the query's order-preserving int64 canonicalization
        if v is None:
            return None
        if c in ("l_returnflag", "l_linestatus"):
            return ord(v)
        if c == "l_shipdate":
            # spark collects NTZ as naive datetime; epoch from utc
            import calendar
            return calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
        if c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
            return int(math.floor(v * 100 + 0.5))
        return int(v)

    from pdxbldgimport_spark.queries_relational import _PROFILE_COLS

    expect = {}
    for c in _PROFILE_COLS:
        vals = [canon(c, r[c]) for r in rows]
        nn = [v for v in vals if v is not None]
        expect[c] = (
            len(vals), len(vals) - len(nn), len(set(nn)), min(nn), max(nn)
        )
    got = {
        r["col"]: (
            r["n_rows"], r["n_null"], r["n_distinct"],
            r["min_val"], r["max_val"],
        )
        for r in Q.QUERIES["table_profile"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) == len(_PROFILE_COLS)


def test_host_typo_pairs_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.sql(
        "SELECT lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)) AS h,"
        " count(*) AS n FROM pages GROUP BY 1"
    ).collect()
    hosts = sorted((r["h"], r["n"]) for r in rows)
    expect = set()
    for i in range(len(hosts)):
        a, na = hosts[i]
        for j in range(i + 1, len(hosts)):
            b, nb = hosts[j]
            if len(a) == len(b) and sum(x != y for x, y in zip(a, b)) == 1:
                expect.add((a, b, na, nb))
    out = Q.QUERIES["host_typo_pairs"](spark, SF_SMOKE).collect()
    got = {
        (r["host_a"], r["host_b"], r["hits_a"], r["hits_b"]) for r in out
    }
    assert len(out) == len(got)  # exactly-once pair enumeration
    assert got == expect and len(got) > 0


def test_orders_month_pivot_matches_bruteforce(spark):
    import math

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_relational import _PIVOT_YEAR

    views(spark, SF_SMOKE)
    rows = spark.sql(
        "SELECT o_orderpriority AS p, month(o_orderdate) AS m,"
        " year(o_orderdate) AS y, o_totalprice AS v FROM orders"
    ).collect()
    agg = defaultdict(lambda: [None] * 12)
    for r in rows:
        if r["y"] != _PIVOT_YEAR:
            continue
        cur = agg[r["p"]]
        c = math.floor(r["v"] * 100)
        cur[r["m"] - 1] = (cur[r["m"] - 1] or 0) + c
    got = {
        r["o_orderpriority"]: tuple(r[f"m{m:02d}"] for m in range(1, 13))
        for r in Q.QUERIES["orders_month_pivot"](spark, SF_SMOKE).collect()
    }
    assert got == {p: tuple(v) for p, v in agg.items()} and len(got) > 0


def test_media_dedup_exact_matches_bruteforce(spark):
    import hashlib

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.table("media").select(
        "doc_id", "frame_len", "n_frames", "payload"
    ).collect()
    agg = {}
    for r in rows:
        nf = r["n_frames"] or 1
        fl = r["frame_len"]
        pay = bytes(r["payload"])
        for i in range(nf):
            d = hashlib.md5(pay[i * fl:(i + 1) * fl]).hexdigest()
            cur = agg.setdefault(d, [0, set(), None])
            cur[0] += 1
            cur[1].add(r["doc_id"])
            k = r["doc_id"] * 16 + i
            cur[2] = k if cur[2] is None or k < cur[2] else cur[2]
    expect = {
        d: (c, len(s), k // 16, k % 16) for d, (c, s, k) in agg.items()
    }
    got = {
        r["digest"]: (
            r["n_copies"], r["n_docs"], r["keeper_doc"], r["keeper_frame"]
        )
        for r in Q.QUERIES["media_dedup_exact"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # synth videos repeat one frame n_frames times: live dup clusters
    assert max(c for c, *_ in expect.values()) >= 4


def test_encoding_quality_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.table("docs_noisy").select("doc_id", "text").collect()
    expect = {}
    for r in rows:
        t = r["text"]
        n = len(t)
        n_rep = t.count("�")
        n_ctrl = sum(
            1 for ch in t
            if ord(ch) < 0x20 and ch not in ("\t", "\n", "\r")
        )
        n_na = sum(1 for ch in t if ord(ch) > 0x7F)
        ppm = n_na * 1000000 // max(n, 1)
        verdict = (
            "mojibake" if n_rep else
            "control" if n_ctrl else
            "nonascii" if n_na else "clean"
        )
        expect[r["doc_id"]] = (n, n_rep, n_ctrl, ppm, verdict)
    got = {
        r["doc_id"]: (
            r["n_chars"], r["n_replacement"], r["n_ctrl"],
            r["nonascii_ppm"], r["verdict"],
        )
        for r in Q.QUERIES["encoding_quality"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # every defect class is live in the fixture
    verdicts = {v[-1] for v in expect.values()}
    assert verdicts == {"clean", "mojibake", "control", "nonascii"}


def test_fk_integrity_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_relational import _FK_EDGES

    views(spark, SF_SMOKE)
    expect = {}
    for rel, ct, ck, pt, pk in _FK_EDGES:
        ckeys = [r[0] for r in spark.table(ct).select(ck).collect()]
        pkeys = {r[0] for r in spark.table(pt).select(pk).collect()}
        n_orphan = sum(1 for k in ckeys if k not in pkeys)
        n_childless = len(pkeys - set(ckeys))
        expect[rel] = (len(ckeys), n_orphan, len(pkeys), n_childless)
    got = {
        r["rel"]: (
            r["n_child"], r["n_orphan"], r["n_parent"], r["n_childless"]
        )
        for r in Q.QUERIES["fk_integrity"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) == len(_FK_EDGES)
    assert all(v[1] == 0 for v in expect.values())  # generator consistent
    assert any(v[3] > 0 for v in expect.values())   # childless live


def test_revenue_rollup_matches_bruteforce(spark):
    import math

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.sql(
        "SELECT n_name, year(o_orderdate) AS y, o_totalprice AS v"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey"
    ).collect()
    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        c = math.floor(r["v"] * 100)
        for key in (
            (r["n_name"], r["y"], 0),
            (r["n_name"], -1, 1),
            ("ALL", -1, 3),
        ):
            agg[key][0] += c
            agg[key][1] += 1
    got = {
        (r["nation"], r["o_year"], r["lvl"]): (r["revenue_c"], r["n_orders"])
        for r in Q.QUERIES["revenue_rollup"](spark, SF_SMOKE).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()} and len(got) > 3


def test_path_prefix_rollup_matches_bruteforce(spark):
    import re

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.table("pages").select("url", "doc_id").collect()
    agg = defaultdict(lambda: [0, set()])
    for r in rows:
        m = re.match(r"^[A-Za-z]+://([^/?#]+)([^?#]*)", r["url"])
        host = m.group(1).lower()
        # RAW_HOST_RE also strips the port
        host = host.split(":")[0]
        path = re.sub(r"/+$", "", m.group(2))
        segs = [s for s in path.split("/") if s]
        for d in (1, 2):
            if len(segs) >= d:
                p = "/" + "/".join(segs[:d])
                cur = agg[(host, p, d)]
                cur[0] += 1
                cur[1].add(r["doc_id"])
    expect = {k: (c, len(s)) for k, (c, s) in agg.items()}
    got = {
        (r["host"], r["prefix"], r["depth"]): (r["n_pages"], r["n_docs"])
        for r in Q.QUERIES["path_prefix_rollup"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0
    assert any(k[2] == 2 for k in got)  # depth-2 prefixes live


def test_manifest_prune_matches_bruteforce(spark):
    from pdxbldgimport_spark.geo import cells as C
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_spatial import (
        _PRUNE_ROWS_PER_FILE,
        _prune_probe_bounds,
    )

    views(spark, SF_SMOKE)
    rows = spark.table("pages").select("page_id", "lon", "lat").collect()
    n = 1 << C.RES_TILE

    def tile(lon, lat):
        ix = min(max(int((lon - C.LON_W) / C.SPAN_X * n), 0), n - 1)
        iy = min(max(int((lat - C.LAT_S) / C.SPAN_Y * n), 0), n - 1)
        return iy * n + ix

    man = defaultdict(
        lambda: [float("inf"), float("-inf"), float("inf"), float("-inf"), 0]
    )
    for r in rows:
        for key in (
            ("ingest", r["page_id"] // _PRUNE_ROWS_PER_FILE),
            ("tile", tile(r["lon"], r["lat"])),
        ):
            m = man[key]
            m[0] = min(m[0], r["lon"]); m[1] = max(m[1], r["lon"])
            m[2] = min(m[2], r["lat"]); m[3] = max(m[3], r["lat"])
            m[4] += 1
    expect = {}
    for layout in ("ingest", "tile"):
        files = {k: v for k, v in man.items() if k[0] == layout}
        ft = len(files)
        rt = sum(v[4] for v in files.values())
        for pid, px0, px1, py0, py1 in _prune_probe_bounds():
            hit = [
                v for v in files.values()
                if v[0] <= px1 and v[1] >= px0 and v[2] <= py1 and v[3] >= py0
            ]
            fh = len(hit)
            expect[(layout, pid)] = (
                ft, rt, fh, sum(v[4] for v in hit),
                (ft - fh) * 1000000 // ft,
            )
    got = {
        (r["layout"], r["probe_id"]): (
            r["files_total"], r["rows_total"], r["files_hit"],
            r["rows_hit"], r["prune_ppm"],
        )
        for r in Q.QUERIES["manifest_prune"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    # the clustered layout must actually prune on the small probe while
    # the ingest layout (files spanning the extent) prunes ~nothing
    assert got[("tile", 0)][4] > got[("ingest", 0)][4]
    assert got[("tile", 0)][4] > 900000


def test_hard_negative_mine_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import (
        COS_TAU2_PPM, N_PLANES, N_QUERIES, TOP_K, _eq_with_clones, _plane,
    )

    views(spark, SF_SMOKE)
    vecs = {
        r["vec_id"]: list(r["q"])
        for r in _eq_with_clones(spark).collect()
    }
    planes = [_plane(i) for i in range(N_PLANES)]

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    sig = {
        v: sum(
            (1 << i) for i, p in enumerate(planes) if dot(q, p) > 0
        )
        for v, q in vecs.items()
    }
    buckets = defaultdict(list)
    for v in vecs:
        buckets[sig[v]].append(v)

    def is_dup(a, b):
        qa, qb = vecs[a], vecs[b]
        d = dot(qa, qb)
        return d > 0 and d * d >= (
            COS_TAU2_PPM * dot(qa, qa) // 1000000
        ) * dot(qb, qb)

    expect = set()
    for qid in [v for v in vecs if v < N_QUERIES]:
        cands = [
            (dot(vecs[qid], vecs[c]), c)
            for c in buckets[sig[qid]]
            if c != qid and not is_dup(qid, c)
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rn, (d, c) in enumerate(cands[:TOP_K], 1):
            expect.add((qid, c, d, rn))
    got = {
        (r["query_id"], r["neighbor"], r["dot"], r["rn"])
        for r in Q.QUERIES["hard_negative_mine"](spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0
    # exclusion is live: at least one clone pair sits in some query's
    # bucket and was removed (clone ids are original + 100000)
    dup_excluded = any(
        v >= 100000 and v - 100000 < N_QUERIES for v in vecs
    )
    assert dup_excluded


# ----------------------------------------------------------------------
# closing quartet: idw_interpolate / scd2_history / lang_source_cube /
# embedding_quantize vs literal Python (independent of both SQL
# formulations).


def test_idw_interpolate_matches_bruteforce(spark):
    import math

    from pdxbldgimport_spark.geo import cells as C
    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_spatial import IDW_R, IDW_SCALE

    views(spark, SF_SMOKE)
    n = 1 << C.RES_TILE
    fps = spark.sql(
        "SELECT fp_id, (x0 + x1) / 2 AS cx, (y0 + y1) / 2 AS cy"
        " FROM footprints WHERE fp_id % 97 <> 5"
    ).collect()
    base = defaultdict(int)
    for r in fps:
        ix = min(max(math.floor((r["cx"] - C.LON_W) / C.SPAN_X * n), 0), n - 1)
        iy = min(max(math.floor((r["cy"] - C.LAT_S) / C.SPAN_Y * n), 0), n - 1)
        base[iy * n + ix] += 1
    expect = defaultdict(lambda: [0, 0, 0])  # t -> [n_sources, num, den]
    for t, c in base.items():
        ix, iy = t % n, t // n
        for dx in range(-IDW_R, IDW_R + 1):
            for dy in range(-IDW_R, IDW_R + 1):
                if dx == 0 and dy == 0:
                    continue
                tx, ty = ix + dx, iy + dy
                if not (0 <= tx < n and 0 <= ty < n):
                    continue
                tt = ty * n + tx
                if tt in base:
                    continue
                w = IDW_SCALE // (dx * dx + dy * dy)
                cur = expect[tt]
                cur[0] += 1
                cur[1] += c * w
                cur[2] += w
    got = {
        r["tile_id"]: (r["n_sources"], r["num"], r["den"], r["est_c"])
        for r in Q.QUERIES["idw_interpolate"](spark, SF_SMOKE).collect()
    }
    assert got == {
        t: (s, num, den, num // den) for t, (s, num, den) in expect.items()
    }
    assert len(got) > 0


def _canon_py(u: str) -> str:
    import re

    m = re.match(r"^[A-Za-z]+://[^/?#]*", u)
    auth = m.group(0) if m else ""
    rest = u[len(auth):]
    auth = re.sub(r":(443|80)$", "", auth.lower())
    rest = re.sub(r"#.*", "", rest)
    path = re.sub(r"/$", "", re.sub(r"\?.*", "", rest))
    qm = re.search(r"\?(.*)", rest)
    q = qm.group(1) if qm else ""
    q = re.sub(r"^&+", "", re.sub(r"(^|&)utm_[^&]*", "", q))
    return auth + path + ("?" + q if q else "")


def test_scd2_history_matches_bruteforce(spark):
    import hashlib

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.sql(
        "SELECT url, warc_ts, page_id, text FROM pages"
    ).collect()
    caps = defaultdict(list)
    for r in rows:
        caps[_canon_py(r["url"])].append(
            (r["warc_ts"], r["page_id"],
             hashlib.md5(r["text"].encode()).hexdigest())
        )
    expect = set()
    for cu, lst in caps.items():
        lst.sort()
        vers = [x for k, x in enumerate(lst) if k == 0 or x[2] != lst[k - 1][2]]
        for i, (ts, pid, h) in enumerate(vers):
            vto = vers[i + 1][0] if i + 1 < len(vers) else None
            expect.add((cu, i + 1, h, ts, vto, 1 if vto is None else 0, pid))
    got = {
        (r["canonical_url"], r["version_no"], r["content_md5"],
         r["valid_from"], r["valid_to"], r["is_current"],
         r["first_page_id"])
        for r in Q.QUERIES["scd2_history"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert any(v[1] > 1 for v in expect)  # fixture has real version chains


def test_lang_source_cube_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    docs = spark.sql("SELECT lang, source, n_chars FROM documents").collect()
    expect = defaultdict(lambda: [0, 0])
    for r in docs:
        for key in (
            (r["lang"], r["source"], 0, 0),
            (r["lang"], "(all)", 0, 1),
            ("(all)", r["source"], 1, 0),
            ("(all)", "(all)", 1, 1),
        ):
            cur = expect[key]
            cur[0] += 1
            cur[1] += r["n_chars"]
    got = {
        (r["lang"], r["source"], r["lang_rollup"], r["source_rollup"]):
        (r["n_docs"], r["chars_sum"])
        for r in Q.QUERIES["lang_source_cube"](spark, SF_SMOKE).collect()
    }
    assert got == {k: tuple(v) for k, v in expect.items()}


def test_embedding_quantize_matches_bruteforce(spark):
    import math

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.table("embeddings").collect()
    }
    dims = len(next(iter(vecs.values())))
    mn = [min(v[i] for v in vecs.values()) for i in range(dims)]
    mx = [max(v[i] for v in vecs.values()) for i in range(dims)]
    expect = {}
    for vid, v in vecs.items():
        qs = es = 0
        qmax = None
        for i, x in enumerate(v):
            if mx[i] > mn[i]:
                q = math.floor((x - mn[i]) * 255.0 / (mx[i] - mn[i]) + 0.5)
                e = math.floor(
                    abs(x - (mn[i] + q * (mx[i] - mn[i]) / 255.0)) * 1e6 + 0.5
                )
            else:
                q = e = 0
            qs += q
            es += e
            qmax = q if qmax is None or q > qmax else qmax
        expect[vid] = (qs, qmax, es)
    got = {
        r["vec_id"]: (r["q_sum"], r["q_max"], r["err_ppm_sum"])
        for r in Q.QUERIES["embedding_quantize"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_dedup_prefix_filter_complete_vs_bruteforce(spark):
    """Completeness is the whole point of prefix filtering: compare
    against the literal all-pairs shingle-Jaccard at t=0.6 — a missed
    pair here means the prefix lemma was misapplied."""
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.sql("SELECT doc_id, text FROM documents").collect()
    sets = {}
    for r in rows:
        w = r["text"].split(" ")
        sets[r["doc_id"]] = {
            " ".join(w[i:i + 3]) for i in range(len(w) - 2)
        }
    ids = sorted(sets)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * 10 >= 6 * union:
                expect.add((a, b, inter, union))
    got = {
        (r["doc_a"], r["doc_b"], r["inter_n"], r["union_n"])
        for r in Q.QUERIES["dedup_prefix_filter"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_host_topk_pages_matches_bruteforce(spark):
    import re

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_web import TOPK_PER_HOST

    views(spark, SF_SMOKE)
    rows = spark.sql("SELECT url, page_id, length(text) AS l FROM pages").collect()
    per = defaultdict(list)
    for r in rows:
        m = re.search(r"(?i)https?://([^/?#]+)", r["url"])
        host = re.sub(r":[0-9]+$", "", m.group(1).lower())
        per[host].append((-r["l"], r["page_id"]))
    expect = set()
    for host, lst in per.items():
        lst.sort()
        for rn, (nl, pid) in enumerate(lst[:TOPK_PER_HOST], 1):
            expect.add((host, pid, -nl, rn))
    got = {
        (r["host"], r["page_id"], r["text_len"], r["rn"])
        for r in Q.QUERIES["host_topk_pages"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_agg_delta_merge_equals_full_recompute(spark):
    """The merge algebra must equal a from-scratch recompute — collected
    literally in Python over the same pages."""
    import re

    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    rows = spark.sql(
        "SELECT url, length(text) AS l, warc_ts FROM pages"
    ).collect()
    agg = {}
    for r in rows:
        m = re.search(r"(?i)https?://([^/?#]+)", r["url"])
        host = re.sub(r":[0-9]+$", "", m.group(1).lower())
        cur = agg.setdefault(host, [0, 0, None])
        cur[0] += 1
        cur[1] += r["l"]
        cur[2] = r["warc_ts"] if cur[2] is None or r["warc_ts"] > cur[2] else cur[2]
    got = {
        r["host"]: (r["n_pages"], r["chars_sum"], r["last_ts"])
        for r in Q.QUERIES["agg_delta_merge"](spark, SF_SMOKE).collect()
    }
    assert got == {h: tuple(v) for h, v in agg.items()}


def test_events_gap_fill_matches_bruteforce(spark):
    import math

    ev = _events(spark)
    # per-user LOCF over the hourly grid [floor(min), floor(max)]
    vals = {
        r["event_id"]: math.floor(r["value"] * 100 + 0.5)
        for r in spark.sql(
            "SELECT event_id, value FROM events"
        ).collect()
    }
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append((e["us"], e["event_id"]))
    expect = {}
    hour_us = 3_600_000_000
    for u, lst in by_user.items():
        lst.sort()
        g0 = lst[0][0] // hour_us * hour_us
        g1 = lst[-1][0] // hour_us * hour_us
        g = g0
        while g <= g1:
            prior = [x for x in lst if x[0] <= g]
            if prior:
                _, eid = prior[-1]
                expect[(u, g)] = (vals[eid], eid)
            else:
                expect[(u, g)] = (None, None)
            g += hour_us
    got = {
        (r["user_id"], r["hr"]): (r["last_cents"], r["last_event_id"])
        for r in Q.QUERIES["events_gap_fill"](spark, SF_SMOKE).collect()
    }
    # re-key expect by datetime for comparison
    from datetime import datetime, timezone

    expect_dt = {
        (u, datetime.fromtimestamp(g / 1_000_000, tz=timezone.utc)
            .replace(tzinfo=None)): v
        for (u, g), v in expect.items()
    }
    assert got == expect_dt
    assert any(v[0] is None for v in expect.values())  # leading-gap NULLs live


def test_sessions_concurrency_matches_bruteforce(spark):
    from pdxbldgimport_spark.queries_events import SESSION_GAP_S

    ev = _events(spark)
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append((e["us"], e["event_id"]))
    deltas = []
    for u, lst in by_user.items():
        lst.sort()
        st = lst[0][0]
        prev = lst[0][0]
        for us, _ in lst[1:]:
            if us - prev > SESSION_GAP_S * 1_000_000:
                deltas += [(st, 1), (prev + 1, -1)]
                st = us
            prev = us
        deltas += [(st, 1), (prev + 1, -1)]
    deltas.sort()  # (us, delta): -1 sorts before +1 at equal us
    run = 0
    peak = defaultdict(lambda: [None, 0])  # hr -> [peak, n_deltas]
    for us, d in deltas:
        run += d
        hr = us // 3_600_000_000
        cur = peak[hr]
        cur[0] = run if cur[0] is None or run > cur[0] else cur[0]
        cur[1] += 1
    got = {
        r["hour_idx"]: (r["peak"], r["n_deltas"])
        for r in Q.QUERIES["sessions_concurrency"](spark, SF_SMOKE).collect()
    }
    assert got == {h: tuple(v) for h, v in peak.items()}
    assert max(v[0] for v in peak.values()) > 1  # real overlap exercised


def test_areal_weight_grid_matches_bruteforce(spark):
    import math

    from pdxbldgimport_spark.geo import cells as C
    from pdxbldgimport_spark.queries import views

    views(spark, SF_SMOKE)
    n = 1 << C.RES_TILE
    fps = spark.sql(
        "SELECT x0, x1, y0, y1 FROM footprints WHERE fp_id % 97 <> 5"
    ).collect()
    expect = defaultdict(lambda: [0, 0])
    for r in fps:
        for ix in range(n):
            tx0 = C.LON_W + ix * C.SPAN_X / n
            tx1 = C.LON_W + (ix + 1) * C.SPAN_X / n
            ow = min(r["x1"], tx1) - max(r["x0"], tx0)
            if ow <= 0:
                continue
            for iy in range(n):
                ty0 = C.LAT_S + iy * C.SPAN_Y / n
                ty1 = C.LAT_S + (iy + 1) * C.SPAN_Y / n
                oh = min(r["y1"], ty1) - max(r["y0"], ty0)
                if oh <= 0:
                    continue
                cur = expect[iy * n + ix]
                cur[0] += 1
                cur[1] += math.floor(ow * oh * 1e12)
    got = {
        r["tile_id"]: (r["n_fps"], r["area_u_sum"])
        for r in Q.QUERIES["areal_weight_grid"](spark, SF_SMOKE).collect()
    }
    assert got == {t: tuple(v) for t, v in expect.items()}
    assert any(v[0] > 1 for v in expect.values())


def test_host_bfs_layers_matches_bruteforce(spark):
    import re
    from collections import deque

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_web import (
        BFS_MAX_D,
        CANON_HOST_RE,
    )
    from pdxbldgimport_spark.queries_web import _host_edges_df

    views(spark, SF_SMOKE)
    edges = {
        (r["src_host"], r["dst_host"])
        for r in _host_edges_df(spark).distinct().collect()
    }
    adj = defaultdict(set)
    hosts = set()
    for s, t in edges:
        adj[s].add(t)
        hosts.update((s, t))
    def _hostnum(h):
        m = re.search(r"[0-9]+", h)
        return int(m.group(0)) if m else 0

    seeds = {h for h in hosts if _hostnum(h) % 1000 == 3}
    depth = {h: 0 for h in seeds}
    q = deque(seeds)
    while q:
        h = q.popleft()
        if depth[h] >= BFS_MAX_D:
            continue
        for t in adj[h]:
            if t not in depth:
                depth[t] = depth[h] + 1
                q.append(t)
    got = {
        r["host"]: r["depth"]
        for r in Q.QUERIES["host_bfs_layers"](spark, SF_SMOKE).collect()
    }
    assert got == depth
    assert max(depth.values()) >= 2  # real multi-layer expansion exercised


def test_reservoir_sample_matches_bruteforce_and_weights_matter(spark):
    """Literal Python A-ES race over the real sf0.001 documents: per doc,
    min over its w replica hashes h60(md5('<id>:<r>')), smallest RS_K
    per lang. Also asserts all four weight buckets are live at this SF
    and that the weighting CHANGES the selection vs the unweighted
    (w=1) race — i.e. the operator is not a plain hash top-k."""
    import hashlib
    import math

    from pdxbldgimport_spark.queries import views
    from pdxbldgimport_spark.queries_text import RS_K, RS_WDIV, RS_WMAX

    views(spark, SF_SMOKE)
    rows = spark.sql("SELECT doc_id, lang, n_chars FROM documents").collect()

    def h60(s: str) -> int:
        hx = hashlib.md5(s.encode()).hexdigest()
        return sum(int(hx[n], 16) * 16 ** n for n in range(15))

    per = defaultdict(list)
    per_unw = defaultdict(list)
    weights = set()
    for r in rows:
        w = min(RS_WMAX, 1 + int(math.floor(r["n_chars"] / RS_WDIV)))
        weights.add(w)
        key = min(h60(f"{r['doc_id']}:{rep}") for rep in range(1, w + 1))
        per[r["lang"]].append((key, r["doc_id"], w))
        per_unw[r["lang"]].append((h60(f"{r['doc_id']}:1"), r["doc_id"]))
    expect = set()
    for lang, lst in per.items():
        lst.sort()
        for rn, (key, did, w) in enumerate(lst[:RS_K], 1):
            expect.add((lang, did, w, key, rn))
    got = {
        (r["lang"], r["doc_id"], r["w"], r["samp_key"], r["rn"])
        for r in Q.QUERIES["reservoir_sample"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert weights == set(range(1, RS_WMAX + 1))  # all buckets live
    # weighting must actually move the pick for at least one stratum
    moved = False
    for lang, lst in per_unw.items():
        lst.sort()
        unw_ids = {did for _, did in lst[:RS_K]}
        w_ids = {t[1] for t in expect if t[0] == lang}
        if unw_ids != w_ids:
            moved = True
    assert moved
