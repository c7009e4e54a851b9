"""Interleaved N↔4N scaling-pair legs with pure-JVM probe annotations
(north_rule evidence; BENCH/BASELINE.md methodology).

One leg per invocation (the sandbox runner caps command wall time), each
appending one JSON line to the log so a pair is assembled from
back-to-back invocations:

    python tools/scaling_pair.py probe 8      # pure-JVM compute control, local[8]
    python tools/scaling_pair.py probe 32
    python tools/scaling_pair.py bwprobe 8    # memory-bandwidth control
    python tools/scaling_pair.py bwprobe 32
    python tools/scaling_pair.py bench 8      # headline PIP at REP_MULT
    python tools/scaling_pair.py bench 32
    ...

Probe = range -> sum(id%7 + id%13), rows scaled per-cpu (~2 s healthy at
any width): no Python, no Arrow, no engine code — it reads the HOST's
current width-dependent compute health in the same window as the engine
legs, so a recorded pair self-certifies whether a sub-0.8 ratio is
host-side. Bench legs run bench.py (SKIP_SWEEP, RUNS=1) in a fresh
process so each width gets its own JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.environ.get("PAIR_LOG", os.path.join(REPO, "BENCH", "pairs_r5.jsonl"))
REP_MULT = os.environ.get("PAIR_REP_MULT", "16384")  # 320k * 16384 = 5.24B pages
PROBE_ROWS_PER_CPU = 250_000_000


def log_line(rec: dict) -> None:
    rec["t_wall"] = round(time.time(), 1)
    # optional provenance tag (e.g. "cluster" when a leg runs under
    # spark-submit on a local-cluster master via tools/cluster_pair.py)
    if os.environ.get("PAIR_TAG"):
        rec["tag"] = os.environ["PAIR_TAG"]
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def probe(cpus: int) -> None:
    sys.path.insert(0, REPO)
    from pdxbldgimport_spark.session import get_spark

    spark = get_spark(app_name="pair_probe", cores=cpus)
    rows = PROBE_ROWS_PER_CPU * cpus
    # one warm pass (codegen compile), then the timed reading
    spark.range(0, rows // 8, 1, cpus).selectExpr("sum(id % 7 + id % 13)").collect()
    t0 = time.time()
    spark.range(0, rows, 1, cpus).selectExpr("sum(id % 7 + id % 13)").collect()
    dt = round(time.time() - t0, 3)
    log_line({"kind": "probe", "cpus": cpus, "rows": rows, "sec": dt,
              "rows_per_cpu_sec": round(rows / dt / cpus / 1e6, 1)})


def bwprobe(cpus: int) -> None:
    """Memory-BANDWIDTH-bound control (md5 materialization + hash agg):
    the pure range->sum probe reads only registers, so a host whose
    hypervisor-shared memory bandwidth degrades shows HEALTHY compute
    probes while 32-wide engine legs (which stream gigabytes) crater.
    This leg closes that attribution gap: compare rows_per_cpu_sec at 8
    vs 32 in the same window — a 32/8 per-cpu ratio well under ~0.85
    marks the window bandwidth-degraded (host-side), independent of any
    engine code."""
    sys.path.insert(0, REPO)
    from pdxbldgimport_spark.session import get_spark

    spark = get_spark(app_name=f"pair_bwprobe{cpus}", cores=cpus)
    rows = 40_000_000 * cpus
    df = spark.range(rows).selectExpr("md5(cast(id as string)) h")
    q = lambda: df.selectExpr("substr(h, 1, 4) k").groupBy("k").count().count()
    q()  # warm (codegen compile + JIT)
    t0 = time.time()
    q()
    dt = round(time.time() - t0, 3)
    log_line({"kind": "bwprobe", "cpus": cpus, "rows": rows, "sec": dt,
              "rows_per_cpu_sec": round(rows / dt / cpus / 1e6, 2)})


def bench(cpus: int) -> None:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_REP_MULT=REP_MULT,
        SPARK_GRAFT_SKIP_SWEEP="1",
        SPARK_GRAFT_RUNS=os.environ.get("PAIR_RUNS", "1"),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(
            f"bench.py leg failed (rc={out.returncode}); stderr above"
        )
    d = None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            cand = json.loads(line)
        except ValueError:
            continue
        # only the bench record counts — a stray trailing 'null' / bare
        # scalar line must not end the scan (or crash the indexing below)
        if isinstance(cand, dict) and "n_docs" in cand:
            d = cand
            break
    if d is None:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit("bench.py emitted no JSON record; stderr above")
    log_line({"kind": "bench", "cpus": cpus, "rep_mult": int(REP_MULT),
              "n_docs": d["n_docs"], "headline_sec": d["headline_sec"],
              "docs_per_sec": d["value"]})




def shuffle(cpus: int) -> None:
    """SHUFFLE-heavy scaling leg — the complement of the map-heavy
    headline legs: a full-width exchange (groupBy on the ~unique page
    url) at REP-multiplied volume, so the measured quantity is hash
    partitioning + spill + merge throughput rather than codegen scan
    throughput. Guards the evidence against the critique that the
    engine only demonstrates embarrassingly-parallel scaling. Volume
    knob PAIR_SHUFFLE_REP (default 1024 → ~327M pages ≈ 16 GB
    exchanged at sf0.1)."""
    sys.path.insert(0, REPO)
    from pdxbldgimport_spark import queries as base
    from pdxbldgimport_spark import synth
    from pdxbldgimport_spark.session import get_spark
    from pdxbldgimport_spark.shipping import ship

    rep_mult = int(os.environ.get("PAIR_SHUFFLE_REP", "1024"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"pair_shuffle{cpus}", cores=cpus)
    ship(spark)
    base.views(spark, sf_dir)
    params = dict(synth._CONST)
    params.update(synth._DIALECT["spark"])
    big_rep = int(params["REP"]) * rep_mult
    params["REP"] = str(big_rep)
    params["CROSS_REP"] = (
        f"CROSS JOIN (SELECT id AS r FROM range({big_rep})) r"
    )
    pages = spark.sql(synth._force_double(synth._PAGES.format(**params)))
    urls = pages.selectExpr("url")
    urls.limit(1000).groupBy("url").count().count()  # warm codegen
    t0 = time.time()
    n_groups = urls.groupBy("url").count().count()
    dt = round(time.time() - t0, 3)
    log_line({"kind": "shuffle", "cpus": cpus, "rep_mult": rep_mult,
              "n_groups": n_groups, "sec": dt,
              "groups_per_sec": round(n_groups / dt, 1)})


if __name__ == "__main__":
    kind, cpus = sys.argv[1], int(sys.argv[2])
    {"probe": probe, "bwprobe": bwprobe, "bench": bench, "shuffle": shuffle}[kind](cpus)
