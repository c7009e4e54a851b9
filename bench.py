"""Benchmark: spatial-join + tile-assignment docs/sec (BASELINE.json
metric) plus per-query wall times.

Runs the flagship pipeline — every geocoded page assigned to its
containing footprint (cell-bucketed PIP join) and its tile — over
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "spatial_join_tile_assign_docs_per_sec", "value": N,
     "unit": "docs/sec", "queries": {...}, "sf": ..., ...}

Scaling evidence (north_rule): run twice, e.g.::

    SPARK_GRAFT_CPUS=8  python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py

and compare ``value`` (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from pdxbldgimport_spark import registry as Q  # noqa: E402
from pdxbldgimport_spark import queries as base  # noqa: E402
from pdxbldgimport_spark.geo import cells as C  # noqa: E402
from pdxbldgimport_spark.operators.pip_join import pip_join, tile_expr  # noqa: E402
from pdxbldgimport_spark.session import get_spark  # noqa: E402
from pdxbldgimport_spark.shipping import ship  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Scaling-evidence knob: multiply pages-per-document for the HEADLINE
# pipeline only (per-query sweep still runs the standard tables). Used by
# the N-vs-4N runs recorded in BENCH/BASELINE.md; default 1 = driver mode.
REP_MULT = int(os.environ.get("SPARK_GRAFT_REP_MULT", "1"))
SKIP_SWEEP = os.environ.get("SPARK_GRAFT_SKIP_SWEEP", "") == "1"
# The sandbox VM has sporadic degraded phases (multi-second page-fault
# stalls — see BENCH/BASELINE.md caveats) that can inflate a single
# measurement 10-60×; each timing is the min of RUNS attempts.
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))

# Per-query bench set: the headline spatial family + the conflation chain
# + training-data ops. (multi_addrs exercises the full chain implicitly
# and is covered by the correctness gate; its many tiny stages measure
# scheduler overhead, not engine throughput, at these SFs.)
BENCH_QUERIES = [
    "pip_assign",
    "page_tile_counts",
    "fp_tile_counts",
    "knn_unassigned",
    "text_extract",
    "pdx_addrs",
    "pdx_bldgs",
    "metro_bldgs",
    "tile_export",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "rel_ring_stats",
    "clark_one_addr_bldgs",
    "tile_artifacts",
    "rel_artifacts",
    "lang_ngram_id",
    "media_bmp_decode",
    "media_wav_decode",
]


def _run(df) -> None:
    # noop sink: full computation of every column, nothing collected.
    df.write.format("noop").mode("overwrite").save()


def _bench_streaming(spark) -> dict:
    """§2.9 perf evidence: drain the events table through the stateful
    sessionization stream (availableNow, 4 time-ordered dumps) and
    report wall time, events/sec, state-store rows, and the batch twin's
    wall time on the same input."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F2

    from pdxbldgimport_spark.queries_events import q_events_sessions
    from pdxbldgimport_spark.streaming import sessions as SS

    ev = spark.table("events").select(
        "event_id", F2.col("ts").cast("timestamp_ntz").alias("ts"), "user_id"
    )
    n_events = ev.count()
    root = tempfile.mkdtemp(prefix="bench_sessions_")
    try:
        src, ckpt, out = f"{root}/src", f"{root}/ckpt", f"{root}/out"
        us = F2.unix_micros(F2.col("ts").cast("timestamp"))
        bounds = [
            int(q)
            for q in ev.agg(
                F2.expr(
                    "percentile(unix_micros(cast(ts as timestamp)),"
                    " array(0.25e0, 0.5e0, 0.75e0))"
                )
            ).collect()[0][0]
        ]
        lo = [None, *bounds]
        hi = [*bounds, None]
        for i, (a, b) in enumerate(zip(lo, hi)):
            part = ev
            if a is not None:
                part = part.where(us > a)
            if b is not None:
                part = part.where(us <= b)
            part.coalesce(1).write.parquet(f"{src}/d{i}")
        t0 = time.time()
        prog = SS.stream_sessions(spark, f"{src}/*", ev.schema, ckpt, out)
        stream_s = time.time() - t0
        state_rows = None
        if prog and prog.get("stateOperators"):
            state_rows = prog["stateOperators"][0].get("numRowsTotal")
        t0 = time.time()
        _run(q_events_sessions(spark, SF_DIR))
        batch_s = time.time() - t0
        return {
            "events": n_events,
            "stream_sec": round(stream_s, 3),
            "stream_events_per_sec": round(n_events / stream_s, 1),
            "state_rows": state_rows,
            "batch_twin_sec": round(batch_s, 3),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="bench", cores=CPUS)
    ship(spark)
    base.views(spark, SF_DIR)

    # Warm up JVM/codegen paths outside the timed region.
    _run(spark.table("pages").select("page_id").limit(1000))

    pages = spark.table("pages")
    if REP_MULT > 1:
        # Re-render the pages generator with REP×MULT pages per document
        # (same distribution, larger volume — the "same input" for the
        # two-parallelism scaling evidence is the multiplied table).
        from pdxbldgimport_spark import synth

        params = dict(synth._CONST)
        params.update(synth._DIALECT["spark"])
        big_rep = int(params["REP"]) * REP_MULT
        params["REP"] = str(big_rep)
        # range() emits rows without materializing the sequence: at this
        # REP an explode(sequence(...)) allocates a multi-MB array per
        # doc (G1 humongous allocations — measured as allocation-stall
        # collapse in degraded host phases)
        params["CROSS_REP"] = f"CROSS JOIN (SELECT id AS r FROM range({big_rep})) r"
        pages = spark.sql(synth._force_double(synth._PAGES.format(**params)))

    n_pages = pages.count()

    # Headline: one job assigning every page to (footprint, tile).
    # Ingest prep (footprint enrichment + the broadcast spatial index) is
    # untimed — the reference likewise builds its GiST indexes at
    # table-build time, not per query.
    base.prepared_fp_cover(spark, SF_DIR)  # build the index untimed
    from pyspark.sql import types as T

    pts = pages.select(
        "page_id", "lon", "lat",
        tile_expr(F.col("lon"), F.col("lat"), C.RES_TILE).alias("tile_id"),
    )
    headline_s = float("inf")
    for _ in range(max(RUNS, 1)):
        t0 = time.time()
        out = base.pip_fp_join(
            spark, SF_DIR, pts, "page_id", carry=[("tile_id", T.LongType())],
        )
        _run(out)
        headline_s = min(headline_s, time.time() - t0)
    docs_per_sec = n_pages / headline_s

    timings: dict[str, float] = {}
    for name in [] if SKIP_SWEEP else BENCH_QUERIES:
        fn = Q.QUERIES[name]
        best = float("inf")
        for _ in range(max(RUNS, 1)):
            t0 = time.time()
            _run(fn(spark, SF_DIR))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    streaming = None if SKIP_SWEEP else _bench_streaming(spark)

    print(
        json.dumps(
            {
                "metric": "spatial_join_tile_assign_docs_per_sec",
                "value": round(docs_per_sec, 1),
                "unit": "docs/sec",
                "headline_sec": round(headline_s, 3),
                "n_docs": n_pages,
                "queries": timings,
                "streaming_sessions": streaming,
                "sf": SF_DIR,
                "cpus": CPUS,
                "runs_per_timing": max(RUNS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
