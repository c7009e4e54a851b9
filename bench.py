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
    "tile_pyramid",
    "fp_tile_counts",
    "knn_unassigned",
    "text_extract",
    "pdx_addrs",
    "pdx_bldgs",
    "metro_bldgs",
    "tile_export",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_components",
    "components_chain",
    "host_stats",
    "dedup_url_canonical",
    "outlink_extract",
    "anchor_text_agg",
    "link_degree_dist",
    "host_hits",
    "dedup_incremental",
    "crawl_snapshot_diff",
    "index_postings",
    "pii_scrub",
    "host_blocklist_filter",
    "robots_path_filter",
    "url_latest_capture",
    "pipeline_funnel",
    "bm25_topk",
    "host_pagerank",
    "cross_dup_spans",
    "doclen_quantiles",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "decontam_ngram",
    "vocab_topk",
    "events_asof_join",
    "events_range_join",
    "events_funnel",
    "events_retention",
    "events_transitions",
    "events_anomaly",
    "geohash_encode",
    "tile_rollup",
    "url_frontier",
    "score_normalize",
    "phrase_search",
    "embedding_gram",
    "skyline_pareto",
    "zorder_layout",
    "corpus_drift",
    "table_profile",
    "host_typo_pairs",
    "orders_month_pivot",
    "media_dedup_exact",
    "manifest_prune",
    "hard_negative_mine",
    "idw_interpolate",
    "scd2_history",
    "lang_source_cube",
    "embedding_quantize",
    "dedup_prefix_filter",
    "host_topk_pages",
    "agg_delta_merge",
    "events_gap_fill",
    "sessions_concurrency",
    "areal_weight_grid",
    "host_bfs_layers",
    "encoding_quality",
    "fk_integrity",
    "revenue_rollup",
    "path_prefix_rollup",
    "tile_rate_smoothed",
    "crawl_budget_apportion",
    "host_components",
    "events_dau_wau",
    "events_rate_flags",
    "token_diversity",
    "events_value_quantiles",
    "type_cooccurrence",
    "host_gini",
    "link_reciprocity",
    "events_downsample",
    "session_path_topk",
    "host_reach2",
    "tfidf_topk",
    "bloom_dedup_probe",
    "text_repetition",
    "corpus_sample",
    "reservoir_sample",
    "lang_quota_sample",
    "colloc_pmi_topk",
    "bpe_merge_topk",
    "kmeans_fit",
    "lm_score_filter",
    "split_by_host",
    "cell_compact",
    "domain_mix_report",
    "dsir_importance",
    "tile_focal_stats",
    "dwithin_join",
    "tile_moran",
    "host_triangles",
    "heavy_hitters_cms",
    "host_tile_affinity",
    "fp_knn_graph",
    "zonal_stats",
    "tile_quota_sample",
    "tile_embedding_centroid",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "brand_revenue",
    "str_pack",
    "curriculum_order",
    "dup_cluster_stats",
    "dedup_keep_best",
    "paragraph_dedup",
    "boilerplate_remove",
    "pack_sequences",
    "distinct_sketch_fm",
    "dedup_simhash",
    "text_stats",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "rel_ring_stats",
    "rel_ring_assembly",
    "clark_one_addr_bldgs",
    "tile_artifacts",
    "rel_artifacts",
    "lang_ngram_id",
    "media_bmp_decode",
    "media_wav_decode",
    "snap_to_segment",
    "segment_crossings",
    "tile_hillshade",
    "hexbin_counts",
    "hex_smooth",
    "cdc_apply",
    "doc_chunk",
    "bigram_lm_score",
    "label_propagation",
    "parcel_scan_path",
    "events_twa",
    "events_mad_outliers",
    "host_sssp",
    "events_cusum",
    "cumulative_users",
    "small_order_revenue",
    "ip_lpm_route",
    "bot_users",
    "weighted_quantiles",
    "top_supplier",
    "redirect_resolve",
    "host_neighbor_jaccard",
    "custdist",
    "wait_suppliers",
    "host_kcore",
    "events_interval_union",
    "idle_customers",
    "part_share_suppliers",
    "priority_orders",
    "promo_share",
    "min_cost_supplier",
    "host_assortativity",
    "tile_pca_moments",
    "national_share",
    "events_simpson",
    "trimmed_mean_value",
    "media_ahash",
    "events_seasonality",
    "events_burstiness",
    "returns_impact",
    "host_modularity",
    "orders_cohort_value",
    "media_loudness_windows",
    "events_autocorr_lag1",
    "supplier_cooccurrence",
    "forecast_revenue",
    "nation_volume",
    "late_shipments",
    "large_orders",
    "discount_revenue",
    "important_parts",
    "dominant_suppliers",
    "hilbert_layout",
    "host_clustering_coef",
    "events_histogram",
    "events_type_correlation",
    "quadkey_encode",
    "zrange_bbox_count",
    "host_ppr",
    "events_ewma",
    "orders_rfm",
    "part_margin",
    "mktsegment_revenue",
    "supplier_balance_tiers",
    "tile_dbscan",
    "tile_contour_cases",
    "crawl_schedule",
    "host_mirror_detect",
    "customer_order_gaps",
    "nation_supplier_hhi",
    "events_activity_runs",
    "url_param_stats",
    "html_tag_stats",
    "events_peaks",
    "tile_flow_dir",
    "events_markov_pi",
    "lang_tile_mix",
    "tile_upsample2x",
    "tile_majority_lang",
    "events_user_overlap",
    "orders_price_audit",
]


def _run(df) -> None:
    # noop sink: full computation of every column, nothing collected.
    df.write.format("noop").mode("overwrite").save()


# --- self-certifying timings (r3 verdict #1) -------------------------
# The host has multi-hour degraded phases that can inflate a recorded
# timing 2-10× on unchanged code. Defense recorded IN the JSON: any
# query whose min-of-RUNS exceeds RETIME_FACTOR× its previous round's
# recorded value is re-timed after the sweep, each retime annotated
# with an interleaved pure-JVM probe reading (no Python, no Arrow, no
# engine code — it bounds what ANY Spark job can do in that window).
RETIME_FACTOR = 1.5
# Absolute floor: any first reading above this is re-timed even when
# the recorded history is itself noisy (most queries cost well under
# this healthy; observed: media_bmp_decode recorded 13-23 s across
# rounds in degraded windows vs 0.8-1.7 s re-measured — a noisy prev
# inflates the relative threshold and lets the next noisy reading pass).
ABS_RETIME_SEC = 4.0
# Per-entry overrides for the few entries whose HEALTHY cost exceeds
# the global floor — without these the retime fires on every sweep and
# the annotation stops signaling anything (it must mean "suspicious",
# not "always"): components_chain is ~5-6 real contraction rounds
# (6.9-11.3 s healthy, probes green); the streaming drain key (used by
# _bench_streaming) is 8-15 s healthy for the single-batch drain.
ABS_RETIME_OVERRIDES = {
    "components_chain": 16.0,
    "__streaming_drain__": 25.0,
    # ~4.1 s healthy (probes green): the cost is fixed stage-count
    # overhead of the prefix-filter chain (rank, prefix window,
    # candidate join, refine), not data volume — profiled at 260k
    # dsh rows with staged subtrees; sits exactly on the global floor.
    "dedup_prefix_filter": 8.0,
}


def _abs_floor(name: str) -> float:
    return ABS_RETIME_OVERRIDES.get(name, ABS_RETIME_SEC)
PROBE_ROWS_PER_CPU = 250_000_000  # ≈2 s healthy at local[32]


def _probe(spark) -> float:
    """Pure-JVM control probe: range → sum(id%7 + id%13). Rows scale
    with CPUS so the healthy reading is ~2 s at any width."""
    t0 = time.time()
    spark.range(0, PROBE_ROWS_PER_CPU * CPUS, 1, CPUS).selectExpr(
        "sum(id % 7 + id % 13) as s"
    ).collect()
    return round(time.time() - t0, 3)


def _prev_round() -> dict:
    """Per-query best-known timings across ALL driver-recorded
    BENCH_r*.json rounds (the signals of record). Min-across-rounds is
    the regression baseline: a single noisy round must not inflate the
    threshold and let the next round's noise pass unflagged (observed:
    r3 recorded media_bmp_decode at 13.3 s in a degraded window; vs
    that alone, a 22.6 s reading sits under 2× yet is 30× the healthy
    0.76 s). Only rounds recorded at THIS run's config (cpus / sf /
    rep_mult — rounds before r5 didn't record rep_mult; they all ran at
    1) are comparable: a past round at a different scale would make the
    baseline meaningless and every comparison spurious."""
    import glob

    paths = sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json")))
    best: dict[str, float] = {}
    used: list[str] = []
    headline = None
    stream_sec = None
    for path in paths:
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, ValueError):
            continue
        if (
            parsed.get("cpus") != CPUS
            or parsed.get("sf") != SF_DIR
            or parsed.get("rep_mult", 1) != REP_MULT
        ):
            continue
        used.append(os.path.basename(path))
        for k, v in (parsed.get("queries") or {}).items():
            if isinstance(v, (int, float)):
                best[k] = min(best.get(k, float("inf")), v)
        h = parsed.get("headline_sec")
        if isinstance(h, (int, float)):
            headline = min(headline, h) if headline else h
        s = (parsed.get("streaming_sessions") or {}).get("stream_sec")
        if isinstance(s, (int, float)):
            stream_sec = min(stream_sec, s) if stream_sec else s
    if not best:
        return {}
    return {
        "file": f"min over {len(used)} config-matched rounds "
                f"({', '.join(used)})",
        "queries": best,
        "headline_sec": headline,
        "stream_sec": stream_sec,
    }


def _bench_streaming(spark, prev: dict) -> dict:
    """§2.9 perf evidence: drain the events table through the stateful
    sessionization stream (availableNow over the shared partitioned
    dump — one data batch + the watermark-flush batch, the same drain
    the `events_sessions_streamed` gate runs) and report wall time,
    events/sec, state-store rows, and the batch twin's wall time on the
    same input. The drain is inside the retime+probe policy: a reading
    over RETIME_FACTOR× the best recorded round (or the absolute floor)
    is re-drained from a fresh checkpoint with a pure-JVM probe
    annotation, exactly like the per-query sweep."""
    import shutil
    import tempfile

    from pyspark.sql import types as T2

    from pdxbldgimport_spark.queries_events import _events_dump, q_events_sessions
    from pdxbldgimport_spark.streaming import sessions as SS

    n_events = spark.table("events").count()
    src = _events_dump(spark, SF_DIR)
    schema = T2.StructType(
        [
            T2.StructField("event_id", T2.LongType()),
            T2.StructField("ts", T2.TimestampNTZType()),
            T2.StructField("user_id", T2.LongType()),
        ]
    )

    def drain() -> tuple[float, int | None]:
        root = tempfile.mkdtemp(prefix="bench_sessions_")
        try:
            t0 = time.time()
            prog = SS.stream_sessions(
                spark, src, schema, f"{root}/ckpt", f"{root}/out",
                max_files_per_trigger=None,
            )
            dt = time.time() - t0
            rows = None
            if prog and prog.get("stateOperators"):
                rows = prog["stateOperators"][0].get("numRowsTotal")
            return dt, rows
        finally:
            shutil.rmtree(root, ignore_errors=True)

    stream_s, state_rows = drain()
    retime = None
    p = prev.get("stream_sec")
    if (p and stream_s > RETIME_FACTOR * p) or stream_s > _abs_floor(
        "__streaming_drain__"
    ):
        probe_s = _probe(spark)
        again, rows2 = drain()
        retime = {
            "prev": p,
            "first": round(stream_s, 3),
            "retimed": round(again, 3),
            "probe_sec": probe_s,
        }
        if again < stream_s:
            stream_s, state_rows = again, rows2
    t0 = time.time()
    _run(q_events_sessions(spark, SF_DIR))
    batch_s = time.time() - t0
    out = {
        "events": n_events,
        "stream_sec": round(stream_s, 3),
        "stream_events_per_sec": round(n_events / stream_s, 1),
        "state_rows": state_rows,
        "batch_twin_sec": round(batch_s, 3),
    }
    if retime:
        out["retime"] = retime
    return out


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
    def time_headline() -> float:
        best = float("inf")
        for _ in range(max(RUNS, 1)):
            t0 = time.time()
            out = base.pip_fp_join(
                spark, SF_DIR, pts, "page_id",
                carry=[("tile_id", T.LongType())],
            )
            _run(out)
            best = min(best, time.time() - t0)
        return best

    headline_s = time_headline()

    def time_query(name: str) -> float:
        fn = Q.QUERIES[name]
        best = float("inf")
        for _ in range(max(RUNS, 1)):
            t0 = time.time()
            _run(fn(spark, SF_DIR))
            best = min(best, time.time() - t0)
        return round(best, 3)

    timings: dict[str, float] = {}
    for name in [] if SKIP_SWEEP else BENCH_QUERIES:
        timings[name] = time_query(name)

    # Self-certification pass: re-time >RETIME_FACTOR× regressions vs
    # the previous recorded round, annotating each with a probe reading
    # taken immediately before the retime. A recovered retime replaces
    # the noisy first reading; a still-slow retime with a slow probe is
    # host-attributed in-record; still-slow with a HEALTHY probe is a
    # real regression and stands.
    retimes: dict[str, dict] = {}
    prev = {} if SKIP_SWEEP else _prev_round()
    for name, first in list(timings.items()):
        p = (prev.get("queries") or {}).get(name)
        if (p and first > RETIME_FACTOR * p) or first > _abs_floor(name):
            probe_s = _probe(spark)
            again = time_query(name)
            retimes[name] = {
                "prev": p,
                "first": first,
                "retimed": again,
                "probe_sec": probe_s,
            }
            timings[name] = min(first, again)

    # The headline is THE metric of record (BASELINE.json) — it gets a
    # stricter defense than the per-query tail: ALWAYS one post-sweep
    # retime with a probe annotation, not just past a regression trigger
    # (r4 lesson: a 1.47× drift slid under the 1.5× trigger and the one
    # number a reader quotes first carried no probe). Skipped only for
    # scaling-pair legs (REP_MULT>1), which are probe-bracketed by
    # tools/scaling_pair.py itself.
    if REP_MULT == 1:
        ph = prev.get("headline_sec") if prev else None
        probe_s = _probe(spark)
        again = time_headline()
        retimes["__headline__"] = {
            "prev": ph,
            "first": round(headline_s, 3),
            "retimed": round(again, 3),
            "probe_sec": probe_s,
            "policy": "always-retime (headline of record)",
        }
        headline_s = min(headline_s, again)
    docs_per_sec = n_pages / headline_s

    streaming = None if SKIP_SWEEP else _bench_streaming(spark, prev)

    print(
        json.dumps(
            {
                "metric": "spatial_join_tile_assign_docs_per_sec",
                "value": round(docs_per_sec, 1),
                "unit": "docs/sec",
                "headline_sec": round(headline_s, 3),
                "n_docs": n_pages,
                "queries": timings,
                "retimes": retimes,
                "retime_policy": {
                    "factor": RETIME_FACTOR,
                    "abs_floor_sec": ABS_RETIME_SEC,
                    "abs_floor_overrides": ABS_RETIME_OVERRIDES,
                    "vs": prev.get("file") if prev else None,
                    "probe": "range->sum(id%7+id%13), "
                             f"{PROBE_ROWS_PER_CPU}*cpus rows, ~2s healthy",
                },
                "streaming_sessions": streaming,
                "sf": SF_DIR,
                "cpus": CPUS,
                "rep_mult": REP_MULT,
                "runs_per_timing": max(RUNS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
