"""Aggregated query registry: importing this module loads every query
family into queries.QUERIES / queries.ORACLES."""

from . import queries
from . import queries_osm  # noqa: F401  (registers on import)
from . import queries_text  # noqa: F401
from . import queries_multimodal  # noqa: F401
from . import queries_events  # noqa: F401
from . import queries_web  # noqa: F401
from . import queries_crawl  # noqa: F401
from . import queries_spatial  # noqa: F401
from . import queries_relational  # noqa: F401

# The driver's correctness sweep runs queries in registry order and has
# a finite budget (the r4 record truncated at 50 of 63 entries, cutting
# exactly the tail). Never-driver-certified and newest queries therefore
# run FIRST; the long-certified core follows. Every name here must
# exist in QUERIES — guarded below so a rename can't silently demote a
# query to the truncatable tail.
# r6 rotation (VERDICT-r5 item #1): the driver CORRECTNESS record caps
# at ~50 names per round and the r1-r5 union covers only 100 of 246 —
# _FRONT is now exactly the 146 names that have NEVER appeared in any
# driver-produced CORRECTNESS_r*.json (derived by diffing the registry
# against the union of CORRECTNESS_r01-r05), in registry order, so the
# r6 record certifies the next 50 of them. The long-certified core
# follows. Pure ordering — no query or oracle changes.
_FRONT = [
    "discount_revenue",
    "important_parts",
    "dominant_suppliers",
    "events_autocorr_lag1",
    "supplier_cooccurrence",
    "host_modularity",
    "orders_cohort_value",
    "media_loudness_windows",
    "media_ahash",
    "events_seasonality",
    "events_burstiness",
    "returns_impact",
    "tile_pca_moments",
    "national_share",
    "events_simpson",
    "trimmed_mean_value",
    "priority_orders",
    "promo_share",
    "min_cost_supplier",
    "host_assortativity",
    "host_kcore",
    "events_interval_union",
    "idle_customers",
    "part_share_suppliers",
    "redirect_resolve",
    "host_neighbor_jaccard",
    "custdist",
    "wait_suppliers",
    "ip_lpm_route",
    "bot_users",
    "weighted_quantiles",
    "top_supplier",
    "host_sssp",
    "events_cusum",
    "cumulative_users",
    "small_order_revenue",
    "label_propagation",
    "parcel_scan_path",
    "events_twa",
    "events_mad_outliers",
    "snap_to_segment",
    "cdc_apply",
    "doc_chunk",
    "bigram_lm_score",
    "reservoir_sample",
    "host_bfs_layers",
    "areal_weight_grid",
    "sessions_concurrency",
    "events_gap_fill",
    "dedup_prefix_filter",
    "host_topk_pages",
    "agg_delta_merge",
    "idw_interpolate",
    "scd2_history",
    "lang_source_cube",
    "embedding_quantize",
    "manifest_prune",
    "hard_negative_mine",
    "encoding_quality",
    "fk_integrity",
    "revenue_rollup",
    "path_prefix_rollup",
    "host_typo_pairs",
    "orders_month_pivot",
    "media_dedup_exact",
    "corpus_drift",
    "table_profile",
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
    "events_anomaly",
    "geohash_encode",
    "events_transitions",
    "embedding_gram",
    "skyline_pareto",
    "zorder_layout",
    "score_normalize",
    "phrase_search",
    "events_funnel",
    "events_retention",
    "tile_rollup",
    "url_frontier",
    "dedup_containment",
    "local_supplier_volume",
    "brand_revenue",
    "pricing_summary",
    "shipping_priority",
    "tile_embedding_centroid",
    "zonal_stats",
    "tile_quota_sample",
    "fp_knn_graph",
    "tile_counts_streamed",
    "host_triangles",
    "heavy_hitters_cms",
    "host_tile_affinity",
    "dwithin_join",
    "tile_moran",
    "str_pack",
    "curriculum_order",
    "tile_focal_stats",
    "dsir_importance",
    "cell_compact",
    "domain_mix_report",
    "split_by_host",
    "lm_score_filter",
    "kmeans_fit",
    "bpe_merge_topk",
    "pack_sequences",
    "dedup_keep_best",
    "boilerplate_remove",
    "tile_pyramid",
    "paragraph_dedup",
    "robots_path_filter",
    "colloc_pmi_topk",
    "dup_cluster_stats",
    "link_degree_dist",
    "host_hits",
    "dedup_incremental",
    "lang_quota_sample",
    "outlink_extract",
    "anchor_text_agg",
    "crawl_snapshot_diff",
    "index_postings",
    "pii_scrub",
    "host_blocklist_filter",
    "url_latest_capture",
    "pipeline_funnel",
    "dedup_url_canonical",
    "bm25_topk",
    "host_pagerank",
    "cross_dup_spans",
    "doclen_quantiles",
    "url_dedup_streamed",
    "components_chain",
]


def _reorder() -> None:
    missing = [n for n in _FRONT if n not in queries.QUERIES]
    if missing:  # fail at import, not at the driver's sweep
        raise RuntimeError(f"registry _FRONT names not registered: {missing}")
    ordered = {n: queries.QUERIES[n] for n in _FRONT}
    ordered.update(
        {n: f for n, f in queries.QUERIES.items() if n not in ordered}
    )
    queries.QUERIES.clear()
    queries.QUERIES.update(ordered)


_reorder()

QUERIES = queries.QUERIES
ORACLES = queries.ORACLES
