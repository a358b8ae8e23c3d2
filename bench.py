"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"sf": ..., "n_queries": N, "slowest": {top-8 map}, "detail": path}.

The full per-query timing map goes to BENCH_DETAIL.json next to this
script, NOT the stdout line: at 160+ queries the inline map overflowed
the driver's tail-capture window and round 6's headline number was
recorded as "parsed": null. The stdout line is bounded (~500 bytes)
regardless of how many queries the registry grows to.

Timing = full query execution to a driver-side collect (results are
small aggregates / bounded row sets). Session build time excluded; one
warm-up action runs first so JVM/codegen startup isn't billed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_pricing_summary",
    "q_shipping_priority",
    "q_local_supplier_volume",
    "q_join_broadcast_part",
    "q_join_range_bands",
    "q_order_distribution",
    "q_large_orders",
    "q_supplier_part_counts",
    "q_agg_stats",
    "q_agg_rollup",
    "q_window_topk_per_customer",
    "q_window_running_total",
    "q_set_union",
    "q_clean_dedup_rows",
    "q_clean_numeric_cast",
    "q_map_values_broadcast",
    "q_dedup_minhash_lsh",
    "q_dedup_clusters",
    "q_dedup_embedding_cosine",
    "q_knn_bruteforce",
    "q_knn_ivf",
    "q_text_quality",
    "q_text_gopher",
    "q_text_entropy",
    "q_text_fingerprint",
    "q_text_tfidf",
    "q_text_ngram_repetition",
    "q_decontaminate",
    "q_corpus_profile",
    "q_sample_stratified",
    "q_sample_mixture",
    "q_dedup_passages",
    "q_dedup_incremental",
    "q_text_normalize",
    "q_embed_kmeans",
    "q_semantic_dedup",
    "q_pipeline_training_prep",
    "q_funnel_conversion",
    "q_retention_cohorts",
    "q_corpus_shuffle",
    "q_pack_chunks",
    "q_pack_sequences",
    "q_quality_quantile",
    "q_merge_upsert",
    "q_scd2_customer_orders",
    "q_part_revenue_share",
    "q_promo_revenue_share",
    "q_top_supplier_revenue",
    "q_bulk_part_suppliers",
    "q_last_shipper",
    "q_window_frames",
    "q_pipeline_curation",
    "q_pipeline_curation_v2",
    "q_events_tumbling",
    "q_events_sessionize",
    "q_events_asof_join",
    # round-5 additions
    "q_merge_upsert_deletes",
    "q_scd2_deletes",
    "q_agg_incremental",
    "q_media_wav_decode",
    "q_media_bmp_decode",
    "q_domain_blocklist",
    "q_sample_topk_stratum",
    "q_pack_overlap_chunks",
    "q_validate_orders",
    # round-6 additions
    "q_knn_pq",
    "q_media_png_decode",
    "q_join_bloom_pruned",
    "q_sample_weighted",
    "q_split_group_holdout",
    "q_sample_token_budget",
    "q_entity_resolution",
    "q_dedup_containment",
    "q_text_boilerplate",
    "q_shard_manifest",
    "q_skew_report",
    # round-6 wave-4 additions
    "q_text_bm25_topk",
    "q_hybrid_rrf",
    "q_dedup_substring_spans",
    "q_dedup_substring_stats",
    "q_text_lm_ppl",
    "q_source_jsonl",
    "q_layout_zone_map",
    "q_agg_sketch_rollup",
    "q_text_quality_classifier",
    "q_clean_winsorize",
    "q_events_anomaly",
    "q_embed_feature_hash",
    "q_product_profit",
    "q_returned_items",
    "q_corr_matrix",
    "q_source_schema_evolution",
    # round-6 wave-6 additions
    "q_source_quality_gate",
    "q_text_oov_rate",
    "q_knn_pq_rerank",
    # round-7 additions
    "q_clean_winsorize_approx",
    "q_quality_quantile_approx",
    "q_forecast_revenue",
    "q_volume_shipping",
    "q_market_share",
    "q_small_qty_revenue",
    "q_disjunctive_revenue",
    "q_media_gif_decode",
    "q_source_orc",
    "q_dedup_keep_best",
    "q_sample_kfold",
    "q_sample_interleave",
    "q_clean_quantile_bins",
    "q_graph_pagerank",
    "q_text_langid_margin",
    "q_clean_mad_outliers",
    "q_dedup_cross_source",
    "q_embed_truncate",
    "q_sample_negatives",
    "q_pipeline_quality_mix",
    "q_events_resample_locf",
    "q_agg_histogram",
    "q_cdc_table_diff",
    "q_dedup_templates",
    "q_url_canonicalize",
    "q_events_transitions",
    "q_graph_triangles",
    "q_join_strategy_report",
    # round-8 additions
    "q_graph_pagerank_directed",
    "q_join_auto",
    "q_pipeline_curation_scale",
    "q_media_jpeg_decode",
    "q_graph_kcore",
    "q_agg_heavy_hitters",
    "q_validate_psi",
    "q_join_size_estimate",
    "q_graph_copurchase",
    "q_sample_bootstrap",
    # round-9 additions
    "q_graph_pagerank_directed_personalized",
    "q_knn_recall_report",
    "q_text_bpe_merges",
    "q_text_bpe_tokenize",
    "q_media_jpeg_decode_subsampled",
    "q_media_jpeg_decode_progressive",
    "q_graph_pagerank_receipt",
    "q_agg_hll_overlap",
    "q_media_jpeg_decode_progressive_420",
    "q_pipeline_pretrain",
    "q_graph_pagerank_weighted",
    "q_sample_temperature",
    "q_graph_components",
    "q_graph_communities",
    "q_embed_random_projection",
    "q_graph_hits",
    "q_graph_khop",
    "q_events_funnel",
    "q_events_retention",
    "q_layout_zorder",
    "q_validate_kanonymity",
    "q_decontaminate_semantic",
    "q_enrich_target_encode",
    "q_knn_lsh_multiprobe",
    "q_embed_mean_pool",
    "q_basket_rules",
    "q_graph_pagerank_incremental",
    "q_validate_auc",
    # round 10
    "q_graph_link_prediction",
    "q_events_sequences",
    "q_events_twap",
    "q_ml_linreg",
    "q_validate_benford",
    "q_text_pmi",
    "q_text_chi2",
    "q_dedup_prefix_filter",
    "q_media_audio_frames",
    "q_min_cost_supplier",
    "q_events_ewma",
    "q_behavior_rfm",
    "q_validate_concentration",
    "q_embed_centroid_drift",
    "q_source_partitioned",
    "q_agg_mode",
    "q_events_adoption",
    "q_agg_weighted_median",
    "q_graph_degree_dist",
    "q_source_csv_roundtrip",
    "q_dedup_lsh_recall",
    "q_text_zipf",
    "q_events_asof_forward",
    "q_clean_impute",
    "q_agg_bitwise",
    "q_events_stream_ewma",
    "q_agg_moments",
    "q_window_cume_dist",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ai_etl_pipeline_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: touch the biggest table so startup cost is off the clock
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        # best of 2: the first run pays codegen compile and is exposed to
        # shared-host load spikes; min() measures the engine, not the host
        best, n = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = len(df.collect())
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    total = round(sum(timings.values()), 3)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:8]
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "slowest": slowest,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
