"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: the shuffle/join/agg-heavy queries that dominate runtime and
# exercise every operator family end to end — INCLUDING the scale-riskiest
# plans (candidate-generation joins, the full pipeline DAG), so a regression
# in a scale-critical path shows up here, not only in PERF.md.
HEADLINE = [
    "flagship_harmonic_topk",
    "pricing_summary",
    "revenue_by_nation",
    "returnflag_pivot",
    "customer_order_left",
    "top_customers_per_nation",
    "symmetric_trade_edges",
    "adjacency_lut",
    "hourly_windows",
    "user_sessions",
    "text_stats",
    "segment_acctbal_zscore",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "dedup_ngram_jaccard",
    "clean_corpus_stats",
    "asof_latest_click",
    "errors_near_purchase",
    "knn_cosine_bruteforce",
    "knn_cosine_ivf",
    "embedding_near_dup",
    "streaming_hourly_windows",
    "multimodal_features",
    "drug_disease_pipeline",
    "tfidf_top_terms",
    "bm25_search",
    "doc_chunking",
    "pii_scrub_stats",
    "semantic_dedup_cells",
    "kmeans_cells",
    "boilerplate_span_stats",
    "quality_lm_score",
    "vocab_zipf_stats",
    "embedding_quantize_stats",
    "knn_pq_adc",
    "leakage_safe_split",
    "hybrid_rrf_search",
    "cdc_upsert_stats",
    "zorder_locality_stats",
    "reservoir_sample_stats",
    "substring_dedup_stats",
    "dq_audit",
    "bpe_merge_pair_stats",
    "scd2_history_stats",
    "training_shard_stats",
    "heavy_shingle_stats",
    "pmi_collocations",
    "trade_pagerank",
    "incremental_rollup_stats",
    "value_anomaly_stats",
    "join_skew_audit",
    "bpe_encode_stats",
    "corpus_epoch_stats",
    "streaming_value_anomaly",
    "embedding_drift_stats",
    "knn_eval_metrics",
    "funnel_conversion",
    "supplier_triangles",
    "price_quantity_regression",
    "source_overlap_jaccard",
    "lang_mix_divergence",
    "embedding_decontaminate",
    "order_cohort_retention",
    "weighted_sample_stats",
    "snapshot_diff_stats",
    "supplier_kcore",
    "streaming_funnel_conversion",
    "quality_winsor_stats",
    "event_transition_matrix",
    "time_weighted_value",
    "hll_user_rollup",
    "funnel_latency_stats",
    "value_drift_stats",
    "centroid_classifier_eval",
    "word_typo_pairs",
    "source_quota_allocation",
    "top_session_paths",
    "hourly_autocorr",
    "hourly_gap_audit",
    "orders_asof_dimension",
    "media_dedup_stats",
    "revenue_gini_per_nation",
    "sample_extrapolation_audit",
    "funnel_conversion_windowed",
    "source_coverage_greedy",
    "seasonal_hour_profile",
    "monthly_revenue_momentum",
    "cumulative_users_by_day",
    "ship_leadtime_histogram",
    "event_props_map_stats",
    "variant_props_stats",
    "sql_text_revenue",
    "quality_psi_stats",
    "dataset_fingerprints",
    "partition_change_plan",
    "value_moments_stats",
    "corpus_release_pipeline",
    "regional_revenue_share",
    "value_ks_by_type",
    "type_dow_chi2",
    "click_attribution_stats",
    "supplier_clustering",
    "part_skyline",
    "next_event_examples",
    "hard_negative_mining",
    "exact_auc_stats",
    "embedding_separability",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from platform_etl_drug_disease_spark.session import get_spark

    spark = get_spark(app_name="bench")
    catalog = entrymod.queries()
    names = [n for n in HEADLINE if n in catalog]

    # warm the JVM + file cache once with the cheapest query plan.
    catalog[names[0]](spark, sf_dir).count()

    # best-of-2 per query: single-shot timings on this box swing up to 10×
    # under VM CPU contention (measured: the same query 5.9 s vs 66 s across
    # runs with identical plans); the min of two executions reports engine
    # cost, not noisy-neighbor cost. Cache is cleared between runs, so both
    # executions are cold — this is not a warm-cache measurement.
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = catalog[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # full execution, no collect cost
            best = min(best, time.perf_counter() - t0)
            # queries are standalone: drop their persisted intermediates so
            # later timings aren't distorted by accumulated cache blocks +
            # GC pressure.
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
