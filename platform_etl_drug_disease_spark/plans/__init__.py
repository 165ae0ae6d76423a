"""Query catalog + reference-parity pipeline plans.

Each catalog module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same parquet
tables). ``__spark_entry__.py`` merges them for the driver's correctness gate.

Ordering matters: the driver records CORRECTNESS rows for the FIRST 50
``queries()`` entries only. ``_DRIVER_WINDOW`` pins those 50 explicitly.

Rotation policy (round 3+, per VERDICT r2 item 2): the window is 50/round;
each round keeps 5 pinned gates (the reference-parity pipeline, its
whitelist variant, the flagship, the LLM-side flagship DAG, and the sink
round-trip) and fills the remaining 45 slots with queries that have NEVER
had a driver CORRECTNESS row — pushing the ever-driver-proven union toward
full catalog coverage (r1∪r2 = 76, ∪r3 = 114 by the strict rows+schema+hash
criterion). SURVEY §2 operator ids exercised only by previously-rotated-out
queries stay driver-proven via their green rows in the committed
CORRECTNESS_r0N.json artifacts; tests/test_catalog_contract.py asserts
every §2 id has an exercising query in (window ∪ ever-driver-proven).
Every in-window entry carries a full value-hash oracle; the rows-only-by-
design variants (HLL estimate values, BPE greedy encode, t-digest
quantiles) keep their accuracy pytests and rotate in at round 5 under an
explicit rows-only allowlist. The whole catalog — window and tail — is
verified every round by ``tools/oracle_check.py`` (195/195 at r3).

Round-5 window plan (pre-staged per VERDICT r3 item 3, so full-catalog
driver coverage lands deterministically by r5): the 5 pinned gates, the
remaining never-proven oracled queries after round 4 — part_skyline,
revenue_holt_forecast, rolling_median_revenue, part_association_rules,
bootstrap_revenue_ci, k_anonymity_audit, corpus_sample_stats,
clean_corpus_stats, dedup_fingerprint, repetition_quality,
temperature_mix_stats, substring_dedup_stats, corpus_epoch_stats,
weighted_sample_stats, word_typo_pairs, source_quota_allocation,
sample_extrapolation_audit, source_coverage_greedy, decontaminate_bloom,
zorder_locality_stats, reservoir_sample_stats, dq_audit,
training_shard_stats, incremental_rollup_stats, join_skew_audit,
partition_change_plan, heavy_shingle_stats, kmeans_cells, knn_cosine_lsh,
embedding_quantize_stats, boilerplate_span_stats, media_dedup_stats — plus
the 4 rows-only-by-design entries (price_tdigest_quantiles,
adjacency_degree_approx, bpe_encode_stats, hll_user_rollup) under the
rows-only allowlist, and the queries added during round 4
(supplier_bfs_levels, supplier_hits_scores, hourly_gap_fill,
source_nucleus_selection, price_mad_stats, value_quantile_profile) fill
six of the remaining slots. End state: ever-proven = full catalog.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The round whose CORRECTNESS artifact the current _DRIVER_WINDOW targets.
# tests/test_catalog_contract.py uses this to compare the window only against
# artifacts from rounds STRICTLY BEFORE it — otherwise the rotation test goes
# red the moment the driver deposits the in-flight round's own artifact
# (VERDICT r3 "What's wrong" #1). Bump this together with every rotation.
WINDOW_ROUND = 4

# Window entries allowed to carry only the driver's weaker rows-only check
# (no value oracle BY DESIGN: sketch estimates / greedy encodings whose
# accuracy is pinned by pytest instead). Empty in round 4; round 5 rotates
# in the documented four (price_tdigest_quantiles, adjacency_degree_approx,
# bpe_encode_stats, hll_user_rollup) so the full catalog ends driver-proven.
WINDOW_ROWS_ONLY_OK: frozenset[str] = frozenset()

# The 50 driver-scored queries, in scoring order. Round-4 rotation: 5 pinned
# gates + 45 first-time-checked entries (see module docstring). All 50 carry
# full value-hash oracles.
_DRIVER_WINDOW = [
    # pinned gates (sim.sc:476, 511 parity; flagship; LLM-side flagship DAG;
    # S5/S6 write->read-back)
    "drug_disease_pipeline",
    "drug_disease_pipeline_whitelist",
    "flagship_harmonic_topk",
    "corpus_release_pipeline",
    "sink_roundtrip",
    # scale-join strategies + custom Python DataSource surface (round-3 suite,
    # first driver rows — VERDICT r3 item 1 lead cluster)
    "bucketed_join_revenue",
    "bloom_prune_revenue",
    "interval_dim_revenue",
    "python_datasource_stats",
    "python_sink_roundtrip",
    "partitioned_prune_revenue",
    "csv_sink_roundtrip",
    # multi-join analytics trio (TPC-H Q3/Q7/Q18 shapes)
    "shipping_priority_topk",
    "volume_shipping_matrix",
    "large_volume_customers",
    # windows + SQL-text surface
    "rolling_range_revenue",
    "sql_text_lateral_topk",
    "sql_text_correlated_outliers",
    # graph, first driver rows
    "label_propagation_communities",
    "personalized_pagerank_topk",
    # curation feature matrix
    "quality_feature_matrix",
    # relational analytics tail
    "price_quantity_regression",
    "segments_per_nation",
    "top_prices_per_flag",
    "revenue_gini_per_nation",
    "regional_revenue_share",
    "monthly_revenue_momentum",
    "ship_leadtime_histogram",
    "explode_reassemble",
    # events / funnel / experimentation tail
    "value_anomaly_stats",
    "funnel_conversion",
    "order_cohort_retention",
    "time_weighted_value",
    "funnel_latency_stats",
    "value_drift_stats",
    "seasonal_hour_profile",
    "top_session_paths",
    "hourly_autocorr",
    "hourly_gap_audit",
    "funnel_conversion_windowed",
    "cumulative_users_by_day",
    "event_props_map_stats",
    "value_moments_stats",
    "value_ks_by_type",
    "type_dow_chi2",
    "click_attribution_stats",
    "ab_conversion_lift",
    "growth_accounting",
    "ab_cuped_estimates",
    "next_event_examples",
]


def merged_catalog() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge all catalog modules; late import so a broken module is obvious.

    Returns queries ordered driver-window-first (see module docstring)."""
    from platform_etl_drug_disease_spark.plans import (
        arrays_hof,
        dedup_text,
        events_time,
        graph,
        lakehouse,
        pipeline_catalog,
        quality_lm,
        relational,
        retrieval,
        scalar_fns,
        scale_joins,
        similarity,
        sinks,
        streaming_media,
    )

    all_queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        relational,
        arrays_hof,
        scalar_fns,
        events_time,
        graph,
        dedup_text,
        lakehouse,
        quality_lm,
        similarity,
        retrieval,
        streaming_media,
        pipeline_catalog,
        scale_joins,
        sinks,
    ):
        all_queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)

    missing = [n for n in _DRIVER_WINDOW if n not in all_queries]
    if missing:
        raise RuntimeError(f"_DRIVER_WINDOW names not in catalog: {missing}")
    queries: dict[str, QueryFn] = {n: all_queries[n] for n in _DRIVER_WINDOW}
    for n, fn in all_queries.items():
        if n not in queries:
            queries[n] = fn
    return queries, oracles
