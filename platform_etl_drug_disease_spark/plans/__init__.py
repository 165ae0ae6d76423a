"""Query catalog + reference-parity pipeline plans.

Each catalog module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same parquet
tables). ``__spark_entry__.py`` merges them for the driver's correctness gate.

Ordering matters: the driver records CORRECTNESS rows for the FIRST 50
``queries()`` entries only. ``_DRIVER_WINDOW`` pins those 50 explicitly.

Rotation policy (round 3+, per VERDICT r2 item 2): the window is 50/round
but the catalog is 178 queries, so each round keeps ~5 pinned gates (the
reference-parity pipeline, its whitelist variant, the flagship, the
LLM-side flagship DAG, and the sink round-trip) and fills the remaining
~45 slots with queries that have NEVER had a driver CORRECTNESS row —
pushing the ever-driver-proven union (r1∪r2 = 76) toward full catalog
coverage. SURVEY §2 operator ids exercised only by previously-rotated-out
queries stay driver-proven via their green rows in the committed
CORRECTNESS_r0{1,2}.json artifacts; tests/test_catalog_contract.py asserts
every §2 id has an exercising query in (window ∪ ever-driver-proven).
Every in-window entry carries a full value-hash oracle; the rows-only-by-
design variants (HLL estimate values, SimHash planted-pair subsets,
BPE greedy encode) keep their accuracy pytests and sit in the tail. The
whole catalog — window and tail — is verified every round by
``tools/oracle_check.py`` (177/177 at r2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The 50 driver-scored queries, in scoring order. Round-3 rotation: 5 pinned
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
    # structured streaming twins (stream == batch == oracle), first driver rows
    "streaming_session_windows",
    "streaming_user_totals",
    "streaming_click_purchase_join",
    "streaming_cdc_upsert",
    "streaming_incremental_dedup",
    "streaming_value_anomaly",
    "streaming_funnel_conversion",
    # graph suite
    "trade_pagerank",
    "supplier_triangles",
    "supplier_kcore",
    "supplier_clustering",
    "adjacency_degree_audit",
    # similarity / embeddings
    "knn_cosine_ivf_kmeans",
    "knn_eval_metrics",
    "hard_negative_mining",
    "embedding_decontaminate",
    "embedding_drift_stats",
    "centroid_classifier_eval",
    "embedding_separability",
    # lakehouse maintenance
    "snapshot_diff_stats",
    "dataset_fingerprints",
    "incremental_backfill_stats",
    "orders_asof_dimension",
    # statistics / evaluation batch
    "exact_auc_stats",
    "calibration_stats",
    "neyman_allocation",
    "quality_winsor_stats",
    "quality_psi_stats",
    # retrieval / text-quality
    "phrase_search_stats",
    "quality_bigram_lm_score",
    "lang_id_confusion",
    "corpus_datacard",
    "vocab_zipf_stats",
    "pmi_collocations",
    "lang_mix_divergence",
    # dedup family, first driver rows
    "dedup_simhash",
    "dedup_cluster_components_star",
    "dedup_incremental",
    "source_overlap_jaccard",
    "bpe_merge_pair_stats",
    "decontaminate_stats",
    # multimodal
    "multimodal_frame_sample",
    # events + SQL surface (S7: the same SQL text on both engines)
    "event_transition_matrix",
    "variant_props_stats",
    "sql_text_revenue",
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
