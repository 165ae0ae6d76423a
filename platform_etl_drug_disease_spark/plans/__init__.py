"""Query catalog + reference-parity pipeline plans.

Each catalog module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same parquet
tables). ``__spark_entry__.py`` merges them for the driver's correctness gate.

Ordering matters: the driver records CORRECTNESS rows for the FIRST 50
``queries()`` entries only. ``_DRIVER_WINDOW`` pins those 50 explicitly.

Rotation policy (live; per-round history lives in COVERAGE.md §Rotation):
the window is 50/round; each round keeps 5 pinned gates (the
reference-parity pipeline, its whitelist variant, the flagship, the
LLM-side flagship DAG, and the sink round-trip). ADD-THEN-FREEZE
(standing, test-enforced by `test_window_includes_all_unproven`): new
catalog queries land BEFORE the window rotates, and the rotation includes
EVERY oracled query with no strict green driver row yet — no addition
ever waits a round for driver proof. Remaining slots are re-greens filled
oldest-driver-evidence-first (latest strict green round per query,
computed from the committed CORRECTNESS_r0N.json artifacts). SURVEY §2
operator ids exercised only by rotated-out queries stay driver-proven via
those committed artifacts; tests/test_catalog_contract.py asserts every
§2 id keeps an exercising query in (window ∪ ever-driver-proven). Every
window entry carries a full value-hash oracle (WINDOW_ROWS_ONLY_OK is
retired — the 4 rows-only sketch/greedy originals live in the catalog
tail with pytest-pinned accuracy and hash-provable audit twins). The
whole catalog — window and tail — is verified every round by
``tools/oracle_check.py``.

Round-8 window (current): the 5 pins; the 4 round-8 items
(`longest_repeat_census` — exact arbitrary-length repeated-substring
dedup via prefix doubling — `top_repeated_spans`, its top-20 maximal
artifacts listing, and `streaming_containment_incremental`, the
containment family's streaming serve twin, all new; plus
`containment_recall_audit`, whose semantics changed this round to the
HT-sampled truth stage with Wilson CIs, so its r7 green row proves the
retired form and it re-proves); then ALL 33 queries whose latest strict
green is round 3 (the oldest cohort, enumerated from the committed
artifacts), then 8 round-4-era family representatives
(experimentation / bucketed join / csv sink / python datasource /
windowed funnel / label propagation / personalized pagerank / window
frames).

Pre-staged round-9 rotation: land round-9 additions FIRST
(add-then-freeze), bump WINDOW_ROUND to 9, keep the 5 pins, fill the
remaining slots oldest-driver-evidence-first — after a green
CORRECTNESS_r08 the oldest cohort is the ~36 remaining r4-latest queries,
then r5-latest.
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
WINDOW_ROUND = 8

# RETIRED round 6 (VERDICT r5 item 2): every window entry now carries a full
# value-hash oracle. The rows-only sketch/greedy originals
# (price_tdigest_quantiles, adjacency_degree_approx, bpe_encode_stats,
# hll_user_rollup) live in the catalog TAIL with pytest-pinned accuracy and
# hash-provable audit twins (tdigest_quantile_audit, adjacency_degree_audit,
# bpe_roundtrip_audit, hll_rollup_audit) carrying their driver proof.
WINDOW_ROWS_ONLY_OK: frozenset[str] = frozenset()

# The 50 driver-scored queries, in scoring order. Round-8 rotation: 5 pinned
# gates + the 4 round-8 items (landed BEFORE this freeze per
# add-then-freeze) + 41 oldest-evidence re-greens (the entire r3-latest
# cohort of 33, then 8 r4-era family representatives). Every entry carries
# a full value-hash oracle.
_DRIVER_WINDOW = [
    # pinned gates (sim.sc:476, 511 parity; flagship; LLM-side flagship DAG;
    # S5/S6 write->read-back)
    "drug_disease_pipeline",
    "drug_disease_pipeline_whitelist",
    "flagship_harmonic_topk",
    "corpus_release_pipeline",
    "sink_roundtrip",
    # round-8 items, first driver rows: the suffix-ranking census and the
    # containment streaming serve twin are new; the recall audit's
    # semantics changed to the HT-sampled truth stage (r7 row proves the
    # retired full-truth form)
    "longest_repeat_census",
    "top_repeated_spans",
    "streaming_containment_incremental",
    "containment_recall_audit",
    # re-greens: every query whose latest strict green driver row is ROUND 3
    "calibration_stats",
    "centroid_classifier_eval",
    "corpus_datacard",
    "dataset_fingerprints",
    "embedding_decontaminate",
    "embedding_drift_stats",
    "embedding_separability",
    "event_transition_matrix",
    "exact_auc_stats",
    "hard_negative_mining",
    "incremental_backfill_stats",
    "knn_eval_metrics",
    "lang_id_confusion",
    "lang_mix_divergence",
    "multimodal_frame_sample",
    "neyman_allocation",
    "orders_asof_dimension",
    "phrase_search_stats",
    "pmi_collocations",
    "quality_bigram_lm_score",
    "quality_psi_stats",
    "quality_winsor_stats",
    "snapshot_diff_stats",
    "source_overlap_jaccard",
    "streaming_click_purchase_join",
    "streaming_funnel_conversion",
    "streaming_incremental_dedup",
    "streaming_value_anomaly",
    "supplier_clustering",
    "supplier_kcore",
    "supplier_triangles",
    "variant_props_stats",
    "vocab_zipf_stats",
    # re-greens: r4-era family representatives (experimentation, bucketed
    # co-located join, csv sink, python datasource, windowed funnel, label
    # propagation, personalized pagerank, window frames)
    "ab_cuped_estimates",
    "bucketed_join_revenue",
    "csv_sink_roundtrip",
    "python_datasource_stats",
    "funnel_conversion_windowed",
    "label_propagation_communities",
    "personalized_pagerank_topk",
    "rolling_range_revenue",
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
