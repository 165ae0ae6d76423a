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

Round-7 window (current): the 5 pins; the 4 round-7 additions
(`dedup_containment_minhash_topk` — the containment family's
sub-quadratic candidate path — `containment_recall_audit`, its
per-(decile × size-stratum) recall pricing vs the exact truth (VERDICT r6
item 2), `containment_incremental`, the family's serve-path matcher, and
`quoted_span_stats`, verbatim quoted-span detection); then all 32
queries whose latest strict green is round 2 (the oldest cohort after
the fully-green r6), then 9 round-3-era picks covering the
dedup/streaming/ANN/BPE/decontamination/SQL-surface families.

Pre-staged round-8 rotation: land any round-8 additions FIRST
(add-then-freeze), bump WINDOW_ROUND to 8, keep the 5 pins, fill the
remaining slots oldest-driver-evidence-first — after a green
CORRECTNESS_r07 the oldest cohort is the ~31 remaining r3-latest queries
(calibration/graph/streaming/lakehouse-era; enumerate from the committed
artifacts), then the r4-latest cohort.
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
WINDOW_ROUND = 7

# RETIRED round 6 (VERDICT r5 item 2): every window entry now carries a full
# value-hash oracle. The rows-only sketch/greedy originals
# (price_tdigest_quantiles, adjacency_degree_approx, bpe_encode_stats,
# hll_user_rollup) live in the catalog TAIL with pytest-pinned accuracy and
# hash-provable audit twins (tdigest_quantile_audit, adjacency_degree_audit,
# bpe_roundtrip_audit, hll_rollup_audit) carrying their driver proof.
WINDOW_ROWS_ONLY_OK: frozenset[str] = frozenset()

# The 50 driver-scored queries, in scoring order. Round-7 rotation: 5 pinned
# gates + the 4 round-7 additions (landed BEFORE this freeze per
# add-then-freeze) + 41 oldest-evidence re-greens (the entire r2-latest
# cohort of 32, then 9 r3-era family representatives). Every entry carries
# a full value-hash oracle.
_DRIVER_WINDOW = [
    # pinned gates (sim.sc:476, 511 parity; flagship; LLM-side flagship DAG;
    # S5/S6 write->read-back)
    "drug_disease_pipeline",
    "drug_disease_pipeline_whitelist",
    "flagship_harmonic_topk",
    "corpus_release_pipeline",
    "sink_roundtrip",
    # round-7 additions, first driver rows (containment scale path + audit
    # + the family's serve-path matcher)
    "dedup_containment_minhash_topk",
    "containment_recall_audit",
    "containment_incremental",
    "quoted_span_stats",
    # re-greens: every query whose latest strict green driver row is ROUND 2
    "asof_latest_click",
    "bm25_search",
    "corpus_mix_stats",
    "customer_order_left",
    "customers_with_open_orders",
    "dedup_ngram_jaccard",
    "doc_chunking",
    "errors_near_purchase",
    "hof_acctbal_pipeline",
    "hybrid_rrf_search",
    "json_props_rollup",
    "lang_id_heuristic",
    "leakage_safe_split",
    "multimodal_features",
    "nested_struct_rollup",
    "part_id_synthesis",
    "pricing_summary",
    "priority_set_algebra",
    "quality_lm_score",
    "region_descendants",
    "region_segment_flatten",
    "returnflag_pivot",
    "revenue_by_nation",
    "scd2_history_stats",
    "segment_acctbal_zscore",
    "segment_set_algebra",
    "symmetric_trade_edges",
    "text_stats",
    "tfidf_top_terms",
    "token_bin_packing",
    "token_fingerprints",
    "user_sessions",
    # re-greens: r3-era picks (dedup, streaming, ANN, BPE induction,
    # decontamination, quality-AUC, and the same-SQL-text surface)
    "dedup_simhash",
    "dedup_incremental",
    "dedup_cluster_components_star",
    "streaming_session_windows",
    "streaming_user_totals",
    "sql_text_revenue",
    "knn_cosine_ivf_kmeans",
    "bpe_merge_pair_stats",
    "decontaminate_stats",
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
