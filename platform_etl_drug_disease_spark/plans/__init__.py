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

Round-5 window (current, per VERDICT r4 item 1): the 5 pinned gates,
ALL 42 queries with no strict green driver row in CORRECTNESS_r01..r04
(including the 4 rows-only-by-design sketch/greedy entries under
WINDOW_ROWS_ONLY_OK), and 3 high-value re-greens. A 50/50 green
CORRECTNESS_r05 makes ever-driver-proven = the full catalog AS OF the
round-5 rotation.

Pre-staged round-6 rotation: round 5 ADDED seven catalog queries after
the window froze — `dedup_recall_audit`, `dsir_importance_stats`,
`doremi_mixture_stats`, `doremi_token_quota`, `curation_funnel_stats`,
`dedup_quality_keeper`, `jl_projection_recall` (all full value-hash
oracles, local-green via tools/oracle_check). The round-6 window = 5
pinned gates + these seven first-timers + 38 high-value re-green slots;
bump WINDOW_ROUND to 6 with the rotation.
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
WINDOW_ROUND = 5

# Window entries allowed to carry only the driver's weaker rows-only check
# (no value oracle BY DESIGN: sketch estimates / greedy encodings whose
# accuracy is pinned by pytest instead). Round 5 rotates in the documented
# four so the full catalog ends driver-proven.
WINDOW_ROWS_ONLY_OK: frozenset[str] = frozenset(
    {
        "price_tdigest_quantiles",
        "adjacency_degree_approx",
        "bpe_encode_stats",
        "hll_user_rollup",
    }
)

# The 50 driver-scored queries, in scoring order. Round-5 rotation: 5 pinned
# gates + ALL 42 never-driver-proven entries (strict rows+schema+hash
# criterion over CORRECTNESS_r01..r04) + 3 high-value re-greens. Four entries
# are rows-only by design (WINDOW_ROWS_ONLY_OK above); the rest carry full
# value-hash oracles. End state: ever-driver-proven = full catalog.
_DRIVER_WINDOW = [
    # pinned gates (sim.sc:476, 511 parity; flagship; LLM-side flagship DAG;
    # S5/S6 write->read-back)
    "drug_disease_pipeline",
    "drug_disease_pipeline_whitelist",
    "flagship_harmonic_topk",
    "corpus_release_pipeline",
    "sink_roundtrip",
    # round-4 additions, first driver rows
    "supplier_bfs_levels",
    "supplier_hits_scores",
    "hourly_gap_fill",
    "source_nucleus_selection",
    "price_mad_stats",
    "value_quantile_profile",
    # rows-only-by-design sketch/greedy entries (WINDOW_ROWS_ONLY_OK)
    "price_tdigest_quantiles",
    "adjacency_degree_approx",
    "bpe_encode_stats",
    "hll_user_rollup",
    # relational / forecasting / stats tail
    "part_skyline",
    "part_association_rules",
    "revenue_holt_forecast",
    "rolling_median_revenue",
    "bootstrap_revenue_ci",
    "k_anonymity_audit",
    "dq_audit",
    # corpus curation / dedup / sampling tail
    "corpus_sample_stats",
    "clean_corpus_stats",
    "dedup_fingerprint",
    "repetition_quality",
    "temperature_mix_stats",
    "substring_dedup_stats",
    "corpus_epoch_stats",
    "weighted_sample_stats",
    "word_typo_pairs",
    "source_quota_allocation",
    "sample_extrapolation_audit",
    "source_coverage_greedy",
    "decontaminate_bloom",
    "reservoir_sample_stats",
    "training_shard_stats",
    "heavy_shingle_stats",
    "boilerplate_span_stats",
    # embeddings / ANN tail
    "kmeans_cells",
    "knn_cosine_lsh",
    "embedding_quantize_stats",
    "media_dedup_stats",
    # lakehouse tail
    "zorder_locality_stats",
    "partition_change_plan",
    "incremental_rollup_stats",
    "join_skew_audit",
    # high-value re-greens (previously driver-proven; rotation headroom)
    "dedup_minhash_lsh",
    "trade_pagerank",
    "streaming_cdc_upsert",
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
