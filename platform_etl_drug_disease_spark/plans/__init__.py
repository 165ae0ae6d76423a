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

Round-9 window (current): the 5 pins; the 5 round-9 items
(`repeat_mass_by_source` — per-source repeated-token-mass attribution,
the third consumer of the shared suffix-ranking artifact —
`streaming_dedup_multibatch` / `streaming_containment_multibatch`, the
serve twins under a real >= 3-micro-batch feed, `capped_repeat_estimate`
— the sampled-interior estimator for beyond-cap anchors, audited
against exact truth on the affordable df band — and
`repeat_keep_one_retention`, the keep-one ExactSubstr accounting twin
of the release pipeline's remove-all strip, all new); then ALL 37
queries whose latest strict green is round 4 (the oldest cohort after a
fully-green r8 re-proved the r3 cohort), then the 3 alphabetically-first
of the r5-latest cohort. Note `longest_repeat_census` and
`top_repeated_spans` now consume the memoized `_suffix_ranking`
artifact — value-identical by construction and by
tests/test_extensions.py::test_suffix_artifact_reuse, so their r8 rows
remain their driver proof.

Pre-staged round-10 rotation: land round-10 additions FIRST
(add-then-freeze), bump WINDOW_ROUND to 10, keep the 5 pins, fill the
remaining slots oldest-driver-evidence-first — after a green
CORRECTNESS_r09 the oldest cohort is the ~36 remaining r5-latest
queries, then r6-latest.
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
WINDOW_ROUND = 9

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
    # round-9 items, first driver rows (add-then-freeze): per-source
    # repeated-mass attribution over the shared suffix artifact, the
    # two multi-micro-batch streaming serve twins, and the sampled
    # capped-anchor estimator audit
    "repeat_mass_by_source",
    "streaming_dedup_multibatch",
    "streaming_containment_multibatch",
    "capped_repeat_estimate",
    "repeat_keep_one_retention",
    # re-greens: every query whose latest strict green driver row is
    # ROUND 4 (the oldest remaining cohort after a green r8 — the r3
    # cohort was fully re-proven in round 8), all 37
    "ab_conversion_lift",
    "bloom_prune_revenue",
    "click_attribution_stats",
    "cumulative_users_by_day",
    "event_props_map_stats",
    "explode_reassemble",
    "funnel_conversion",
    "funnel_latency_stats",
    "growth_accounting",
    "hourly_autocorr",
    "hourly_gap_audit",
    "interval_dim_revenue",
    "large_volume_customers",
    "monthly_revenue_momentum",
    "next_event_examples",
    "order_cohort_retention",
    "partitioned_prune_revenue",
    "price_quantity_regression",
    "python_sink_roundtrip",
    "quality_feature_matrix",
    "regional_revenue_share",
    "revenue_gini_per_nation",
    "seasonal_hour_profile",
    "segments_per_nation",
    "ship_leadtime_histogram",
    "shipping_priority_topk",
    "sql_text_correlated_outliers",
    "sql_text_lateral_topk",
    "time_weighted_value",
    "top_prices_per_flag",
    "top_session_paths",
    "type_dow_chi2",
    "value_anomaly_stats",
    "value_drift_stats",
    "value_ks_by_type",
    "value_moments_stats",
    "volume_shipping_matrix",
    # re-greens: the 3 alphabetically-first of the r5-latest cohort
    "boilerplate_span_stats",
    "bootstrap_revenue_ci",
    "clean_corpus_stats",
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
