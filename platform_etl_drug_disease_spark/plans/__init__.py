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

Round-10 window (current): the 5 pins; the 2 round-10 items
(`corpus_release_keep_one` — the release DAG's strip stage in
keep-one-copy mode, consuming the same memoized removal set as the
`repeat_keep_one_retention` accounting twin, VERDICT r9 item 4 — and
`capped_mass_profile` — the HT-estimated repeat-length distribution of
the census' capped mass at production estimator knobs, VERDICT r9
item 3); then ALL 38 queries whose latest strict green is round 5 (the
oldest cohort after a fully-green r9), then the 5 alphabetically-first
of the r6-latest cohort. Note the strip/retention family members now
consume the memoized `_lm_starts`/`_keep_one_removals` artifacts
(VERDICT r9 item 6) — interval-union-identical by construction and
pytest-pinned, so rotated-out members' prior rows remain their driver
proof; likewise the suffix family's `lr_tokens` sanitization (item 5)
is byte-identical on any corpus free of the two separator bytes, which
includes every driver corpus.

Pre-staged round-11 rotation: land round-11 additions FIRST
(add-then-freeze), bump WINDOW_ROUND to 11, keep the 5 pins, fill the
remaining slots oldest-driver-evidence-first — after a green
CORRECTNESS_r10 the oldest cohort is the ~40 remaining r6-latest
queries, then r7-latest.
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
WINDOW_ROUND = 10

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
    # round-10 items, first driver rows (add-then-freeze): the keep-one
    # executable strip variant of the release DAG, and the HT-estimated
    # capped-mass length profile at production estimator knobs
    "corpus_release_keep_one",
    "capped_mass_profile",
    # re-greens: every query whose latest strict green driver row is
    # ROUND 5 (the oldest remaining cohort after a fully-green r9),
    # all 38
    "corpus_epoch_stats",
    "corpus_sample_stats",
    "decontaminate_bloom",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "dq_audit",
    "embedding_quantize_stats",
    "heavy_shingle_stats",
    "hourly_gap_fill",
    "incremental_rollup_stats",
    "join_skew_audit",
    "k_anonymity_audit",
    "kmeans_cells",
    "knn_cosine_lsh",
    "media_dedup_stats",
    "part_association_rules",
    "part_skyline",
    "partition_change_plan",
    "price_mad_stats",
    "repetition_quality",
    "reservoir_sample_stats",
    "revenue_holt_forecast",
    "rolling_median_revenue",
    "sample_extrapolation_audit",
    "source_coverage_greedy",
    "source_nucleus_selection",
    "source_quota_allocation",
    "streaming_cdc_upsert",
    "substring_dedup_stats",
    "supplier_bfs_levels",
    "supplier_hits_scores",
    "temperature_mix_stats",
    "trade_pagerank",
    "training_shard_stats",
    "value_quantile_profile",
    "weighted_sample_stats",
    "word_typo_pairs",
    "zorder_locality_stats",
    # re-greens: the 5 alphabetically-first of the r6-latest cohort
    "adjacency_degree_audit",
    "adjacency_lut",
    "bpe_roundtrip_audit",
    "cdc_upsert_stats",
    "cms_token_frequency",
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
