"""Catalog/window/bench lockstep contracts (VERDICT r2 items 2 and 5).

The driver scores only the first 50 ``queries()`` entries per round, so the
window rotates (plans/__init__.py docstring). These tests pin the rotation
invariants so a future edit can't silently regress them:

- every in-window query carries a full value-hash oracle;
- the window is ≥80% first-time-checked vs the committed CORRECTNESS
  artifacts (the whole point of rotating);
- every SURVEY §2 operator id keeps an exercising query in
  (window ∪ ever-driver-proven) — rotation must never orphan an id;
- bench.py's timed headline covers the ENTIRE catalog (minus explicitly
  excluded, reasoned entries), so BENCH can't lag the catalog again;
- the generated PERF.md plan-audit table covers the full headline.
"""

from __future__ import annotations

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _window():
    from platform_etl_drug_disease_spark.plans import _DRIVER_WINDOW

    return list(_DRIVER_WINDOW)


def _catalog():
    from platform_etl_drug_disease_spark.plans import merged_catalog

    return merged_catalog()


def _ever_proven(before_round: int | None = None) -> set[str]:
    """Queries with a green driver CORRECTNESS row in any committed round.

    ``before_round`` restricts to artifacts from rounds STRICTLY BEFORE it.
    The rotation test must pass it (plans.WINDOW_ROUND): the driver deposits
    CORRECTNESS_r{WINDOW_ROUND}.json covering exactly the current window, so
    counting that artifact would flip "first-time" to 0 the moment the round
    is scored (the r3 post-scoring red, VERDICT r3 "What's wrong" #1).
    """
    names: set[str] = set()
    for fname in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if m:
            if before_round is not None and int(m.group(1)) >= before_round:
                continue
            rows = json.load(open(os.path.join(REPO, fname)))
            for name, rec in rows.items():
                ok = (
                    rec.get("rows_match")
                    and rec.get("schema_match") is not False
                    and rec.get("hash_match") is not False
                    and not rec.get("err")
                )
                if ok:
                    names.add(name)
    return names


def test_window_is_50_and_fully_oracled():
    from platform_etl_drug_disease_spark.plans import WINDOW_ROWS_ONLY_OK

    q, o = _catalog()
    w = _window()
    assert len(w) == 50
    assert len(set(w)) == 50
    missing = [n for n in w if n not in q]
    assert not missing, f"window names absent from catalog: {missing}"
    # every window entry carries a full value oracle, except the explicit
    # rows-only-by-design allowlist (sketch/greedy queries whose accuracy
    # is pinned by pytest; the driver records their weaker rows-only check)
    unoracled = [n for n in w if n not in o and n not in WINDOW_ROWS_ONLY_OK]
    assert not unoracled, f"window entries without a value oracle: {unoracled}"
    ghost_allow = [n for n in WINDOW_ROWS_ONLY_OK if n in o]
    assert not ghost_allow, (
        f"rows-only allowlist entries that HAVE an oracle (remove them): "
        f"{ghost_allow}"
    )


def test_window_includes_all_unproven():
    """Saturated-regime rotation contract (round 6+): ever-driver-proven
    reached ~the full catalog in r5, so "≥80% first-time" is arithmetically
    impossible and the binding invariant becomes the ADD-THEN-FREEZE policy
    (VERDICT r5 item 5): EVERY oracled catalog query with no strict green
    driver row in rounds < WINDOW_ROUND must be in the window — no addition
    ever waits a round for driver proof — and the leftover slots are
    re-greens (which the oldest-evidence-first policy in plans/__init__.py
    allocates)."""
    from platform_etl_drug_disease_spark.plans import WINDOW_ROUND

    q, o = _catalog()
    w = set(_window())
    # Compare only against rounds before the window's own round — the driver
    # deposits CORRECTNESS_r{WINDOW_ROUND}.json covering exactly this window,
    # which must not count as "already proven" for rotation purposes.
    proven = _ever_proven(before_round=WINDOW_ROUND)
    unproven_oracled = [n for n in q if n not in proven and n in o]
    left_out = [n for n in unproven_oracled if n not in w]
    assert not left_out, (
        f"add-then-freeze contract: oracled queries with no driver row that "
        f"the round-{WINDOW_ROUND} window fails to include: {left_out}"
    )


def test_window_round_tracks_artifacts():
    """WINDOW_ROUND must be bumped with each rotation: it may never lag an
    artifact that is NOT exactly this window (a stale round number would make
    the rotation test compare against the wrong artifact set)."""
    from platform_etl_drug_disease_spark.plans import WINDOW_ROUND

    w = set(_window())
    for fname in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if m and int(m.group(1)) >= WINDOW_ROUND:
            rows = json.load(open(os.path.join(REPO, fname)))
            assert set(rows) == w, (
                f"{fname} (round {m.group(1)}) >= WINDOW_ROUND "
                f"{WINDOW_ROUND} but covers a different window — rotate "
                f"_DRIVER_WINDOW and bump WINDOW_ROUND together"
            )


# SURVEY §2 operator id -> exercising catalog queries (the VERDICT r2
# coverage table's mapping). Rotation may move the exercising query out of
# the current window only if it already has a committed green driver row.
SURVEY_IDS: dict[str, list[str]] = {
    "S1": ["drug_disease_pipeline"],
    "S2": ["flagship_harmonic_topk"],
    "S3": ["flagship_harmonic_topk"],  # multi-file dirs; explicit glob in test_sources
    "S4": ["drug_disease_pipeline_whitelist"],
    "S5": ["sink_roundtrip"],
    "S6": ["sink_roundtrip"],
    "S7": ["sql_text_revenue"],
    "P1": ["flagship_harmonic_topk"],
    "P2": ["nested_struct_rollup"],
    "P3": ["part_id_synthesis"],
    "P4": ["returnflag_pivot"],
    "P5": ["cdc_upsert_stats", "symmetric_trade_edges"],
    "P6": ["pricing_summary"],
    "P7": ["revenue_by_nation"],
    "P8": ["region_segment_flatten"],
    "P9": ["priority_set_algebra"],
    "P10": ["returnflag_pivot"],
    "J1": ["flagship_harmonic_topk"],
    "J2": ["revenue_by_nation"],
    "J3": ["customer_order_left"],
    "J4": ["drug_disease_pipeline"],
    "J5": ["symmetric_trade_edges"],
    "J6": ["customers_with_open_orders"],
    "J7": ["drug_disease_pipeline"],
    "A1": ["adjacency_lut"],
    "A2": ["adjacency_degree_audit"],
    "A3": ["flagship_harmonic_topk"],
    "A4": ["nested_struct_rollup", "drug_disease_pipeline"],
    "A5": ["pricing_summary"],
    "A6": ["returnflag_pivot", "drug_disease_pipeline"],
    "A7": ["returnflag_pivot", "event_transition_matrix"],
    "A8": ["flagship_harmonic_topk"],
    "A9": ["symmetric_trade_edges"],
    "A10": ["flagship_harmonic_topk"],
    "W1": ["user_sessions", "scd2_history_stats"],
    # O1 (global sort) deliberately dropped from hot paths — SURVEY X4
    "O2": ["flagship_harmonic_topk"],
    "O3": ["flagship_harmonic_topk"],
    "U1": ["symmetric_trade_edges"],
    "U2": ["scd2_history_stats"],
    "U3": ["segment_set_algebra"],
    "U4": ["priority_set_algebra"],
    "U5": ["propagate_scores"],
    "U6": ["priority_set_algebra"],
    "U7": ["region_segment_flatten"],
    "F1": ["propagate_scores"],
    "F2": ["region_segment_flatten"],
    "F3": ["region_segment_flatten"],
    "F4": ["hof_acctbal_pipeline", "drug_disease_pipeline"],
    "F5": ["hof_acctbal_pipeline"],
    "F6": ["flagship_harmonic_topk"],
    "F7": ["priority_set_algebra"],
    "F8": ["nested_struct_rollup"],
    "F9": ["propagate_scores"],
    "F10": ["nested_struct_rollup"],
    "F11": ["part_id_synthesis"],
    "F12": ["part_id_synthesis"],
    "F13": ["part_id_synthesis"],
    "F14": ["flagship_harmonic_topk"],
    "F15": ["flagship_harmonic_topk"],
    "F16": ["drug_disease_pipeline"],
    "F17": ["flagship_harmonic_topk"],
    "F18": ["flagship_harmonic_topk"],
    "F19": ["flagship_harmonic_topk"],
    "F20": ["user_sessions"],
    "F21": ["json_props_rollup", "variant_props_stats"],
    "STREAM": ["streaming_hourly_windows", "streaming_session_windows"],
    "D1": ["region_descendants"],
    "D2": ["segment_acctbal_zscore"],
    "D3": ["multimodal_features", "multimodal_frame_sample"],
    "C1": ["drug_disease_pipeline"],
    "C2": ["drug_disease_pipeline"],
}


def test_every_survey_id_stays_driver_covered():
    q, _ = _catalog()
    covered = set(_window()) | _ever_proven()
    orphans = {
        op_id: names
        for op_id, names in SURVEY_IDS.items()
        if not any(n in covered for n in names)
    }
    assert not orphans, f"SURVEY §2 ids with no driver-covered query: {orphans}"
    ghosts = {
        op_id: [n for n in names if n not in q]
        for op_id, names in SURVEY_IDS.items()
        if any(n not in q for n in names)
    }
    assert not ghosts, f"SURVEY map references unknown queries: {ghosts}"


def test_bench_headline_covers_catalog():
    import bench

    q, _ = _catalog()
    timed = set(bench.headline_names())
    excluded = set(bench.EXCLUDED)
    assert timed | excluded == set(q), (
        f"catalog queries neither timed nor excluded: "
        f"{sorted(set(q) - timed - excluded)}; "
        f"stale headline/excluded names: {sorted((timed | excluded) - set(q))}"
    )
    assert not (timed & excluded)
    for name, reason in bench.EXCLUDED.items():
        assert reason.strip(), f"exclusion without a reason: {name}"


def test_bench_exclusion_list_is_frozen():
    """The exclusion list is FROZEN at the two exact-truth measurement
    instruments (VERDICT r6 item 6): `dedup_ngram_jaccard` (the unbounded
    exact relation, retained only as the recall audits' truth source — its
    exact-verify cost is carried in the headline by
    `dedup_ngram_jaccard_topk`) and `dedup_recall_audit` (which composes
    that same unbounded truth side). Any new exclusion is a silent-basis
    change for every BENCH artifact consumer and must be a deliberate,
    reviewed edit of BOTH this test and bench.EXCLUDED — growing the list
    is how a headline quietly stops covering the catalog."""
    import bench

    assert set(bench.EXCLUDED) == {"dedup_ngram_jaccard", "dedup_recall_audit"}


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_PERF_LOCKSTEP", "1") == "0",
    reason="PERF.md regeneration in progress",
)
def test_perf_table_covers_headline():
    import bench

    perf = open(os.path.join(REPO, "PERF.md")).read()
    generated = perf.split("<!-- MANUAL SECTIONS BELOW -->")[0]
    table_names = {
        line.split("|")[1].strip()
        for line in generated.splitlines()
        if line.startswith("| ") and line.count("|") >= 7
    }
    missing = [n for n in bench.headline_names() if n not in table_names]
    assert not missing, (
        f"PERF.md plan-audit table lags the bench headline by "
        f"{len(missing)} queries: {missing[:10]}... — regenerate with "
        f"`python tools/plan_report.py`"
    )


def test_memo_owner_registry():
    """Every memo cost owner in plans.memo_owners is a real catalog query
    (so bench's pre-run reset lands before a TIMED build), every reset is
    callable and idempotent, and bench._pre_run_reset delegates to the
    registry (bench.py is frozen; memos register owners in plans code)."""
    import bench
    from platform_etl_drug_disease_spark.plans import memo_owners

    q, _ = _catalog()
    unknown = [n for n in memo_owners.OWNERS if n not in q]
    assert not unknown, f"memo owners that are not catalog queries: {unknown}"
    for name, reset in memo_owners.OWNERS.items():
        reset()  # must not raise
        reset()  # idempotent
        bench._pre_run_reset(name)  # the harness path reaches the same reset
    bench._pre_run_reset("not_a_catalog_query")  # non-owner: silent no-op


def test_bench_detail_path_routing(monkeypatch):
    """BENCH_DETAIL.json is reserved for full-headline runs at the
    machine's own core count; subset probes and low-core contract reruns
    route to suffixed files so they can never clobber the committed
    full-core detail (VERDICT r10 item 1)."""
    import bench

    monkeypatch.delenv("SPARK_GRAFT_BENCH_OUT", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    assert bench._detail_path(False).endswith("/BENCH_DETAIL.json")
    assert bench._detail_path(True).endswith("/BENCH_DETAIL_SUBSET.json")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    assert bench._detail_path(False).endswith("/BENCH_DETAIL.json")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8" if os.cpu_count() != 8 else "4")
    low = bench._detail_path(False)
    assert low.endswith("_C8.json") or low.endswith("_C4.json")
    assert bench._detail_path(True).endswith("/BENCH_DETAIL_SUBSET.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", "/tmp/custom_out.json")
    assert bench._detail_path(False) == "/tmp/custom_out.json"
    assert bench._detail_path(True) == "/tmp/custom_out.json"
