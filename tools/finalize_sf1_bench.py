"""Assemble BENCH_sf1.json from a SINGLE uniform bench.py run at sf~1.

VERDICT r3 item 4: the previous artifact was merged from a 178-query run
plus separately-timed round-3 additions; this rebuilds it from one
protocol-uniform run (every headline query, one session, best-of-2,
cache cleared between runs) so there is no protocol seam.

Usage:
    SPARK_GRAFT_SF_DIR=/tmp/sfbench1 \
        SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_final_detail.json python bench.py
    python tools/finalize_sf1_bench.py /tmp/bench_sf1_final_detail.json
"""

from __future__ import annotations

import json
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf1_final_detail.json"

detail = json.load(open(SRC))
# Refuse to publish a mislabeled artifact: the detail must come from the
# make_scaled_sf output dir (bench.py records sf from the dir name; the
# /tmp/sfbench1 layout yields the literal string "bench1"), never from a
# routine sf0.1/sf0.01 run left behind in the same path.
if detail.get("sf") != "bench1":
    raise SystemExit(
        f"{SRC} records sf={detail.get('sf')!r} — not a /tmp/sfbench1 run; "
        "refusing to stamp it as the sf~1 artifact"
    )
# Refuse a --queries subset run (ADVICE r5): its exclusion fields describe a
# different basis than the full headline this artifact claims to be.
if detail.get("subset"):
    raise SystemExit(
        f"{SRC} is a --queries subset run; the sf~1 artifact must come from "
        "a full-headline bench.py invocation"
    )
out = {
    "metric": "headline_query_wall_clock_total",
    "value": detail["value"],
    "unit": "sec",
    "sf": 1.0,
    "sf_note": (
        "tools/make_scaled_sf.py replication of sf0.1 (x10 rows, adversarial "
        "duplicate mass); dir /tmp/sfbench1"
    ),
    "n_queries": len(detail["queries"]),
    "protocol": (
        "ONE uniform bench.py run: every headline query, one session, "
        "best-of-2 per query, cache cleared between runs, local[32]; no "
        "merged sessions (VERDICT r3 item 4)"
    ),
    # exclusion basis travels WITH the artifact (ADVICE r4): totals from
    # different rounds are only comparable when their exclusion sets match.
    # HARD-FAIL on details that predate the basis keys — defaulting would
    # publish a mislabeled 'n_excluded: 0' artifact, the exact error this
    # field exists to prevent.
    "n_excluded": detail["n_excluded"],
    "excluded": detail["excluded"],
    # drift-normalization constants (VERDICT r8 residual 3; the shuffle
    # probe is VERDICT r9 item 1 — sf~1 is exactly where the graph/
    # streaming families' shuffle-bound drift needs it) must travel with
    # the artifact, not just the detail file, or cross-round sf~1 ratios
    # cannot be calibration-corrected. get() for the shuffle probe: detail
    # files from rounds before it carry only the CPU constant.
    "calibration_sec": detail["calibration_sec"],
    "calibration_shuffle_sec": detail.get("calibration_shuffle_sec"),
    "queries": dict(sorted(detail["queries"].items())),
}
with open("/root/repo/BENCH_sf1.json", "w") as fh:
    json.dump(out, fh, indent=1, sort_keys=True)
print(f"BENCH_sf1.json: {out['value']} s / {out['n_queries']} queries")
