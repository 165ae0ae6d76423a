"""A/B a session-config candidate against baseline on a query subset.

Each variant runs in a FRESH subprocess (fresh JVM — codegen caches, AQE
state, and JIT warmup cannot leak between variants), executing the same
bench methodology as bench.py (best-of-2, noop sink, cache cleared, memo
resets) over a chosen subset of catalog queries.

Usage:
    python tools/conf_probe.py --confs 'k=v,k2=v2' [--label name] q1 q2 ...
    python tools/conf_probe.py --baseline q1 q2 ...   # empty conf delta

Prints one JSON line: {"label", "confs", "queries": {...}, "total"}.
This is a measurement tool (guide §1): results feed OPTIMIZATION_r10.md;
it never touches committed artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_subset(conf_pairs: dict[str, str], names: list[str]) -> dict[str, float]:
    import __spark_entry__ as entrymod
    from bench import _pre_run_reset
    from platform_etl_drug_disease_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="conf_probe", extra_conf=conf_pairs)
    catalog = entrymod.queries()
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            _pre_run_reset(name)
            t0 = time.perf_counter()
            df = catalog[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--confs", default="", help="comma-separated k=v pairs")
    ap.add_argument("--label", default="candidate")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    confs: dict[str, str] = {}
    for pair in filter(None, args.confs.split(",")):
        k, _, v = pair.partition("=")
        confs[k.strip()] = v.strip()
    timings = run_subset(confs, args.queries)
    out = {
        "label": args.label,
        "confs": confs,
        "queries": timings,
        "total": round(sum(timings.values()), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
