"""HITS materialization trade-off curve (VERDICT r5 item 8).

The round-5 cache-release fix made ``operators/graph_algos.hits_scores``
eagerly ``localCheckpoint`` every half-step so each persisted input can be
released immediately — bounded cache for long sessions, measured +1.1 s per
query at sf≈1. This tool measures whether a cheaper form preserves that
bounded-cache property, across iteration depth (stateful-iteration cost
compounds, so a fixed-depth measurement can hide the curve's shape):

  eager      persist input → EAGER localCheckpoint output → release input
             (the shipped round-5 form; lineage truncated every half-step)
  deferred   persist input → persist output → count() to materialize →
             release input AND the previous half-step's output (≤2 score
             frames cached at any instant — still bounded); lineage NESTS
             across half-steps, so driver-side re-analysis cost can grow
             with depth (the round-3 "lazily persisted iterative rounds"
             pathology is exactly this shape)
  nopersist  no input persist at all: the normalizer aggregate and the
             division consume the half-step subtree TWICE inside one eager
             localCheckpoint job (duplicate subtrees run in parallel on
             idle cores — the round-4 measured win for single-reuse
             aggregates), zero cache-bookkeeping overhead

All three forms produce bit-identical scores (the arithmetic is untouched;
only materialization strategy differs) — asserted per run against the
shipped operator's output.

Usage:
    python tools/hits_tradeoff.py [--sf /root/testdata/sf0.1] [--iters 2,4,8]

Prints one JSON line per (strategy, n_iters) plus a summary; record the
table in PERF.md and keep the cheapest bounded-cache form in
operators/graph_algos.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

_DEC = "decimal(28,12)"


def _build_edges(spark, sf_dir: str) -> DataFrame:
    from platform_etl_drug_disease_spark.plans.graph import _directed_edges

    return (
        _directed_edges(spark, sf_dir)
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )


def _tot(s: DataFrame) -> DataFrame:
    return s.agg(F.sum(F.col("s").cast(_DEC)).cast("double").alias("t"))


def _div(s: DataFrame, key: str) -> DataFrame:
    return s.crossJoin(F.broadcast(_tot(s))).select(
        key, (F.col("s") / F.col("t")).alias("s")
    )


def run_hits(e: DataFrame, n_iters: int, strategy: str) -> DataFrame:
    handles: list[DataFrame] = []

    def norm(scores: DataFrame, key: str) -> DataFrame:
        if strategy == "eager":
            s = scores.persist()
            out = _div(s, key).localCheckpoint()
            s.unpersist()
            return out
        if strategy == "deferred":
            s = scores.persist()
            out = _div(s, key).persist()
            out.count()  # materialize BEFORE any unpersist (round-4 rule:
            # releasing at plan-build time removes the cache pre-run)
            s.unpersist()
            while handles:
                handles.pop().unpersist()
            handles.append(out)
            return out
        if strategy == "nopersist":
            return _div(scores, key).localCheckpoint()
        raise ValueError(strategy)

    auth = norm(
        e.groupBy("dst").agg(F.count(F.lit(1)).cast("double").alias("s")), "dst"
    )
    for _ in range(n_iters - 1):
        hub = norm(
            e.join(auth, "dst")
            .groupBy("src")
            .agg(F.sum(F.col("s").cast(_DEC)).cast("double").alias("s")),
            "src",
        )
        auth = norm(
            e.join(hub, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("s").cast(_DEC)).cast("double").alias("s")),
            "dst",
        )
    return auth


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", default="2,4,8")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    iters = [int(x) for x in args.iters.split(",")]

    from platform_etl_drug_disease_spark.session import get_spark

    spark = get_spark(app_name="hits_tradeoff")
    spark.range(1000).selectExpr("sum(id) s").count()  # JVM warm-up

    # reference scores from the SHIPPED operator (equality gate per variant)
    from platform_etl_drug_disease_spark.operators.graph_algos import hits_scores
    from platform_etl_drug_disease_spark.plans.graph import _directed_edges

    ref: dict[int, dict] = {}
    for k in iters:
        rows = hits_scores(_directed_edges(spark, args.sf), n_iters=k).collect()
        ref[k] = {r["node"]: r["authority"] for r in rows}
        spark.catalog.clearCache()

    results = []
    for strategy in ("eager", "deferred", "nopersist"):
        for k in iters:
            best = float("inf")
            for _ in range(args.reps):
                e = _build_edges(spark, args.sf)
                e.count()  # edge build outside the timed window: the
                # strategies differ only in half-step materialization
                t0 = time.perf_counter()
                auth = run_hits(e, k, strategy)
                got = {r["dst"]: r["s"] for r in auth.collect()}
                best = min(best, time.perf_counter() - t0)
                assert got == ref[k], f"{strategy}/k={k}: scores diverged"
                spark.catalog.clearCache()
            results.append(
                {"strategy": strategy, "n_iters": k, "wall_sec": round(best, 3)}
            )
            print(json.dumps(results[-1]))
    print(json.dumps({"metric": "hits_tradeoff", "sf": args.sf, "grid": results}))


if __name__ == "__main__":
    main()
