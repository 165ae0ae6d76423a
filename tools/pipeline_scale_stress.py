"""Scale-stress harness for the reference-parity drug-disease pipeline.

The catalog's pipeline gate runs over the tiny engineered golden inputs
(plans/synthetic_domain.py), so its ~7 s wall is pure stage-count constant
and says nothing about how the DAG behaves when the protein graph has HUB
TARGETS — SURVEY §7's named risk for the propagate path (reference
semantics sim.sc:450/464). This tool closes that gap (VERDICT r4 item 4):

1. generates a deterministic synthetic domain fixture at a given scale with
   POWER-LAW protein degree — preferential-attachment interactions plus one
   planted mega-hub touching every 2nd protein (~half the proteome) — and
   writes it to parquet (generation is NOT part of the timed window);
2. times ``run_pipeline`` end-to-end over the parquet inputs with BOTH
   reference sinks executed (associations → parquet, sim.sc:476;
   drug_disease → JSON, sim.sc:511), best-of-2, cache cleared between runs;
3. re-runs the network build with the AQE skew-join net armed (thresholds
   lowered to engage at fixture bytes; autoBroadcast off so the
   neighbour-tissues join is an SMJ) and reports whether the planted hub
   key actually came out ``skew=true`` — proving the 100-TB safety net
   fires on THIS DAG, not just on a synthetic planted join.

Usage:
    python tools/pipeline_scale_stress.py [--scales 1,10] [--out /tmp/domain_stress]

Prints one JSON line per scale plus a final summary JSON with the wall
ratio and the skew verdict. Record the numbers in PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DISEASES = 25   # dims don't grow with scale (realistic: EFO is fixed)
N_DRUGS = 40
N_TISSUES = 8


def _gen_rows(scale: int, base_targets: int = 2000) -> dict[str, list]:
    """Deterministic domain rows. Interactions follow Barabási–Albert-style
    preferential attachment (endpoint list sampling with a fixed integer
    mixer — node i attaches to a node drawn ∝ current degree), plus a
    planted mega-hub P1 interacting with every 2nd protein: the degree
    distribution is power-law with a guaranteed hot key for the
    neighbour-explode join. ``base_targets`` exists so the pytest can run
    the same generator at smoke size."""
    n_t = base_targets * scale

    # --- interactions: preferential attachment + planted hub -------------
    ends = [0, 1]
    edge_set = {(0, 1)}
    for i in range(2, n_t):
        j = ends[(i * 2654435761) % len(ends)]
        if j == i:
            j = i - 1
        edge_set.add((min(i, j), max(i, j)))
        ends.append(i)
        ends.append(j)
    for k in range(4, n_t, 2):  # mega-hub: P1 touches ~half the proteome
        edge_set.add((1, k))
    interactions = [
        (f"P{a}", f"P{b}", 0.9, ["intact", "string"]) for a, b in sorted(edge_set)
    ]

    targets = [
        (f"T{i}", f"G{i}", "protein_coding", f"HGNC:{i}",
         [(f"GO:{i}", (f"term{i}",))], "tract", [f"P{i}"], "loc", "sim")
        for i in range(n_t)
    ]

    # every target expresses a shared tissue (all surviving edges stay in
    # the network — stress stays on propagation) + one per-i tissue + one
    # NEGATIVE-zscore tissue the co-expression filter must drop.
    expression = [
        (f"T{i}",
         [(f"tis{i % N_TISSUES}", (1.0,), (0.0,)),
          ("tisZ", (1.0,), (0.0,)),
          ("tisNeg", (-1.0,), (0.0,))])
        for i in range(n_t)
    ]

    diseases = [
        (f"http://purl/EFO_D{d}", f"disease {d}",
         [["EFO_ROOT", f"EFO_D{d}"]], [f"phen{d}"], [f"ta{d % 4}"])
        for d in range(N_DISEASES)
    ]

    # 10 europepmc rows per target spread over diseases, scores in (0, 1);
    # plus a dropped non-europepmc row every 13th target.
    evidence = []
    for i in range(n_t):
        for k in range(10):
            d = (i * 7 + k * 3) % N_DISEASES
            score = ((i * 31 + k * 17) % 90 + 5) / 100.0
            evidence.append(
                ("europepmc", f"e{i}_{k}", (f"EFO_D{d}",), (f"T{i}",), (score,))
            )
        if i % 13 == 0:
            evidence.append(
                ("otherdb", f"x{i}", ("EFO_D0",), (f"T{i}",), (0.99,))
            )

    studies = [
        (f"S{s}", f"trait {s}", [f"EFO_D{s % N_DISEASES}"], "cat1")
        for s in range(10)
    ]
    # predictions straddle the 0.5 cutoff; every 4th target gets one.
    predictions = [
        (f"S{i % 10}", "1", 100 + i, "A", "G",
         0.3 + ((i * 29) % 60) / 100.0, f"T{i}")
        for i in range(0, n_t, 4)
    ]

    drugs = [
        (f"DR{j}", 1 + j % 4, "small molecule", f"drug{j}", 1,
         [([(f"T{(j * 13) % n_t}",)],), ([(f"T{(j * 13 + 1) % n_t}",)],)],
         [(f"EFO_D{j % N_DISEASES}",)])
        for j in range(N_DRUGS)
    ]
    aggregated = [
        (f"EFO_D{d}", f"DR{(d * 3 + m) % N_DRUGS}",
         [f"EFO_D{d}"], [f"T{(d * 11 + m) % n_t}"])
        for d in range(N_DISEASES) for m in range(2)
    ]
    faers_drug = [
        (f"DR{j}", f"ae{(j + m) % 10}", 5 + m, 1.0 + m / 10.0, 0.5)
        for j in range(N_DRUGS) for m in range(3)
    ]
    faers_target = [
        (f"T{i}", f"tae{i % 5}", 8, 1.4, 0.6) for i in range(0, n_t, 10)
    ]
    whitelist = [("W1", ["EFO_D1", "EFO_D2"])]

    return {
        "drug": drugs,
        "target": targets,
        "disease": diseases,
        "evidence": evidence,
        "interactions": interactions,
        "aggregated_drugs": aggregated,
        "studies": studies,
        "predictions": predictions,
        "faers_drug": faers_drug,
        "faers_target": faers_target,
        "expression": expression,
        "whitelist": whitelist,
    }


# fixture table names = generator dict keys = domain_schema names; only the
# two FAERS tables have a different run_pipeline kwarg spelling.
INPUT_NAMES = (
    "drug", "target", "disease", "evidence", "interactions",
    "aggregated_drugs", "studies", "predictions", "faers_drug",
    "faers_target", "expression", "whitelist",
)
_KWARG_NAME = {"faers_drug": "faers_by_drug", "faers_target": "faers_by_target"}


def write_fixture(spark, scale: int, out_dir: str, base_targets: int = 2000) -> None:
    from platform_etl_drug_disease_spark.schemas import domain_schema

    os.makedirs(out_dir, exist_ok=True)
    gen = _gen_rows(scale, base_targets)
    assert set(gen) == set(INPUT_NAMES), "INPUT_NAMES out of sync with generator"
    for name, rows in gen.items():
        df = spark.createDataFrame(rows, domain_schema(name))
        df.write.mode("overwrite").parquet(os.path.join(out_dir, name))


def load_inputs(spark, out_dir: str) -> dict:
    inputs = {}
    for name in INPUT_NAMES:
        kwarg = _KWARG_NAME.get(name, name)
        inputs[kwarg] = spark.read.parquet(os.path.join(out_dir, name))
    return inputs


def run_both_sinks(spark, inputs: dict, sink_dir: str) -> float:
    """One timed end-to-end execution: both reference outputs written."""
    from platform_etl_drug_disease_spark.plans.drug_disease import run_pipeline

    batch = {k: v for k, v in inputs.items() if k != "whitelist"}
    t0 = time.perf_counter()
    out = run_pipeline(**batch)
    out.associations.write.mode("overwrite").parquet(
        os.path.join(sink_dir, "associations")
    )
    out.drug_disease.write.mode("overwrite").json(
        os.path.join(sink_dir, "drug_disease")
    )
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    return wall


def network_shuffle_stats(spark, inputs: dict) -> list[dict]:
    """Raw MapOutputStatistics for every shuffle stage of the network build
    (the neighbour-explode join): per-stage max/median partition bytes. This
    is the ground truth the AQE skew verdicts summarize — recorded so the
    PERF.md table can show the hub key's actual byte skew at each scale
    (round-5 lesson: debug skew decisions from bytesByPartitionId, not from
    plan strings alone). Runs under the SAME armed confs as the skew check
    (autoBroadcast off → the neighbour join is an SMJ whose exchanges carry
    the raw per-key distribution; with defaults the dims broadcast and
    there is no shuffle to measure), with the skew/coalesce REWRITES off so
    the recorded bytes are the pre-AQE distribution, not the post-split
    one."""
    import statistics

    from platform_etl_drug_disease_spark.plans.domain_loaders import (
        shape_expression,
        shape_targets,
    )
    from platform_etl_drug_disease_spark.plans.network import (
        tissue_filtered_network,
    )

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    stats: list[dict] = []
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        net = tissue_filtered_network(
            inputs["interactions"],
            shape_targets(inputs["target"]),
            shape_expression(inputs["expression"]),
        )
        net.collect()

        def walk(node) -> None:
            cls = node.getClass().getSimpleName()
            if cls == "AdaptiveSparkPlanExec":
                walk(node.executedPlan())
                return
            if cls.endswith("QueryStageExec"):
                if "Shuffle" in cls:
                    ms = node.mapStats()
                    if ms.isDefined():
                        xs = list(ms.get().bytesByPartitionId())
                        nz = [x for x in xs if x > 0] or [0]
                        stats.append(
                            {
                                "partitions": len(xs),
                                "max_bytes": max(xs),
                                "median_nonzero_bytes": int(statistics.median(nz)),
                            }
                        )
                walk(node.plan())
                return
            it = node.children().iterator()
            while it.hasNext():
                walk(it.next())

        walk(net._jdf.queryExecution().executedPlan())
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    spark.catalog.clearCache()
    return stats


def skew_net_engages(spark, inputs: dict, coalesce: bool = False) -> bool:
    """Arm the AQE skew net at fixture-sized thresholds and check the
    network build (the neighbour-explode join feeding the propagate path):
    the planted mega-hub's key must come out of AQE as a skew=true SMJ.

    ``coalesce=False`` (the toy-scale proxy, measured round 5): at 1×–10×
    the stage totals ~1 MB, so CoalesceShufflePartitions (parallelismFirst
    + 1 MB minPartitionSize) merges the ~29 KB raw partitions into ≥1 MB
    reads BEFORE the skew comparison — after which the 164 KB hot-key
    partition is no longer ≥ factor × median and the split is (correctly)
    skipped; disabling coalesce exposes the raw distribution.

    ``coalesce=True`` (round 6, the data-bound check): once median raw
    partitions exceed coalesce's 1 MB minPartitionSize the merge is a no-op
    and the two AQE rules compose WITHOUT any workaround — the 100× fixture
    is the first scale where that regime is reachable locally, so the 100×
    run asserts skew=true with coalesce LEFT ON, closing the round-5
    negative result with a measurement instead of an argument."""
    from platform_etl_drug_disease_spark.plans.domain_loaders import (
        shape_expression,
        shape_targets,
    )
    from platform_etl_drug_disease_spark.plans.network import (
        tissue_filtered_network,
    )

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled":
            "true" if coalesce else "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        net = tissue_filtered_network(
            inputs["interactions"],
            shape_targets(inputs["target"]),
            shape_expression(inputs["expression"]),
        )
        net.collect()  # finalize THIS plan under AQE
        plan = net._jdf.queryExecution().executedPlan().toString()
        return "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10")
    ap.add_argument("--out", default="/tmp/domain_stress")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from platform_etl_drug_disease_spark.session import get_spark

    spark = get_spark(app_name="pipeline_scale_stress")
    results: dict[int, dict] = {}
    for scale in scales:
        fx = os.path.join(args.out, f"scale{scale}")
        write_fixture(spark, scale, fx)
        inputs = load_inputs(spark, fx)
        sink = os.path.join(fx, "_sinks")
        walls = []
        for _ in range(2):  # best-of-2, both cold (cache cleared inside)
            if os.path.isdir(sink):
                shutil.rmtree(sink)
            walls.append(run_both_sinks(spark, inputs, sink))
        n_assoc = spark.read.parquet(os.path.join(sink, "associations")).count()
        n_dd = spark.read.json(os.path.join(sink, "drug_disease")).count()
        skew = skew_net_engages(spark, inputs)
        skew_coalesced = skew_net_engages(spark, inputs, coalesce=True)
        shuffles = network_shuffle_stats(spark, inputs)
        hot = max(shuffles, key=lambda s: s["max_bytes"]) if shuffles else None
        results[scale] = {
            "scale": scale,
            "wall_sec": round(min(walls), 3),
            "associations_rows": n_assoc,
            "drug_disease_rows": n_dd,
            "aqe_skew_split_on_network_join": skew,
            "aqe_skew_split_with_coalesce_on": skew_coalesced,
            "network_hot_shuffle": hot,
        }
        print(json.dumps(results[scale]))
    if len(scales) >= 2:
        ratios = [
            {
                "scales": f"{lo}->{hi}",
                "data_ratio": hi / lo,
                "wall_ratio": round(
                    results[hi]["wall_sec"] / results[lo]["wall_sec"], 3
                ),
            }
            for lo, hi in zip(scales, scales[1:])
        ]
        print(json.dumps({
            "metric": "pipeline_scale_stress",
            "ratios": ratios,
            "results": results,
        }))


if __name__ == "__main__":
    main()
