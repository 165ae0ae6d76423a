"""Per-micro-batch wall-clock evidence for the streaming serve twins
(VERDICT r8 item 3): the round-8 review moved corpus indexing outside
``foreachBatch`` precisely so per-batch cost tracks the batch, never the
corpus — this harness MEASURES that claim instead of arguing it.

For each family (MinHash-LSH Jaccard, containment) it stages the incoming
feed as N landing files, runs the shared stream runner with
``maxFilesPerTrigger=1`` so ``foreachBatch`` fires N times, and prints per
repeat:

- ``stage_s``   — staging write (not part of the serve path; shown so the
  multibatch catalog entries' bench walls can be decomposed),
- ``total_s``   — stream start → awaitTermination return,
- ``lead_s``    — total minus the sum of batch walls: stream-engine
  startup + source listing + checkpoint bookkeeping + inter-batch gaps,
- ``batch walls`` — one wall per foreachBatch invocation, with its doc
  count. Batch 1 includes the once-per-snapshot corpus index
  materialization (the persists are lazy; the first batch's job is what
  forces them), so the flat-cost claim is about batches 2..N.

Repeats default to 3 because `streaming_containment_incremental`'s solo
wall has been BIMODAL across sessions (7.5 vs 13.5/16.5 s, PERF.md r8);
the decomposition shows which component doubles.

    python tools/stream_batch_walls.py [sf_dir] [n_files] [repeats]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def run_family(spark, sf_dir: str, family: str, n_files: int) -> dict:
    from platform_etl_drug_disease_spark.plans.streaming_media import (
        _containment_stream_run,
        _minhash_stream_run,
        _stage_feed,
    )

    run = _minhash_stream_run if family == "minhash" else _containment_stream_run
    t0 = time.monotonic()
    feed_dir = _stage_feed(spark, sf_dir, n_files=n_files)
    stage_s = time.monotonic() - t0
    batch_log: list = []
    t1 = time.monotonic()
    df, _ = run(
        spark,
        sf_dir,
        feed_dir=feed_dir,
        max_files_per_trigger=1,
        batch_log=batch_log,
    )
    # total_s is "stream start -> awaitTermination return" per the module
    # docstring: capture it BEFORE the read-back count, which is a separate
    # batch job run only for the report (round-9 review finding — inside
    # the window it contaminated lead_s).
    total_s = time.monotonic() - t1
    n_matches = df.count()
    return {
        "family": family,
        "stage_s": round(stage_s, 2),
        "total_s": round(total_s, 2),
        "lead_s": round(total_s - sum(b["wall_s"] for b in batch_log), 2),
        "n_matches": n_matches,
        "batches": [
            {
                "batch_id": b["batch_id"],
                "n_docs": b["n_docs"],
                "wall_s": round(b["wall_s"], 2),
            }
            for b in sorted(batch_log, key=lambda b: b["batch_id"])
        ],
    }


def main() -> None:
    from platform_etl_drug_disease_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="stream-batch-walls")
    for family in ("minhash", "containment"):
        for rep in range(repeats):
            rec = run_family(spark, sf_dir, family, n_files)
            rec["repeat"] = rep
            rec["sf_dir"] = sf_dir
            print(json.dumps(rec))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
