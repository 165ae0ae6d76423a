"""State-store provider comparison for the streaming family (VERDICT r9
item 7): `streaming_click_purchase_join` is the most expensive streaming
headline entry and the multi-batch decomposition blames state-store /
checkpoint-fsync constants, not per-batch work. This probe times the
stream-stream join and the two incremental serve twins under both built-in
providers — the default HDFSBackedStateStoreProvider (in-memory map +
HDFS-style checkpoint files) and RocksDBStateStoreProvider (embedded
RocksDB with changelog checkpointing disabled by default) — and checks the
outputs row-count-identical across providers. The winner (or the verdict
that the constants are provider-independent) lands in PERF.md.

    python tools/statestore_probe.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}
QUERIES = [
    "streaming_click_purchase_join",
    "streaming_incremental_dedup",
    "streaming_containment_incremental",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from platform_etl_drug_disease_spark.plans import merged_catalog
    from platform_etl_drug_disease_spark.session import get_spark

    spark = get_spark(app_name="statestore_probe")
    catalog, _ = merged_catalog()
    results: dict[str, dict] = {}
    counts: dict[tuple[str, str], int] = {}
    for prov, cls in PROVIDERS.items():
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
        for name in QUERIES:
            walls = []
            n = -1
            for _ in range(repeats):
                t0 = time.monotonic()
                df = catalog[name](spark, sf_dir)
                n = df.count()
                walls.append(round(time.monotonic() - t0, 3))
                spark.catalog.clearCache()
            counts[(name, prov)] = n
            results[f"{name}.{prov}"] = {
                "walls": walls,
                "best": min(walls),
                "rows": n,
            }
            print(f"{name} [{prov}]: {walls} rows={n}", file=sys.stderr)
    for name in QUERIES:
        a, b = counts[(name, "hdfs")], counts[(name, "rocksdb")]
        assert a == b, f"{name}: provider row counts differ {a} vs {b}"
    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
