"""Sink operators (SURVEY.md §2.1, S5-S6).

The reference's two actions: ``associations.write.parquet`` (sim.sc:476) and
``drugDisease.write.json`` (sim.sc:511). At 100 TB the extra knobs that matter
are partitionBy (partition pruning for consumers), explicit file sizing via a
pre-write repartition, and compression codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
    target_partitions: int | None = None,
) -> None:
    """S5: parquet sink. ``target_partitions`` repartitions before the write so
    output file count/size is controlled (100-TB hygiene: avoid millions of
    tiny files or a handful of monster files)."""
    if target_partitions:
        df = df.repartition(target_partitions)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Bucketed (+ optionally sorted) managed table — the co-located-join
    primitive for repeated large joins (SURVEY.md §4 X9).

    Two tables bucketed on their join key with the same bucket count join
    WITHOUT a shuffle (no Exchange in the plan; with sort_cols, no Sort
    either): at 100 TB this converts every repeated fact-dim or fact-fact
    join on the bucket key from a full-network shuffle into a local
    per-bucket merge. Bucketing requires the table catalog (saveAsTable) —
    plain ``.parquet(path)`` writes cannot carry bucket metadata.
    """
    # A managed table's location can outlive the metastore entry (fresh
    # derby metastore, old warehouse dir — every new local session), and
    # saveAsTable then fails with LOCATION_ALREADY_EXISTS even in overwrite
    # mode. Only in OVERWRITE mode: drop the entry AND clear an orphaned
    # location (resolved from the catalog when the table exists, so a custom
    # LOCATION is honoured; Hadoop FS API so cleanup works on any storage
    # scheme). Append must never touch existing data or the catalog entry.
    spark = df.sparkSession
    exists = spark.catalog.tableExists(table)
    if mode == "overwrite":
        loc_uri = None
        if exists:
            detail = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            loc_uri = next(
                (r.data_type for r in detail if r.col_name == "Location"), None
            )
        if loc_uri is None:
            warehouse = spark.conf.get("spark.sql.warehouse.dir")
            loc_uri = f"{warehouse.rstrip('/')}/{table.lower()}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        jvm = spark._jvm
        loc = jvm.org.apache.hadoop.fs.Path(loc_uri)
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    elif mode == "append" and not exists:
        # Append with no catalog entry must CREATE the managed table; if an
        # orphaned location survives from a previous metastore, saveAsTable
        # fails with LOCATION_ALREADY_EXISTS. Deleting it here would destroy
        # data append promised to keep, so surface the ambiguity instead of
        # resolving it silently either way.
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        loc_uri = f"{warehouse.rstrip('/')}/{table.lower()}"
        jvm = spark._jvm
        loc = jvm.org.apache.hadoop.fs.Path(loc_uri)
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            raise ValueError(
                f"append to {table!r}: no catalog entry, but data exists at "
                f"{loc_uri} (orphaned by a previous metastore). Re-register "
                f"it or write with mode='overwrite' to replace it; append "
                f"will not silently adopt or delete unknown data."
            )
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    target_partitions: int | None = None,
) -> None:
    """S6: newline-JSON sink (sim.sc:511)."""
    if target_partitions:
        df = df.repartition(target_partitions)
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_sorted_shards(
    df,
    path: str,
    range_col: str,
    n_shards: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Training-shard export: globally range-partition on ``range_col`` into
    ``n_shards`` files, each sorted within itself — the standard layout for
    sequential training-data readers (a reader streams shard k and sees keys
    in order; shard boundaries are global order statistics).

    ``repartitionByRange`` samples the column to compute balanced range
    bounds (one pass + shuffle), and ``sortWithinPartitions`` sorts each
    shard during the same shuffle's reduce side — no global sort barrier,
    no driver involvement, which is what makes this the 100-TB shard writer:
    cost is one shuffle regardless of shard count. Writers downstream can
    range-prune shards by the same column."""
    out = df.repartitionByRange(n_shards, range_col)
    out = out.sortWithinPartitions(*(sort_cols or [range_col]))
    out.write.mode(mode).parquet(path)


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> int:
    """Small-file compaction pass: read a fragmented parquet directory and
    rewrite it with file count sized from the directory's ACTUAL bytes
    (ceil(total/target)), preserving rows exactly. The maintenance job that
    keeps streaming/foreachBatch landing zones (one file per micro-batch ×
    partitions) from degrading scan planning — at 100 TB, millions of tiny
    files cost more in listing + footer reads than the data itself.

    Sizing reads file METADATA only (no data pass). Writes to ``out_path``
    (default: ``path + ".compacted"``) then the caller swaps directories —
    never an in-place overwrite of an input that is still being read.
    Returns the output file count."""
    import glob as _glob
    import math
    import os

    files = [
        f
        for f in _glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    out = out_path or (path.rstrip("/") + ".compacted")
    df = spark.read.parquet(path)
    # repartition (not coalesce): coalesce(1..k) would chain the upstream
    # scan into k tasks and lose read parallelism; compaction is a shuffle
    # by design so the write tasks are balanced regardless of input layout.
    df.repartition(n_out).write.mode("overwrite").parquet(out)
    return n_out


def parquet_column_stats(path: str) -> list[dict]:
    """Storage audit from parquet FOOTERS only (no data read): per column,
    total compressed/uncompressed bytes, null count, and whether min/max
    statistics are present (the prerequisite for skipping). The layout
    check run after a write — a column whose stats are missing can never
    be pruned, and a compression ratio near 1.0 flags encoding problems."""
    import glob as _glob
    import os
    from collections import defaultdict

    import pyarrow.parquet as pq

    agg: dict[str, dict] = defaultdict(
        lambda: {
            "compressed": 0,
            "uncompressed": 0,
            "nulls": 0,
            "n_chunks": 0,
            "chunks_with_minmax": 0,
        }
    )
    files = sorted(
        f
        for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ) or ([path] if os.path.isfile(path) else [])
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = agg[col.path_in_schema]
                st["compressed"] += col.total_compressed_size
                st["uncompressed"] += col.total_uncompressed_size
                st["n_chunks"] += 1
                s = col.statistics
                if s is not None:
                    if s.null_count is not None:
                        st["nulls"] += s.null_count
                    if s.has_min_max:
                        st["chunks_with_minmax"] += 1
    return [
        {
            "column": name,
            **vals,
            "compression_ratio": round(
                vals["compressed"] / vals["uncompressed"], 4
            )
            if vals["uncompressed"]
            else None,
            "skippable": vals["chunks_with_minmax"] == vals["n_chunks"]
            and vals["n_chunks"] > 0,
        }
        for name, vals in sorted(agg.items())
    ]
