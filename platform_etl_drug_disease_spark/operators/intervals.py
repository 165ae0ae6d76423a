"""Interval algebra over (start, end) span tables — the gaps-and-islands
merge that span-level corpus surgery needs (repeated-substring removal,
redaction span coalescing, time-range stitching).

Pure window functions: running max-end finds island boundaries, a running
sum numbers them, one aggregate collapses each island. Everything stays in
JVM codegen; the only shuffle is the window's partition key (and Spark
reuses that exchange for both window passes — same partitioning, same
ordering)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NEG_INF = -(2**62)


def merge_intervals(
    df: DataFrame,
    part_cols: Sequence[str],
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Coalesce overlapping/touching half-open intervals per partition key.

    Returns one row per merged island with the partition columns plus
    ``start``/``end``. Touching spans ([0,8) then [8,16)) merge: a new
    island begins only where ``start`` strictly exceeds the running max end
    of all PRIOR spans. Ordering (start, end) is total per key whenever
    (start, end) pairs are distinct — the caller's responsibility, which
    position-derived spans satisfy for free.

    Scale: spans shuffle once, keyed by ``part_cols`` (document id in the
    dedup use) — per-key state is that key's span list, never the corpus.
    The island aggregate re-keys on (key, island); AQE coalesces the tiny
    second exchange."""
    order = [F.col(start).asc(), F.col(end).asc()]
    w_prev = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max_end = F.coalesce(F.max(end).over(w_prev), F.lit(_NEG_INF))
    is_new = (F.col(start) > prev_max_end).cast("long")
    island = F.sum(is_new).over(w_run)
    return (
        df.withColumn("_island", island)
        .groupBy(*list(part_cols), "_island")
        .agg(F.min(start).alias(start), F.max(end).alias(end))
        .drop("_island")
    )
