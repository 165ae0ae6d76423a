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


def point_in_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_days: int = 16,
) -> DataFrame:
    """Join fact rows (a DATE column) to every interval containing them —
    the dimension-calendar / validity-period lookup (promo windows, SCD
    validity ranges, maintenance periods) without a quadratic theta-join.

    A naive ``f.ts BETWEEN i.start AND i.end`` join has no equi-key, so
    Spark plans BroadcastNestedLoopJoin — every fact row tests every
    interval. Bucketing restores an equi-key: each interval explodes to
    the ``bucket_days``-wide day buckets it overlaps (an interval of length
    L covers ≤ L/bucket_days + 1 buckets — bounded, tiny for dimension
    tables), each fact row computes its single bucket, the engines
    equi-join on the bucket id, and the exact BETWEEN filter drops false
    candidates. The exploded interval side stays dimension-sized and is
    broadcast, so at 100 TB the fact table is never shuffled — the join is
    map-side and the bucket id never leaves the codegen stage.

    Inclusive bounds on both ends (BETWEEN semantics). Column names of the
    two inputs must be disjoint. Inner-join semantics only: the exact
    BETWEEN filter runs after the bucket join, so an outer variant would
    need unmatched facts re-added after the filter (a left form is
    facts.join(this_result, ..., "left") at the call site).
    """
    day = F.datediff(F.col(ts_col), F.lit("1970-01-01"))
    s_day = F.datediff(F.col(start_col), F.lit("1970-01-01"))
    e_day = F.datediff(F.col(end_col), F.lit("1970-01-01"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(s_day / F.lit(bucket_days)), F.floor(e_day / F.lit(bucket_days))
            )
        ),
    )
    f = facts.withColumn("__bucket", F.floor(day / F.lit(bucket_days)))
    joined = f.join(F.broadcast(iv), on="__bucket", how="inner").drop("__bucket")
    return joined.where(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
