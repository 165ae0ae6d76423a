"""Streaming event-time operators.

Design rules for unbounded state at scale:
- every aggregation is watermarked — state for windows older than the
  watermark is dropped, so executor state is O(active windows), not O(stream
  history);
- window/session logic is identical to the batch forms in
  plans/events_time.py (same F.window / lag-gap semantics), so a batch
  backfill and the streaming path produce the same tables;
- sinks default to append mode (finalized windows only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DDL strings (not StructTypes): parsing DDL needs an active session, and
# every schema-accepting API below takes the string form directly.
EVENT_STREAM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "json", max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream with the explicit fixture schema (streaming
    sources never infer)."""
    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding windowed counts + sums with bounded state."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sessionized_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (F.session_window): per-user sessions close
    after ``gap`` of inactivity; watermark bounds open-session state."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "value_sum",
        )
    )


RUNNING_TOTALS_SCHEMA = "user_id bigint, total_events bigint, total_value double"
_STATE_SCHEMA = "total_events bigint, total_value double"


def running_user_totals(stream: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    event count + value total across micro-batches (the pattern for any
    operator Spark's built-in aggregations can't express).

    State is one tiny tuple per user; at scale the grouping key is the state
    shard key and Spark distributes/checkpoints it.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        if state.exists:
            old_n, old_total = state.get
            n += old_n
            total += old_total
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_events": [n], "total_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner equi-join with an event-time interval bound:
    right events within [left_ts, left_ts + within] of a matching key.

    Both sides are watermarked — with an interval condition Spark derives how
    long each side's rows must be buffered, so join state is bounded by
    (watermark + interval), not stream history. Inner joins emit matches as
    soon as both rows have arrived; the watermark only governs state cleanup.
    The key is the shuffle/state shard key at scale.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def stream_dedup(
    stream: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: first event per key wins; state for a key is
    dropped once the watermark passes it (dropDuplicatesWithinWatermark), so
    dedup state is bounded by the watermark horizon — the streaming twin of
    the batch exact_dedup operator."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def write_batch_idempotent(batch_df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent micro-batch landing: each batch overwrites its own
    ``batch_id=<id>`` partition directory. foreachBatch alone is only
    at-least-once — a crash after a blind append but before the checkpoint
    commit would replay the batch and duplicate its rows on restart; keying
    the write by batch_id makes the replay overwrite the same files instead,
    restoring an exactly-once EFFECT. Readers see ``batch_id`` as a normal
    partition column (and can prune on it)."""
    batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")


def run_foreach_batch_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> int:
    """Production sink path: land a stream into parquet via ``foreachBatch``
    — each micro-batch is written as a normal batch DataFrame (so any batch
    writer feature — partitionBy, bucketing, merge logic — is available).
    The streaming checkpoint gives at-least-once replay; combined with the
    per-batch_id idempotent write it is exactly-once in effect even across a
    crash inside the write/commit window. Runs with Trigger.AvailableNow
    (drain-what-exists) and returns the number of micro-batches written."""
    batches = {"n": 0}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(batch_df, path, batch_id)
        batches["n"] += 1

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Execute a streaming plan over all currently-available data
    (Trigger.AvailableNow) into an in-memory table and return it as a batch
    DataFrame — the test/backfill harness path."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
