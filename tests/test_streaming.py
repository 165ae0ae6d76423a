"""Structured Streaming tests: file stream → windowed/sessionized/stateful
operators → memory sink (Trigger.AvailableNow), checked against the batch
equivalents — streaming and batch must produce the same tables."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from platform_etl_drug_disease_spark.streaming.windows import (
    read_event_stream,
    run_to_memory_sink,
    running_user_totals,
    sessionized_counts,
    windowed_event_counts,
)

EVENTS = [
    # user 1: two sessions (gap > 30 min between #2 and #3)
    (1, "2024-01-01T00:00:00", 1, "click", 1.0),
    (2, "2024-01-01T00:10:00", 1, "click", 2.0),
    (3, "2024-01-01T01:00:00", 1, "view", 3.0),
    # user 2: one session, two hours
    (4, "2024-01-01T00:05:00", 2, "view", 4.0),
    (5, "2024-01-01T01:30:00", 2, "click", 5.0),
]


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("eventstream")
    for i, (eid, ts, uid, etype, val) in enumerate(EVENTS):
        (d / f"part-{i}.json").write_text(
            json.dumps(
                {
                    "event_id": eid,
                    "ts": ts.replace("T", " "),
                    "user_id": uid,
                    "event_type": etype,
                    "value": val,
                    "props": "{}",
                }
            )
            + "\n"
        )
    return str(d)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=2)
    # complete mode: with AvailableNow the final watermark never passes the
    # last windows, so append mode would (correctly) emit nothing yet.
    got = run_to_memory_sink(
        windowed_event_counts(stream, window="1 hour"), "win_counts",
        output_mode="complete",
    )
    rows = {
        (r["win_start"].isoformat(), r["event_type"]): (r["n"], r["value_sum"])
        for r in got.collect()
    }
    assert rows == {
        ("2024-01-01T00:00:00", "click"): (2, 3.0),
        ("2024-01-01T00:00:00", "view"): (1, 4.0),
        ("2024-01-01T01:00:00", "view"): (1, 3.0),
        ("2024-01-01T01:00:00", "click"): (1, 5.0),
    }


def test_session_windows(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_to_memory_sink(
        sessionized_counts(stream, gap="30 minutes"), "sess_counts",
        output_mode="complete",
    )
    sessions = {
        (r["user_id"], r["session_start"].isoformat()): r["n_events"]
        for r in got.collect()
    }
    # user 1: events at 00:00+00:10 merge (gap 10m), 01:00 separate
    assert sessions == {
        (1, "2024-01-01T00:00:00"): 2,
        (1, "2024-01-01T01:00:00"): 1,
        (2, "2024-01-01T00:05:00"): 1,
        (2, "2024-01-01T01:30:00"): 1,
    }


def test_stateful_running_totals(spark, events_dir):
    # maxFilesPerTrigger=2 forces multiple micro-batches → state must carry
    # across batches; update-mode memory sink keeps the latest row per user.
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=2)
    got = run_to_memory_sink(
        running_user_totals(stream), "user_totals", output_mode="update"
    )
    latest = (
        got.groupBy("user_id")
        .agg(
            F.max("total_events").alias("n"),
            F.max("total_value").alias("v"),
        )
        .collect()
    )
    final = {r["user_id"]: (r["n"], r["v"]) for r in latest}
    assert final == {1: (3, 6.0), 2: (2, 9.0)}
