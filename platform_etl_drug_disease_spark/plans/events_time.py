"""Event-time catalog: JSON prop extraction (F21), time windows (F20),
sessionization (W1 composition) over the ``events`` table.

The reference has no timestamp pipeline (SURVEY.md §2.8) — these are the
library-completeness operators its engine scope requires, batch-first; the
streaming/ package carries the readStream variants of the same logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from platform_etl_drug_disease_spark.plans._util import dsum
from platform_etl_drug_disease_spark.schemas import load_table


def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21: get_json_object extraction + aggregation; missing-key → null."""
    ev = load_table(spark, sf_dir, "events", ["event_type", "props"])
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            F.get_json_object("props", "$.missing").alias("missing"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_total"),
            F.max("k").alias("k_max"),
            F.count("missing").alias("n_missing"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_JSON_SQL = """
SELECT event_type,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_total,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       COUNT(json_extract_string(props, '$.missing')) AS n_missing,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


def hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 tumbling window: ``F.window(ts, '1 hour')`` — the batch form of the
    streaming windowed aggregation. Window start surfaced as a string so the
    cross-engine comparison is timezone-unambiguous."""
    ev = load_table(spark, sf_dir, "events", ["ts", "event_type", "value"])
    w = ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("value_sum"),
    )
    return w.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n",
        "value_sum",
    )


_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
"""


def sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 sliding window: 2-hour window sliding 1 hour — each event lands in
    two windows. Oracle expands the slide with a generate_series lateral."""
    ev = load_table(spark, sf_dir, "events", ["ts", "value"])
    w = ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("value_sum"),
    )
    return w.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "n",
        "value_sum",
    )


_SLIDING_SQL = """
WITH expanded AS (
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, value
    FROM events,
         LATERAL (SELECT unnest([date_trunc('hour', ts),
                                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start)
)
SELECT win_start, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
FROM expanded
GROUP BY win_start
"""


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap threshold (30 min): the W1 composition the
    engine uses instead of stateful streaming for batch session analytics."""
    ev = load_table(spark, sf_dir, "events", ["user_id", "ts"])
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    marked = ev.withColumn(
        "is_start", F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
    )
    return marked.groupBy("user_id").agg(
        F.sum("is_start").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


_SESSIONS_SQL = """
WITH gaps AS (
    SELECT user_id,
           epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
    FROM events
)
SELECT user_id,
       SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS n_sessions,
       COUNT(*) AS n_events
FROM gaps
GROUP BY user_id
"""


def daily_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 pivot on the event stream: per-day wide count matrix by type."""
    ev = load_table(spark, sf_dir, "events", ["ts", "event_type"])
    day = ev.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
    types = ["click", "view", "purchase", "signup", "error"]
    out = day.groupBy("day").pivot("event_type", types).agg(F.count(F.lit(1)))
    out = out.na.fill(0, subset=types)
    for t in types:
        out = out.withColumnRenamed(t, f"n_{t}")
    return out


_DAILY_PIVOT_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS n_click,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'view'), 0) AS n_view,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS n_purchase,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'signup'), 0) AS n_signup,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'error'), 0) AS n_error
FROM events
GROUP BY 1
"""


QUERIES = {
    "json_props_rollup": json_props_rollup,
    "hourly_windows": hourly_windows,
    "sliding_windows": sliding_windows,
    "user_sessions": user_sessions,
    "daily_event_type_pivot": daily_event_type_pivot,
}

ORACLES = {
    "json_props_rollup": _JSON_SQL,
    "hourly_windows": _HOURLY_SQL,
    "sliding_windows": _SLIDING_SQL,
    "user_sessions": _SESSIONS_SQL,
    "daily_event_type_pivot": _DAILY_PIVOT_SQL,
}
