"""Query catalog + reference-parity pipeline plans.

Each catalog module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same parquet
tables). ``__spark_entry__.py`` merges them for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def merged_catalog() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge all catalog modules; late import so a broken module is obvious."""
    from platform_etl_drug_disease_spark.plans import (
        arrays_hof,
        dedup_text,
        events_time,
        graph,
        pipeline_catalog,
        relational,
        scalar_fns,
        similarity,
        streaming_media,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        relational,
        arrays_hof,
        scalar_fns,
        events_time,
        graph,
        dedup_text,
        similarity,
        streaming_media,
        pipeline_catalog,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
