"""Sink round-trip catalog query (SURVEY.md §2.1 S5/S6 under the oracle gate).

The reference's two terminal actions are ``associations.write.parquet``
(sim.sc:476) and ``drugDisease.write.json`` (sim.sc:511). The writers are
unit-tested in tests/test_sources.py; this query puts the write path under
the driver's value-hash oracle: aggregate → write parquet AND newline-JSON →
read both back (JSON with an explicit schema, never inferred) → union with a
sink tag. The oracle computes the same aggregate twice directly — so a green
row proves the write→read round trip is value-exact for both formats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_drug_disease_spark.plans._util import dsum
from platform_etl_drug_disease_spark.schemas import load_table
from platform_etl_drug_disease_spark.sources.readers import read_json, read_parquet
from platform_etl_drug_disease_spark.sources.writers import write_json, write_parquet

_ROUNDTRIP_SCHEMA = "o_orderstatus string, n_orders bigint, total_price double"


def sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+S6: write an aggregate to parquet and JSON, read both back, tag and
    union. Deterministic scratch path per sf; overwrite mode keeps the query
    idempotent across driver re-runs. Doubles survive the JSON hop exactly:
    Spark writes shortest-round-trip representations."""
    agg = (
        load_table(spark, sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )
    base = os.path.join(
        "/tmp/spark_graft_sinks", os.path.basename(os.path.normpath(sf_dir))
    )
    pq_path, js_path = os.path.join(base, "agg_parquet"), os.path.join(base, "agg_json")
    write_parquet(agg, pq_path, mode="overwrite", target_partitions=1)
    write_json(agg, js_path, mode="overwrite", target_partitions=1)
    pq = read_parquet(spark, pq_path, _ROUNDTRIP_SCHEMA)
    js = read_json(spark, js_path, _ROUNDTRIP_SCHEMA)
    return pq.withColumn("sink", F.lit("parquet")).unionByName(
        js.withColumn("sink", F.lit("json"))
    )


_ROUNDTRIP_SQL = """
WITH agg AS (
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_orders, total_price, 'parquet' AS sink FROM agg
UNION ALL
SELECT o_orderstatus, n_orders, total_price, 'json' AS sink FROM agg
"""


QUERIES = {"sink_roundtrip": sink_roundtrip}
ORACLES = {"sink_roundtrip": _ROUNDTRIP_SQL}
