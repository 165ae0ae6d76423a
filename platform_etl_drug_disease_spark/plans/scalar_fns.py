"""Scalar-function catalog: string shaping, hash-id synthesis, casts,
arithmetic blends (SURVEY.md F11-F16, P3).

Mirrors the reference's id-synthesis idioms on TPC-H-shaped data:
``concat_ws('_', chrom, string(pos), ref, alt)`` (sim.sc:200) and
``sha1(concat(...))`` stable evidence ids (sim.sc:218 — here sha2-256, the
modern default, DuckDB-portable), plus the weighted score blends of
sim.sc:502-508.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_drug_disease_spark.schemas import load_table


def part_id_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 substring_index + F12 concat_ws + F13 hash id + F14 cast."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat_ws("_", F.col("p_brand"), F.col("p_size").cast("string")).alias("part_code"),
        F.substring_index(F.col("p_type"), " ", -1).alias("type_tail"),
        F.substring_index(F.col("p_type"), " ", 1).alias("type_head"),
        F.sha2(F.concat_ws("|", F.col("p_name"), F.col("p_brand"), F.col("p_size").cast("string")), 256).alias("stable_id"),
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.length(F.col("p_name")).alias("name_len"),
    )


_PART_ID_SQL = """
SELECT p_partkey,
       concat_ws('_', p_brand, CAST(p_size AS VARCHAR)) AS part_code,
       split_part(p_type, ' ', -1) AS type_tail,
       split_part(p_type, ' ', 1) AS type_head,
       sha256(concat_ws('|', p_name, p_brand, CAST(p_size AS VARCHAR))) AS stable_id,
       upper(p_brand) AS brand_upper,
       CAST(length(p_name) AS INTEGER) AS name_len
FROM part
"""


def supplier_score_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 arithmetic: the reference's weighted blend ``0.4*x + 0.6*y`` and
    null-guarded ratio ``1.0 - a/b`` (sim.sc:502-508), row-level."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    j = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    acct_ratio = F.lit(1.0) - F.col("s_acctbal") / F.nullif(
        F.col("s_acctbal") + F.lit(1000.0), F.lit(0.0)
    )
    return j.select(
        "s_suppkey",
        "n_name",
        F.round(F.lit(0.4) * F.col("s_acctbal") + F.lit(0.6) * F.col("s_nationkey"), 6).alias("blend"),
        F.round(acct_ratio, 6).alias("acct_ratio"),
        F.round(F.pow(F.col("s_nationkey").cast("double"), 2.0), 6).alias("nation_sq"),
    )


_SUPPLIER_BLEND_SQL = """
SELECT s_suppkey, n_name,
       round(0.4 * s_acctbal + 0.6 * s_nationkey, 6) AS blend,
       round(1.0 - s_acctbal / nullif(s_acctbal + 1000.0, 0.0), 6) AS acct_ratio,
       round(pow(CAST(s_nationkey AS DOUBLE), 2.0), 6) AS nation_sq
FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


def order_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN classification + F15 lit tagging (sim.sc:213 datasource tag)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 400000, F.lit("jumbo"))
        .when(F.col("o_totalprice") >= 200000, F.lit("large"))
        .otherwise(F.lit("regular"))
    )
    return (
        orders.withColumn("bucket", bucket)
        .withColumn("datasource", F.lit("orders"))
        .groupBy("bucket", "datasource")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


_CASE_SQL = """
SELECT CASE WHEN o_totalprice >= 400000 THEN 'jumbo'
            WHEN o_totalprice >= 200000 THEN 'large'
            ELSE 'regular' END AS bucket,
       'orders' AS datasource,
       COUNT(*) AS n,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY 1, 2
"""


QUERIES = {
    "part_id_synthesis": part_id_synthesis,
    "supplier_score_blend": supplier_score_blend,
    "order_case_buckets": order_case_buckets,
}

ORACLES = {
    "part_id_synthesis": _PART_ID_SQL,
    "supplier_score_blend": _SUPPLIER_BLEND_SQL,
    "order_case_buckets": _CASE_SQL,
}
