"""Array / higher-order-function catalog (SURVEY.md F1-F10, F17-F19, U4-U7,
A4, P2, D1).

The reference's most distinctive surface: lambda-bearing SQL expressions
(``transform``/``filter``/``aggregate``/``zip_with``, sim.sc:82-87, 300-337),
array set algebra (sim.sc:149, 450, 457-505), nested struct rollups
(sim.sc:248-254), and the flatten+distinct that replaces its only UDF
(sim.sc:171-176). DuckDB mirrors with ``list_*`` lambdas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_drug_disease_spark.operators.arrays import flatten_distinct
from platform_etl_drug_disease_spark.plans._util import arr_join
from platform_etl_drug_disease_spark.schemas import load_table


def hof_acctbal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 transform + F5 filter + F6 aggregate over per-nation balance arrays:
    sort → scale by 1.1 → keep > 1500 → left-fold sum (deterministic order)."""
    cust = load_table(spark, sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    arrs = cust.groupBy("c_nationkey").agg(
        F.sort_array(F.collect_list("c_acctbal")).alias("xs")
    )
    scaled = F.transform(F.col("xs"), lambda x: x * F.lit(1.1))
    kept = F.filter(scaled, lambda x: x > F.lit(1500.0))
    folded = F.aggregate(kept, F.lit(0.0), lambda a, e: a + e)
    return arrs.select(
        "c_nationkey",
        F.size("xs").alias("n_customers"),
        F.size(kept).alias("n_kept"),
        F.round(folded, 4).alias("folded_total"),
    )


_HOF_SQL = """
WITH arrs AS (
    SELECT c_nationkey, list_sort(list(c_acctbal)) AS xs
    FROM customer GROUP BY c_nationkey
), shaped AS (
    SELECT c_nationkey, xs,
           list_filter(list_transform(xs, x -> x * 1.1), x -> x > 1500.0) AS kept
    FROM arrs
)
SELECT c_nationkey,
       CAST(len(xs) AS INTEGER) AS n_customers,
       CAST(len(kept) AS INTEGER) AS n_kept,
       CASE WHEN len(kept) = 0 THEN 0.0
            ELSE round(list_reduce(kept, (a, b) -> a + b), 4) END AS folded_total
FROM shaped
"""


def priority_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 array_intersect + U5 array_union + U6 array_except + U7
    array_distinct + F7 array_contains, against a literal priority set —
    the reference's repurposing-candidate algebra (sim.sc:457, 470, 503-505)."""
    orders = load_table(spark, sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    per_cust = orders.groupBy("o_custkey").agg(
        F.sort_array(F.collect_set("o_orderpriority")).alias("prios")
    )
    urgent = F.array(F.lit("1-URGENT"), F.lit("2-HIGH"))
    # array set algebra stays internal; outputs are driver-safe joined strings
    return per_cust.select(
        "o_custkey",
        arr_join(F.sort_array(F.array_intersect("prios", urgent))).alias("urgent_held"),
        arr_join(F.sort_array(F.array_except("prios", urgent))).alias("non_urgent"),
        arr_join(F.sort_array(F.array_union("prios", urgent))).alias("with_urgent"),
        F.array_contains("prios", "1-URGENT").alias("has_urgent"),
        F.size("prios").alias("n_prios"),
    )


_SET_ALGEBRA_SQL = """
WITH per_cust AS (
    SELECT o_custkey, list_sort(array_agg(DISTINCT o_orderpriority)) AS prios
    FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       COALESCE(array_to_string(list_sort(list_filter(prios, x -> list_contains(['1-URGENT','2-HIGH'], x))), ','), '') AS urgent_held,
       COALESCE(array_to_string(list_sort(list_filter(prios, x -> NOT list_contains(['1-URGENT','2-HIGH'], x))), ','), '') AS non_urgent,
       array_to_string(list_sort(list_distinct(list_concat(prios, ['1-URGENT','2-HIGH']))), ',') AS with_urgent,
       list_contains(prios, '1-URGENT') AS has_urgent,
       CAST(len(prios) AS INTEGER) AS n_prios
FROM per_cust
"""


def region_segment_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 flatten + D1 flatten_distinct over genuinely nested
    array<array<string>>: per region, the distinct market segments across its
    nations — the reference's path_codes → ancestors derivation
    (sim.sc:171-176)."""
    cust = load_table(spark, sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    nation = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    per_nation = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(F.sort_array(F.collect_set("c_mktsegment")).alias("segs"))
    )
    nested = per_nation.groupBy("n_regionkey").agg(
        F.collect_list("segs").alias("nested_segs")
    )
    return nested.select(
        "n_regionkey",
        arr_join(F.sort_array(flatten_distinct("nested_segs"))).alias("region_segments"),
        F.size(F.flatten("nested_segs")).alias("n_total"),
    )


_FLATTEN_SQL = """
WITH per_nation AS (
    SELECT n_regionkey, n_nationkey,
           list_sort(array_agg(DISTINCT c_mktsegment)) AS segs
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey, n_nationkey
), nested AS (
    SELECT n_regionkey, list(segs) AS nested_segs
    FROM per_nation GROUP BY n_regionkey
)
SELECT n_regionkey,
       array_to_string(list_sort(list_distinct(flatten(nested_segs))), ',') AS region_segments,
       CAST(len(flatten(nested_segs)) AS INTEGER) AS n_total
FROM nested
"""


def nested_struct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 collect_list(struct(...)) + P2 field-extraction-on-array-of-struct:
    the reference nests AE records per drug (sim.sc:248-254) then pulls a
    field across the array (``drugs_for_target.drug_id`` → array, sim.sc:457).
    Struct array sorted by first field → field extraction gives key-ordered
    parallel arrays."""
    cust = load_table(spark, sf_dir, "customer", ["c_nationkey", "c_custkey", "c_acctbal"])
    rolled = cust.groupBy("c_nationkey").agg(
        F.sort_array(F.collect_list(F.struct("c_custkey", "c_acctbal"))).alias("members")
    )
    return rolled.select(
        "c_nationkey",
        arr_join(F.col("members.c_custkey"), "string").alias("member_keys"),
        arr_join(F.col("members.c_acctbal"), "decimal(18,2)").alias("member_balances"),
        F.size("members").alias("n_members"),
    )


_STRUCT_ROLLUP_SQL = """
SELECT c_nationkey,
       array_to_string(list_transform(array_agg(c_custkey ORDER BY c_custkey),
                                      x -> CAST(x AS VARCHAR)), ',') AS member_keys,
       array_to_string(list_transform(array_agg(c_acctbal ORDER BY c_custkey),
                                      x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), ',') AS member_balances,
       CAST(COUNT(*) AS INTEGER) AS n_members
FROM customer
GROUP BY c_nationkey
"""


def explode_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 explode + posexplode round-trip: split part names into word rows
    with positions, filter, re-assemble ordered arrays — the
    explode→shape→regroup pattern at the center of the reference's evidence
    propagation (sim.sc:446-464)."""
    part = load_table(spark, sf_dir, "part", ["p_partkey", "p_name"])
    words = part.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    ).where(F.length("word") > 3)
    return words.groupBy("p_partkey").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "word"))
        ).alias("tmp")
    ).select(
        "p_partkey",
        arr_join(F.col("tmp.word")).alias("long_words"),
        F.size("tmp").alias("n_long_words"),
    )


_EXPLODE_SQL = """
WITH words AS (
    SELECT p_partkey, u.word, u.pos
    FROM part,
         LATERAL (SELECT unnest(string_split(p_name, ' ')) AS word,
                         generate_subscripts(string_split(p_name, ' '), 1) AS pos) u
    WHERE length(u.word) > 3
)
SELECT p_partkey,
       array_to_string(array_agg(word ORDER BY pos), ',') AS long_words,
       CAST(COUNT(*) AS INTEGER) AS n_long_words
FROM words
GROUP BY p_partkey
"""


QUERIES = {
    "hof_acctbal_pipeline": hof_acctbal_pipeline,
    "priority_set_algebra": priority_set_algebra,
    "region_segment_flatten": region_segment_flatten,
    "nested_struct_rollup": nested_struct_rollup,
    "explode_reassemble": explode_reassemble,
}

ORACLES = {
    "hof_acctbal_pipeline": _HOF_SQL,
    "priority_set_algebra": _SET_ALGEBRA_SQL,
    "region_segment_flatten": _FLATTEN_SQL,
    "nested_struct_rollup": _STRUCT_ROLLUP_SQL,
    "explode_reassemble": _EXPLODE_SQL,
}
