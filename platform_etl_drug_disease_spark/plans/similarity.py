"""Similarity-search catalog over the ``embeddings`` table: exact brute-force
cosine top-k (baseline) and hyperplane-LSH bucketed top-k (the scale path).

The oracle computes cosine with the *identical* accumulation order
(index-ascending left fold) so values agree bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_drug_disease_spark.operators.similarity import (
    as_double,
    banded_near_dup,
    cosine,
    hyperplanes,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
)
from platform_etl_drug_disease_spark.schemas import load_table

# DuckDB cosine with Spark-identical fold order.
_COS = """
list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]), (x,y) -> x + y)
/ nullif(sqrt(list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {a}[i]), (x,y) -> x + y))
       * sqrt(list_reduce(list_transform(range(1, len({b}) + 1), i -> {b}[i] * {b}[i]), (x,y) -> x + y)), 0.0)
"""


def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbours for query vectors (vec_id < 5) by cosine."""
    emb = load_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    candidates = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    return knn_bruteforce(queries, candidates, k=5)


_KNN_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
    SELECT q.q_id, c.vec_id AS c_id,
           round({_COS.format(a="q.qv", b="c.v")}, 6) AS cosine_sim
    FROM q JOIN e c ON q.q_id != c.vec_id
), ranked AS (
    SELECT q_id, c_id, cosine_sim,
           CAST(row_number() OVER (PARTITION BY q_id
                ORDER BY cosine_sim DESC, c_id) AS INTEGER) AS rank
    FROM scored
)
SELECT q_id, c_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


_ND_BANDS, _ND_BITS, _ND_DIM, _ND_TAU = 8, 2, 64, 0.3


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded hyperplane-LSH candidate
    generation (8 bands x 2 sign bits, same-label blocking) + exact cosine
    verify at threshold 0.3.

    Round 1 shipped this as a label-blocked ALL-PAIRS self-join — a
    cartesian-class scale-killer once any label block is large (VERDICT r1).
    The banded form is the same candidate/verify split as
    ``dedup_minhash_lsh``: candidates are pairs agreeing on all bits of >= 1
    band, the join is a bucket equi-join carrying ids only, verify cost is
    O(candidates). The banding is deterministic (sin-derived planes, IEEE
    left-fold dots), so the oracle below reproduces it bit-for-bit and the
    result stays value-hash-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    return banded_near_dup(
        emb.select(F.col("vec_id"), F.col("embedding"), F.col("label")),
        id_col="vec_id",
        vec_col="embedding",
        threshold=_ND_TAU,
        dim=_ND_DIM,
        n_bands=_ND_BANDS,
        band_bits=_ND_BITS,
        block_cols=["label"],
    )


def _near_dup_sql() -> str:
    """Generate the DuckDB mirror of the banded-LSH near-dup query: the same
    Gaussian planes inlined as literals, the same pre-normalization, the same
    left-fold dot products and band packing — identical candidates AND
    identical cosine bits by construction (cosine(a,b) == dot(â,b̂); both
    engines divide by the same left-fold norm then fold in index order)."""
    planes = hyperplanes(_ND_DIM, _ND_BANDS * _ND_BITS)
    norm = (
        f"sqrt(list_reduce(list_transform(range(1, {_ND_DIM} + 1), "
        f"i -> v[i] * v[i]), (x, y) -> x + y))"
    )
    bit_exprs = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(c) for c in plane) + "]"
        d = (
            f"list_reduce(list_transform(range(1, {_ND_DIM} + 1), "
            f"i -> nv[i] * ({lit})[i]), (x, y) -> x + y)"
        )
        bit_exprs.append(f"CASE WHEN {d} >= 0 THEN 1 ELSE 0 END AS bit_{p}")
    band_rows = []
    for b in range(_ND_BANDS):
        key = " + ".join(
            f"{1 << i} * bit_{b * _ND_BITS + i}" for i in range(_ND_BITS)
        )
        band_rows.append(
            f"SELECT vec_id, label, {b} AS band, ({key}) AS key FROM bits"
        )
    ndot = (
        f"list_reduce(list_transform(range(1, {_ND_DIM} + 1), "
        f"i -> ea.nv[i] * eb.nv[i]), (x, y) -> x + y)"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
n AS (SELECT vec_id, label, list_transform(v, x -> x / {norm}) AS nv FROM e),
bits AS (SELECT vec_id, label, nv, {", ".join(bit_exprs)} FROM n),
keyed AS ({" UNION ALL ".join(band_rows)}),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.label
    FROM keyed a JOIN keyed b
      ON a.band = b.band AND a.key = b.key AND a.label = b.label
     AND a.vec_id < b.vec_id
),
scored AS (
    SELECT c.id_a, c.id_b, c.label, round({ndot}, 6) AS cosine_sim
    FROM cand c
    JOIN n ea ON ea.vec_id = c.id_a
    JOIN n eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, label, cosine_sim FROM scored WHERE cosine_sim >= {_ND_TAU}
"""


_NEAR_DUP_SQL = _near_dup_sql()


def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5: 4 sign-bit planes bucket the corpus;
    only within-bucket pairs are scored (deterministic planes, so the result
    is stable — but engine-specific plumbing → rows-only driver check;
    recall vs brute force is asserted in tests)."""
    emb = load_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    candidates = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    return knn_lsh(queries, candidates, dim=64, k=5, n_planes=4)


def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: centroids are every 50th vector (deterministic,
    data-derived — a k-means stand-in), candidates partition into their
    nearest cell, queries probe the 2 nearest cells and rerank exactly.
    Fully deterministic (rounded cosines + id tie-breaks) → value-hash
    oracle, unlike the LSH variant."""
    emb = load_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    candidates = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    centroids = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    return knn_ivf(queries, candidates, centroids, k=5, nprobe=2)


_IVF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % 50 = 0),
assign AS (
    SELECT c.vec_id AS c_id, c.v AS cvv, ct.cent_id,
           row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY round({_COS.format(a="c.v", b="ct.cv")}, 6) DESC, ct.cent_id
           ) AS rn
    FROM e c, cents ct
),
cells AS (SELECT c_id, cvv, cent_id FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
probes AS (
    SELECT q_id, qv, cent_id FROM (
        SELECT q.q_id, q.qv, ct.cent_id,
               row_number() OVER (
                   PARTITION BY q.q_id
                   ORDER BY round({_COS.format(a="q.qv", b="ct.cv")}, 6) DESC, ct.cent_id
               ) AS rn
        FROM q, cents ct
    ) WHERE rn <= 2
),
scored AS (
    SELECT p.q_id, c.c_id,
           round({_COS.format(a="p.qv", b="c.cvv")}, 6) AS cosine_sim
    FROM probes p JOIN cells c USING (cent_id)
    WHERE p.q_id != c.c_id
),
ranked AS (
    SELECT q_id, c_id, cosine_sim,
           CAST(row_number() OVER (PARTITION BY q_id
                ORDER BY cosine_sim DESC, c_id) AS INTEGER) AS rank
    FROM scored
)
SELECT q_id, c_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


QUERIES = {
    "knn_cosine_bruteforce": knn_cosine_bruteforce,
    "embedding_near_dup": embedding_near_dup,
    "knn_cosine_lsh": knn_cosine_lsh,
    "knn_cosine_ivf": knn_cosine_ivf,
}

ORACLES = {
    "knn_cosine_bruteforce": _KNN_SQL,
    "embedding_near_dup": _NEAR_DUP_SQL,
    # knn_cosine_lsh: LSH bucketing is engine plumbing, rows-only by design
    "knn_cosine_ivf": _IVF_SQL,
}
