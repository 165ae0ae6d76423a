"""Vector-similarity operators over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (cross-join against a small,
broadcast query set); the scale path is LSH bucketing with deterministic
hyperplanes (sign-bit bucketing → candidate rerank), which turns the n×m
cross-join into a bucket-equi-join. All vector math runs in Spark's
higher-order array functions — JVM-side, no Python in the row loop.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — deterministic accumulation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, e: acc + e
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def knn_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set across the
    candidate corpus, rank per query with a deterministic tie-break.
    Returns (q_id, c_id, cosine_sim, rank)."""
    from pyspark.sql import Window

    pairs = candidates.crossJoin(F.broadcast(queries)).where(
        F.col(q_id) != F.col(c_id)
    )
    scored = pairs.select(
        q_id,
        c_id,
        F.round(cosine(as_double(q_vec), as_double(c_vec)), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine_sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int = 8) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG state: components are
    ``sin(p*dim + d)``-derived, identical on every engine/run)."""
    return [
        [math.sin(p * dim + d + 1.0) for d in range(dim)] for p in range(n_planes)
    ]


def lsh_sign_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(c) for c in plane])
        bit = F.when(dot(vec, p) >= 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bucket + bit
    return bucket


def knn_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Approximate top-k: bucket both sides by hyperplane sign bits, compare
    only within-bucket, rerank exactly. Recall < 1 by construction; the
    bucket-equi-join replaces the cross-join shuffle at scale."""
    from pyspark.sql import Window

    planes = hyperplanes(dim, n_planes)
    qb = queries.withColumn("__bucket", lsh_sign_bucket(as_double(q_vec), planes))
    cb = candidates.withColumn("__bucket", lsh_sign_bucket(as_double(c_vec), planes))
    pairs = qb.join(cb, "__bucket").where(F.col(q_id) != F.col(c_id))
    scored = pairs.select(
        q_id,
        c_id,
        F.round(cosine(as_double(q_vec), as_double(c_vec)), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine_sim").desc(), F.col(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
