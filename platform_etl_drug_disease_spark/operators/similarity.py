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
    """Deterministic pseudo-random Gaussian hyperplanes. Seeded Mersenne
    Twister per plane — platform-stable, so every engine/run sees identical
    constants (they ship into query plans as literals; nothing about the RNG
    needs to be SQL-expressible). Gaussian components give near-independent
    sign bits, unlike smooth sin-derived planes whose correlated bits cost
    LSH recall."""
    import random

    planes = []
    for p in range(n_planes):
        rng = random.Random(1_000_003 * (p + 1))
        planes.append([rng.gauss(0.0, 1.0) for _ in range(dim)])
    return planes


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


def band_keys(
    vec: Column, planes: list[list[float]], n_bands: int, band_bits: int
) -> Column:
    """Banded sign-LSH keys: one packed integer per band of ``band_bits``
    sign bits (MinHash-band-style OR-amplification for cosine). Returns an
    ``array<struct<band:int, key:int>>`` ready to explode into a bucket
    equi-join. Deterministic: plane dot products are IEEE left folds,
    identical across engines, so the keys are SQL-reproducible."""
    assert len(planes) == n_bands * band_bits
    bits = [
        F.when(dot(vec, F.array(*[F.lit(c) for c in p])) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        for p in planes
    ]
    keys = []
    for b in range(n_bands):
        k = F.lit(0)
        for i in range(band_bits):
            k = k + bits[b * band_bits + i] * F.lit(1 << i)
        keys.append(
            F.struct(F.lit(b).cast("int").alias("band"), k.cast("int").alias("key"))
        )
    return F.array(*keys)


def banded_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    n_bands: int = 8,
    band_bits: int = 2,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane-LSH blocking + exact
    cosine verify — the scale shape that replaces a block-wide all-pairs
    self-join (a cartesian-class scale-killer on any large block; the same
    candidate-generation/verify split as MinHash-LSH text dedup).

    Pair semantics: two rows are candidates iff they agree on ALL bits of at
    least ONE band (and match ``block_cols``); candidates are deduplicated
    and then exactly verified (cosine >= threshold). Per-pair match
    probability is ``1-(1-p^band_bits)^n_bands`` with ``p = 1 - angle/pi`` —
    tune bands/bits to the operating threshold (near-dup at tau >= 0.9 wants
    wider bands, e.g. 8-16 bits, where blocking prunes exponentially).

    Plan shape: band keys are computed map-side (JVM fold, no Python), the
    candidate join is a shuffle equi-join on (band, key, block_cols) carrying
    only ids, and vectors are re-fetched for the O(candidates) verify —
    vectors never ride the candidate shuffle.
    """
    block_cols = block_cols or []
    planes = hyperplanes(dim, n_bands * band_bits)
    # persist the pruned projection with PRE-NORMALIZED vectors: it fans out
    # 4 ways (both sides of the candidate join + both vector lookups of the
    # verify), and normalizing once at cache-fill time means the per-pair
    # verify needs a single dot fold instead of dot + two norms — the HOF
    # folds are interpreted (no codegen), so this cuts the verify hot loop
    # to a third. cosine(a, b) == dot(â, b̂).
    v = as_double(vec_col)
    normalized = F.transform(v, lambda x: x / F.sqrt(dot(v, v)))
    src = df.select(
        F.col(id_col), *[F.col(c) for c in block_cols], normalized.alias("__nv")
    ).persist()
    keyed = src.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.explode(band_keys(F.col("__nv"), planes, n_bands, band_bits)).alias(
            "__bk"
        ),
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"), *[F.col(c) for c in block_cols], "__bk"
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"__b_{c}") for c in block_cols],
        F.col("__bk").alias("__bk_b"),
    )
    cond = [a["__bk"] == b["__bk_b"]] + [
        a[c] == b[f"__b_{c}"] for c in block_cols
    ]
    candidates = (
        a.join(b, cond)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *block_cols)
        .distinct()
    )
    va = src.select(F.col(id_col).alias("id_a"), F.col("__nv").alias("__va"))
    vb = src.select(F.col(id_col).alias("id_b"), F.col("__nv").alias("__vb"))
    verified = (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            *block_cols,
            F.round(dot(F.col("__va"), F.col("__vb")), 6).alias("cosine_sim"),
        )
    )
    return verified.where(F.col("cosine_sim") >= threshold)


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


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """Assign each vector to its single nearest centroid (max cosine,
    centroid-id tie-break) — the IVF partitioning step.

    The centroid set is tiny by construction, so the scoring join is a
    broadcast cross-join: each input row is scored against every centroid
    map-side, no shuffle of the corpus. Cosines are rounded to 6 before
    ranking so the argmax is reproducible across engines.
    """
    from pyspark.sql import Window

    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "__cos", F.round(cosine(as_double(vec_col), as_double(cent_vec)), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__cos").desc(), F.col(cent_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__cos", cent_vec)
    )


def knn_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """IVF approximate top-k: candidates are partitioned into centroid cells
    once; each query probes only its ``nprobe`` nearest cells and reranks
    exactly within them.

    At 100 TB this is the index-build/serve split: the cell assignment is the
    (reusable, persistable) index keyed by cent_id, and serving is an
    equi-join on cent_id — query cost scales with probed-cell sizes, never
    the corpus. Each candidate lives in exactly one cell, so no pair dedup
    is needed. Returns (q_id, c_id, cosine_sim, rank).
    """
    from pyspark.sql import Window

    # the centroid set is tiny and consumed twice (cell assignment + query
    # probing) — persist so the source isn't re-scanned per consumer.
    centroids = centroids.persist()
    cells = ivf_assign(candidates, c_id, c_vec, centroids)
    qscored = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "__cos", F.round(cosine(as_double(q_vec), as_double("cent_vec")), 6)
    )
    wq = Window.partitionBy(q_id).orderBy(F.col("__cos").desc(), F.col("cent_id"))
    probes = (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= nprobe)
        .select(q_id, q_vec, "cent_id")
    )
    pairs = probes.join(cells, "cent_id").where(F.col(q_id) != F.col(c_id))
    scored = pairs.select(
        q_id,
        c_id,
        F.round(cosine(as_double(q_vec), as_double(c_vec)), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine_sim").desc(), F.col(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
