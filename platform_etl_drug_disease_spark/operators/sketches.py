"""Count-min-sketch-pruned exact heavy hitters.

The frequent-items problem at corpus scale: find every key occurring at
least T times in a 100-TB stream whose key cardinality (n-grams, URLs,
hostnames) is far too large to exact-count wholesale — the full
``groupBy(key)`` shuffles one row per distinct key, and at shingle
cardinality that shuffle IS the job. The classic fix is a count-min sketch
(Cormode & Muthukrishnan 2005): d hash rows × w counters, updated
map-side, merged by addition — a few KB of state per executor regardless
of cardinality.

This module composes the sketch with the repo's candidate→verify pattern
so the final answer is EXACT (and therefore value-hash checkable against a
plain ``GROUP BY ... HAVING`` oracle):

1. sketch pass: each occurrence increments d counters; in Spark this is a
   ``groupBy(seed, bucket).count()`` whose map-side partial aggregation
   collapses every partition to ≤ d×w rows — the shuffle carries the
   sketch, never the keys.
2. prune pass: a key with true count ≥ T has ALL d of its counters ≥ T
   (counters only over-count), so occurrences whose d buckets are all
   heavy form a guaranteed superset of the heavy keys' occurrences. The
   heavy-cell sets are tiny (≤ d×w rows) and broadcast; the prune is d
   map-side semi-joins, no shuffle.
3. verify pass: exact ``groupBy(key)`` over the surviving occurrences
   only, then ``HAVING count ≥ T``. False positives (light keys colliding
   into heavy cells on every row) are recounted and dropped here; false
   negatives cannot exist.

Net shuffle: d×w sketch rows + the survivors — at a threshold worth the
name, orders of magnitude below the distinct-key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_heavy_hitters(
    occurrences: DataFrame,
    key_col: str,
    threshold: DataFrame,
    depth: int = 3,
    width: int = 8192,
) -> DataFrame:
    """Exact keys with count ≥ threshold, CMS-pruned as described above.

    ``occurrences`` is the raw stream (one row per occurrence);
    ``threshold`` is a one-row DataFrame with a bigint ``thr`` column so
    data-derived thresholds (e.g. a multiple of the mean frequency) stay
    inside the plan — it is broadcast wherever used. Returns
    ``(key_col, n_occurrences)``, exact.
    """
    occ = occurrences.select(F.col(key_col)).where(F.col(key_col).isNotNull())
    bucket_exprs = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)).cast("int")
        for i in range(depth)
    ]
    rows = occ.select(
        key_col, *[b.alias(f"_b{i}") for i, b in enumerate(bucket_exprs)]
    ).persist()

    sketch = (
        rows.select(
            F.posexplode(F.array(*[F.col(f"_b{i}") for i in range(depth)])).alias(
                "_seed", "_bucket"
            )
        )
        .groupBy("_seed", "_bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    heavy_cells = (
        sketch.crossJoin(F.broadcast(threshold))
        .where(F.col("_c") >= F.col("thr"))
        .select("_seed", "_bucket")
        .persist()
    )

    survivors = rows
    for i in range(depth):
        cells_i = heavy_cells.where(F.col("_seed") == i).select(
            F.col("_bucket").alias(f"_h{i}")
        )
        survivors = survivors.join(
            F.broadcast(cells_i),
            survivors[f"_b{i}"] == F.col(f"_h{i}"),
            "left_semi",
        )

    return (
        survivors.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(threshold))
        .where(F.col("n_occurrences") >= F.col("thr"))
        .select(key_col, "n_occurrences")
    )
