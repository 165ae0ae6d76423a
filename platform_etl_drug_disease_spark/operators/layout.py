"""Multi-dimensional data layout: Z-order (Morton) interleaving and the
clustered parquet writer built on it.

Why this exists at 100 TB: partition pruning handles ONE dimension (the
directory key); every other predicate relies on parquet row-group/file
min-max statistics. A sort on ``(x, y)`` gives perfect stats on ``x`` and
useless ones on ``y``; interleaving the bits of both keys into a single
Morton code and range-partitioning + sorting on it keeps BOTH columns'
per-file ranges narrow, so a scan with a filter on either dimension skips
most files. This is the same layout trick Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY`` — here expressed as plain Spark expressions plus
``repartitionByRange``/``sortWithinPartitions``, nothing engine-specific.

Everything is integer bit arithmetic in JVM-codegen'd expressions
(``shiftright``/``&``/``*``/``+``) — exactly reproducible in any engine,
which is what makes the locality statistics oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column | str, y: Column | str, bits: int = 8) -> Column:
    """Morton code of two non-negative ints confined to ``bits`` bits each:
    bit i of x lands at position 2i, bit i of y at 2i+1.

    Unrolled into 2·bits codegen'd terms (shift/mask/add) — constant-folded
    per row, no loops, no UDF. Inputs are masked to ``bits`` bits so callers
    can pass raw keys; map keys onto the low bits yourself (e.g. ``% 256``)
    if their distribution lives in the high bits."""
    cx = (F.col(x) if isinstance(x, str) else x).cast("long")
    cy = (F.col(y) if isinstance(y, str) else y).cast("long")
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftright(cx, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright(cy, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return z


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical Morton expression in portable SQL (DuckDB oracle form):
    same shift/mask/multiply terms in the same order as :func:`zvalue`."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Morton code
    of ``(x, y)``: range-partition on the z-value (contiguous curve segments
    per file), sort within each file (monotone row-group stats), drop the
    helper column before writing.

    ``repartitionByRange`` samples the z-distribution so files are
    volume-balanced even when the key space is skewed — the property a
    static ``z >> k`` bucketing wouldn't have. Per-file min-max footers then
    bound both x and y tightly; asserted against pyarrow-read footers in
    tests/test_lakehouse.py."""
    zc = "_zval"
    (
        df.withColumn(zc, zvalue(x, y, bits))
        .repartitionByRange(n_files, F.col(zc))
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode("overwrite")
        .parquet(path)
    )
