"""Grouped-map Pandas operators (``applyInPandas``) — the Arrow batch path
for per-group logic the built-in aggregates can't express (SURVEY.md §2.9 D2:
"pandas_udf only for genuinely non-expressible aggregates").

This completes the engine's Python-interop surface alongside
``mapInPandas`` (operators/multimodal.py) and ``applyInPandasWithState``
(streaming/windows.py). The demonstration op is a per-group z-score whose
arithmetic is formulated over exact scaled integers,

    z = (n·x − S) / sqrt(n·Σx² − S²)        (population z-score)

so the Python side is bit-reproducible and matches a SQL oracle running the
identical integer formulation — the grouped-map path stays inside the
differential-correctness gate instead of being excused from it.
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_zscore(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    out: str = "zscore",
    scale: int = 6,
    ndigits: int = 4,
) -> DataFrame:
    """Per-group population z-score of ``value_col`` via applyInPandas.

    Values are decimal-scaled to exact ints before any arithmetic: sums and
    the variance numerator ``n·Σx² − S²`` are exact (Python bigints), with a
    single float conversion, sqrt, and division at the end — deterministic
    under any row order or partitioning, hence cross-engine comparable.
    Degenerate groups (zero variance) get z = 0.0.

    Scale note: one shuffle on ``group_cols``; per-group state is the group's
    Arrow batch, so this assumes bounded group sizes (use the window/agg form
    for skewed hot keys).
    """
    import pandas as pd  # noqa: F401 (Arrow path dependency, baked in)

    dec = df.select(
        *group_cols, id_col, F.col(value_col).cast(f"decimal(18,{scale})").alias("__v")
    )
    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(
            group_cols + [id_col, out],
            [dict(dec.dtypes)[c] for c in group_cols]
            + [dict(dec.dtypes)[id_col], "double"],
        )]
    )

    def fn(pdf):
        ints = [int(Decimal(v).scaleb(scale)) for v in pdf["__v"]]
        n = len(ints)
        s = sum(ints)
        s2 = sum(x * x for x in ints)
        var_num = n * s2 - s * s
        if var_num <= 0:
            zs = [0.0] * n
        else:
            den = math.sqrt(float(var_num))
            zs = [round(float(n * x - s) / den, ndigits) for x in ints]
        res = pdf[group_cols + [id_col]].copy()
        res[out] = zs
        return res

    return dec.groupBy(*group_cols).applyInPandas(fn, schema=out_schema)
