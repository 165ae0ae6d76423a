"""Projection / rename / computed-column operators (SURVEY.md P1-P5, P2).

The reference shapes every source with ``selectExpr`` rename lists right after
the read (e.g. sim.sc:16-18, 94-102, 191-203) and pulls nested struct fields to
the top level (``disease.id`` sim.sc:225-228, ``indications.efo_id`` →
array-of-field sim.sc:100). These helpers keep that idiom declarative so
Catalyst prunes columns all the way into the scan.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, columns: Mapping[str, str | Column]) -> DataFrame:
    """P1: projection with rename. ``columns`` maps output name -> source
    expression (SQL string or Column). Equivalent of ``selectExpr("a as b")``.
    """
    cols = []
    for out_name, src in columns.items():
        c = F.expr(src) if isinstance(src, str) else src
        cols.append(c.alias(out_name))
    return df.select(*cols)


def flatten_struct(df: DataFrame, struct_col: str, fields: list[str]) -> DataFrame:
    """P2: lift ``struct_col.field`` to top-level columns named ``field``
    (sim.sc:225-228 pulls disease.id / target.id / scores.association_score)."""
    keep = [c for c in df.columns if c != struct_col]
    lifted = [F.col(f"{struct_col}.{f}").alias(f.split(".")[-1]) for f in fields]
    return df.select(*keep, *lifted)


def with_columns(df: DataFrame, columns: Mapping[str, str | Column]) -> DataFrame:
    """P3: add computed columns (``withColumn`` chains, e.g. sim.sc:212-218)."""
    exprs = {
        name: (F.expr(src) if isinstance(src, str) else src)
        for name, src in columns.items()
    }
    return df.withColumns(exprs)


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P4: bulk ``withColumnRenamed`` (sim.sc:31-33, 140-141, ...)."""
    return df.withColumnsRenamed(dict(mapping))


def drop(df: DataFrame, *cols: str) -> DataFrame:
    """P5: drop columns (sim.sc:26, 34, 40, ...)."""
    return df.drop(*cols)
