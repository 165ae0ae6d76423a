"""Join operators (SURVEY.md J1-J7).

The reference runs ~20 equi-joins (inner/left/right; expression-keyed and
USING-keyed) and leans on Catalyst for strategy. This module adds the
100-TB-aware controls the reference lacks: explicit broadcast hints for
dimension joins (sim.sc relies on the 10 MB auto-threshold), semi/anti forms
for membership filtering (the reference emulates a semijoin with an inner join
at sim.sc:451), and salted joins for skewed keys (hub proteins in the
interaction network are power-law — a salted broadcast-free fallback matters
at scale; AQE skew-join handles the sort-merge path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_on(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1/J2/J3/J4: equi-join; USING-form (list of names, dedups the key) or
    expression-form (different column names, sim.sc:30). ``broadcast_right``
    applies the J7 dimension pattern (sim.sc caches dims at 28/62/446/497 —
    here we additionally hint the broadcast so the plan never sort-merges a
    small dim at scale)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """J6: membership filter keeping only left columns — the idiomatic form of
    the reference's whitelist inner-join filter (sim.sc:451)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """Complement of J6 (not in the reference; required library surface)."""
    return left.join(right, on=on, how="left_anti")


def annotate_edges(
    edges: DataFrame,
    dim: DataFrame,
    edge_keys: tuple[str, str],
    dim_key: str,
    payload: dict[str, str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """J5: the double-join edge-annotation idiom (sim.sc:30-40 and 64-70) —
    join a dimension once per edge endpoint, renaming the payload per side.

    ``payload`` maps dim column -> output suffix-less name; each output gets
    ``_src``/``_dst`` suffixes. The dim is broadcast by default: in the
    reference it is a gene lookup, small enough that repeating it per endpoint
    must never shuffle the (huge) edge table twice.
    """
    src_key, dst_key = edge_keys
    d = F.broadcast(dim) if broadcast_dim else dim

    src_dim = d.select(
        F.col(dim_key).alias("__k"),
        *[F.col(c).alias(f"{out}_src") for c, out in payload.items()],
    )
    dst_dim = d.select(
        F.col(dim_key).alias("__k"),
        *[F.col(c).alias(f"{out}_dst") for c, out in payload.items()],
    )
    out = (
        edges.join(src_dim, edges[src_key] == src_dim["__k"], "inner")
        .drop("__k")
        .join(dst_dim, edges[dst_key] == dst_dim["__k"], "inner")
        .drop("__k")
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (skewed) left key into
    ``salt_buckets`` sub-keys and explode the right side across all buckets.

    Use when one side has power-law key frequencies (hub nodes) and the right
    side is too big to broadcast but small enough to replicate ×buckets.
    With AQE skew-join on, prefer the plain join first; this is the manual
    fallback for catastrophic skew.
    """
    salted_left = left.withColumn(
        "__salt", (F.pmod(F.hash(F.col(key), F.monotonically_increasing_id()), F.lit(salt_buckets))).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(salted_right, on=[key, "__salt"], how=how).drop("__salt")
    return out
