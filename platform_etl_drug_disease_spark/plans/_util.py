"""Cross-engine determinism helpers for the DuckDB-oracle query catalog.

Floating-point sums are order-dependent, and Spark/DuckDB aggregate in
different orders — a raw ``SUM(double)`` can differ in low bits and break the
driver's exact value-hash compare. The fix used throughout the catalog:
cast to DECIMAL before summing (exact, order-independent integer arithmetic
in both engines), then cast the exact decimal result back to double. Both
engines perform the identical double→decimal rounding and decimal→double
conversion, so results match bit-for-bit.

Folds over *sorted* arrays (the harmonic score) are sequence-deterministic in
both engines (left fold), so they need no decimal detour.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM(double) → double via exact decimal accumulation.

    Oracle equivalent: ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double.

    Oracle: ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def arr_join(col: Column | str, elem_cast: str | None = None, sep: str = ",") -> Column:
    """Driver-safe array rendering: join elements into one comma string.

    The driver canonicalizes results via pandas ``sort_values`` over every
    output column, which raises ``TypeError: unhashable type: 'list'`` on
    array columns — so catalog queries keep arrays internal and emit them as
    joined strings. ``elem_cast`` pins the element text form so both engines
    render identically: ``"string"`` for integers (``"42"``),
    ``"decimal(18,2)"`` for doubles (fixed-scale ``"1234.50"``, verified
    bit-identical between Spark and DuckDB).

    Oracle equivalent:
    ``array_to_string(list_transform(xs, x -> CAST(x AS VARCHAR)), ',')`` or
    ``... CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR) ...`` for doubles.
    """
    c = F.col(col) if isinstance(col, str) else col
    if elem_cast is not None:
        if elem_cast != "string":
            c = F.transform(c, lambda x: x.cast(elem_cast).cast("string"))
        else:
            c = F.transform(c, lambda x: x.cast("string"))
    return F.array_join(c, sep)


def dround(col: Column | str, digits: int = 4) -> Column:
    """Engine-deterministic rounding of a non-negative double:
    ``floor(x·10^d + 0.5) / 10^d`` — every step an IEEE double op, so any
    engine computing it on the same input produces the same bits.

    Built-in ``round()`` half-boundary behavior is engine-specific: at sf0.1
    the flagship harmonic value 56671.724449999994 rounded to 56671.7244 in
    Spark and 56671.7245 in DuckDB (9 of 20k groups hit such boundaries).
    Oracle equivalent: ``floor(x * 1e{d} + 0.5) / 1e{d}``. Negative inputs
    would round toward -inf at the boundary; use only for non-negative
    scores.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10**digits))
    return F.floor(c * p + F.lit(0.5)) / p
