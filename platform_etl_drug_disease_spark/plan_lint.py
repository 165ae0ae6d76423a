"""Physical-plan introspection + lint (the diagnostic layer SURVEY.md §4
proposes: no custom Catalyst rules, but a plan-tree check that catches
scale anti-patterns before they ship).

Used by tests to assert plan quality (filter pushdown reaches the parquet
scan, dimension joins broadcast, hot paths stay in whole-stage codegen) and
available to pipeline authors as ``lint(df)``.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

# substrings that indicate a scale anti-pattern in a physical plan
ANTIPATTERNS = {
    "CartesianProduct": "unkeyed cross product — add a join key or broadcast",
    "BatchEvalPython": "row-at-a-time Python UDF — use built-ins or a pandas UDF",
}


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The .explain output as a string (explain only prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if any scan in the plan carries pushed-down filters (a scan with
    nothing to push does not disqualify the others)."""
    return bool(scans_with_pushdown(df))


def scans_with_pushdown(df: DataFrame) -> list[str]:
    plan = explain_string(df)
    return [
        line.strip()
        for line in plan.splitlines()
        if "PushedFilters:" in line and "PushedFilters: []" not in line
    ]


def filter_conditions(df: DataFrame) -> list[str]:
    """The ``Condition :`` line of every Filter node in the formatted plan.

    Guard against the InferFiltersFromGenerate pathology: exploding a
    computed array lets Spark derive ``size(arr) > 0`` and sink it below an
    exchange, re-evaluating the (possibly expensive) array expression on the
    pre-shuffle side. Asserting that no Filter condition contains the
    expensive constructor (e.g. ``array_distinct``/``transform``) pins the
    fix (explode_outer + post-Generate null filter)."""
    plan = explain_string(df, mode="formatted")
    return [
        line.split("Condition :", 1)[1].strip()
        for line in plan.splitlines()
        if line.strip().startswith("Condition :")
    ]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_string(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans — zero means everything
    fell off the fast path. Executes the plan (collect) first: under AQE the
    final physical plan with its ``*(n)`` codegen markers only exists on this
    DataFrame's queryExecution after an action."""
    import re

    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def lint(df: DataFrame) -> list[str]:
    """Return human-readable warnings for scale anti-patterns in the plan."""
    plan = explain_string(df)
    warnings = [
        f"{pat}: {why}" for pat, why in ANTIPATTERNS.items() if pat in plan
    ]
    # repeated scans of the SAME file = an uncached fan-out (multi-table
    # joins legitimately scan many different files once each)
    locations = [
        line.split("[", 1)[1].split("]")[0]
        for line in plan.splitlines()
        if line.strip().startswith("Location:") and "[" in line
    ]
    from collections import Counter

    for loc, n in Counter(locations).items():
        if n > 3:
            warnings.append(
                f"{loc.rsplit('/', 1)[-1]} scanned {n}x — consider persist() at the fan-out"
            )
    return warnings
