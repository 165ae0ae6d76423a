"""Smoke test of the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"l_partkey", "harmonic", "n_scores"}


def test_catalog_is_consistent():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "catalog must not be empty"
    # every oracle refers to a declared query
    assert set(o) <= set(q)


def test_catalog_queries_run_at_smoke_sf(spark):
    from tests.conftest import SF_SMOKE

    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        df.limit(1).collect()  # plans resolve and execute
