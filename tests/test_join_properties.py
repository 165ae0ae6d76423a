"""Property-based equivalence tests for the non-equi join primitives.

Each operator (as-of, band, point-in-interval, bloom-pruned semi) claims
bit-identical semantics to a naive quadratic reference while planning a
linear shuffle shape. The fixed-case tests pin known examples; these
hypothesis tests pin the CLAIM — random keys, timestamps, bands, and
interval layouts, compared row-for-row against the naive form computed in
plain Python. Examples are small (Spark job per example), so max_examples
stays low; the value is in the adversarial shrinking, not volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

PROP = settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)


@PROP
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(-99, 99)),
        min_size=0,
        max_size=25,
    ),
)
def test_asof_join_matches_naive(spark, left, right):
    # unique (key, ts) on the right — the operator's documented precondition
    right = list({(k, ts): (k, ts, v) for k, ts, v in right}.values())
    from platform_etl_drug_disease_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k int, ts int, rid int"
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "rid")
    rdf = spark.createDataFrame(right or [], "k int, rts int, v int").select(
        "k", F.timestamp_seconds("rts").alias("rts"), "v"
    )
    out = asof_join(ldf, rdf, "k", "ts", "rts", {"v": "matched_v"})
    got = {r.rid: r.matched_v for r in out.collect()}

    expect = {}
    for i, (k, ts) in enumerate(left):
        cands = [(rts, v) for (rk, rts, v) in right if rk == k and rts <= ts]
        expect[i] = max(cands)[1] if cands else None
    assert got == expect


@PROP
@given(
    lts=st.lists(st.integers(0, 500), min_size=1, max_size=15),
    rts=st.lists(st.integers(0, 500), min_size=0, max_size=15),
    band=st.integers(1, 120),
)
def test_band_join_matches_naive(spark, lts, rts, band):
    from platform_etl_drug_disease_spark.operators.joins import band_join_bucketed

    ldf = spark.createDataFrame([(t,) for t in lts], "lt int").select(
        F.timestamp_seconds("lt").alias("lts")
    )
    rdf = spark.createDataFrame([(t,) for t in rts] or [], "rt int").select(
        F.timestamp_seconds("rt").alias("rts")
    )
    out = band_join_bucketed(ldf, rdf, "lts", "rts", band)
    got = sorted(
        (int(r.lts.timestamp()), int(r.rts.timestamp())) for r in out.collect()
    )
    expect = sorted(
        (a, b) for a in lts for b in rts if abs(a - b) <= band
    )
    assert got == expect


@PROP
@given(
    days=st.lists(st.integers(0, 200), min_size=1, max_size=20),
    ivs=st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 60)), min_size=1, max_size=8
    ),
    bucket=st.integers(1, 40),
)
def test_point_in_interval_matches_naive(spark, days, ivs, bucket):
    from platform_etl_drug_disease_spark.operators.intervals import (
        point_in_interval_join,
    )

    facts = spark.createDataFrame([(d,) for d in days], "d int").select(
        F.date_add(F.to_date(F.lit("2020-01-01")), F.col("d")).alias("ts")
    )
    iv = spark.createDataFrame(
        [(i, s, s + w) for i, (s, w) in enumerate(ivs)], "iv_id int, s0 int, e0 int"
    ).select(
        "iv_id",
        F.date_add(F.to_date(F.lit("2020-01-01")), F.col("s0")).alias("s"),
        F.date_add(F.to_date(F.lit("2020-01-01")), F.col("e0")).alias("e"),
    )
    out = point_in_interval_join(facts, iv, "ts", "s", "e", bucket_days=bucket)
    got = sorted(
        ((r.ts - __import__("datetime").date(2020, 1, 1)).days, r.iv_id)
        for r in out.collect()
    )
    expect = sorted(
        (d, i)
        for d in days
        for i, (s, w) in enumerate(ivs)
        if s <= d <= s + w
    )
    assert got == expect


@PROP
@given(
    build=st.sets(st.integers(0, 10_000), min_size=0, max_size=60),
    probe=st.lists(st.integers(0, 10_000), min_size=0, max_size=60),
)
def test_bloom_prune_is_superset_of_semi_join(spark, build, probe):
    from platform_etl_drug_disease_spark.operators.sketches import bloom_prune

    bdf = spark.createDataFrame([(k,) for k in build] or [], "k long")
    pdf = spark.createDataFrame(
        [(k, i) for i, k in enumerate(probe)] or [], "pk long, rid int"
    )
    out = bloom_prune(pdf, "pk", bdf, "k")
    kept = {r.rid for r in out.collect()}
    members = {i for i, k in enumerate(probe) if k in build}
    # no false negatives, ever
    assert members <= kept
    # and nothing fabricated: kept rows come from the probe input
    assert kept <= set(range(len(probe)))
