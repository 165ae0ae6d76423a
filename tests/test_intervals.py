"""Gaps-and-islands interval merge + repeated-substring removal."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _spans(spark, rows):
    return spark.createDataFrame([Row(k=k, start=s, end=e) for k, s, e in rows])


def test_merge_intervals_overlap_touch_disjoint(spark):
    from platform_etl_drug_disease_spark.operators.intervals import merge_intervals

    df = _spans(
        spark,
        [
            ("a", 0, 8), ("a", 4, 12),   # overlap -> [0,12)
            ("a", 12, 20),               # touching -> merges into [0,20)
            ("a", 30, 38),               # disjoint island
            ("b", 5, 13),                # other key untouched
        ],
    )
    got = sorted(
        (r.k, r.start, r.end)
        for r in merge_intervals(df, ["k"]).collect()
    )
    assert got == [("a", 0, 20), ("a", 30, 38), ("b", 5, 13)]


def test_merge_intervals_contained_and_duplicate(spark):
    from platform_etl_drug_disease_spark.operators.intervals import merge_intervals

    df = _spans(spark, [("a", 0, 10), ("a", 2, 5), ("a", 0, 10), ("a", 9, 11)])
    got = [(r.start, r.end) for r in merge_intervals(df, ["k"]).collect()]
    assert got == [(0, 11)]


def test_merge_intervals_partition_invariant(spark):
    from platform_etl_drug_disease_spark.operators.intervals import merge_intervals

    rows = [("k", i * 3, i * 3 + 5) for i in range(50)]  # chain: all merge
    df = _spans(spark, rows)
    out1 = merge_intervals(df, ["k"]).collect()
    out2 = merge_intervals(df.repartition(7), ["k"]).collect()
    assert sorted((r.start, r.end) for r in out1) == [(0, 152)]
    assert sorted((r.start, r.end) for r in out1) == sorted(
        (r.start, r.end) for r in out2
    )


def test_substring_dedup_accounting_consistent(spark):
    """kept + removed == total per source, and removal never exceeds the
    tokens of the docs that contain duplicates."""
    from platform_etl_drug_disease_spark.plans.dedup_text import substring_dedup_stats

    rows = substring_dedup_stats(spark, SF_SMOKE).collect()
    assert rows, "census must produce per-source rows"
    for r in rows:
        assert r.kept_tokens + r.removed_tokens == r.total_tokens
        assert 0 <= r.docs_with_dups <= r.n_docs
        if r.removed_tokens > 0:
            assert r.docs_with_dups > 0


def test_substring_dedup_plants_are_removed(spark):
    """A corpus of two identical docs + one unique doc must remove every
    token of the duplicated text (full-span merge), none of the unique."""
    from platform_etl_drug_disease_spark.operators.intervals import merge_intervals
    from platform_etl_drug_disease_spark.operators import text as tx

    dup_text = " ".join(f"tok{i}" for i in range(20))
    uniq_text = " ".join(f"uniq{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="s", text=dup_text),
            Row(doc_id=2, source="s", text=dup_text),
            Row(doc_id=3, source="s", text=uniq_text),
        ]
    )
    base = docs.select(
        "doc_id", tx.tokens("text").alias("t")
    ).withColumn("n", F.size("t"))
    W = 8
    starts = F.when(F.col("n") >= W, F.sequence(F.lit(0), F.col("n") - W))
    occ = (
        base.select("doc_id", "t", F.explode_outer(starts).alias("pos"))
        .where(F.col("pos").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.xxhash64(
                F.array_join(F.slice(F.col("t"), F.col("pos") + 1, W), " ")
            ).alias("gram"),
        )
    )
    dup = occ.groupBy("gram").count().where(F.col("count") > 1).select("gram")
    spans = occ.join(dup, "gram").select(
        "doc_id", F.col("pos").alias("start"), (F.col("pos") + W).alias("end")
    )
    merged = merge_intervals(spans, ["doc_id"])
    got = {
        r.doc_id: (r.start, r.end)
        for r in merged.collect()
    }
    # both copies fully covered [0, 20); unique doc has no spans at all
    assert got == {1: (0, 20), 2: (0, 20)}


def test_merge_intervals_matches_reference_model(spark):
    """Property check vs an in-memory reference merge over randomized span
    sets (hypothesis): same islands for any input, including duplicates,
    containment, chains, and touching spans."""
    from hypothesis import given, settings, strategies as st

    from platform_etl_drug_disease_spark.operators.intervals import merge_intervals

    def ref_merge(spans):
        out = []
        for s, e in sorted(spans):
            if out and s <= out[-1][1]:
                out[-1][1] = max(out[-1][1], e)
            else:
                out.append([s, e])
        return [tuple(x) for x in out]

    span = st.tuples(st.integers(0, 50), st.integers(1, 20)).map(
        lambda t: (t[0], t[0] + t[1])
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(span, min_size=1, max_size=25))
    def check(spans):
        df = _spans(spark, [("k", s, e) for s, e in spans])
        got = sorted(
            (r.start, r.end) for r in merge_intervals(df, ["k"]).collect()
        )
        assert got == ref_merge(spans)

    check()
