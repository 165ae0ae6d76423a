"""Retrieval / chunking / PII / semantic-dedup operator tests (sf0.001)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


def _docs(spark):
    from platform_etl_drug_disease_spark.schemas import load_table

    return load_table(spark, SF_SMOKE, "documents", ["doc_id", "text"])


def test_postings_tf_counts(spark):
    from platform_etl_drug_disease_spark.operators.retrieval import postings

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b b")], ["doc_id", "text"]
    )
    rows = {(r.doc_id, r.term): r.tf for r in postings(docs).collect()}
    assert rows == {(1, "a"): 2, (1, "b"): 1, (1, "c"): 1, (2, "b"): 3}


def test_tfidf_rare_term_outranks_common(spark):
    from platform_etl_drug_disease_spark.operators.retrieval import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "common rare"), (2, "common x"), (3, "common y")],
        ["doc_id", "text"],
    )
    top = {
        r.doc_id: r.term
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    # 'rare' (df=1) must beat 'common' (df=3) for doc 1.
    assert top[1] == "rare"


def test_bm25_matches_only_query_terms(spark):
    from platform_etl_drug_disease_spark.operators.retrieval import bm25_search

    docs = spark.createDataFrame(
        [(1, "join join hash"), (2, "scan filter"), (3, "join")],
        ["doc_id", "text"],
    )
    res = bm25_search(docs, ["join", "hash"], k=10).collect()
    ids = [r.doc_id for r in res]
    assert 2 not in ids  # no query term → never scored
    assert ids[0] == 1  # two terms, higher tf → top rank
    assert [r.rank for r in res] == list(range(1, len(res) + 1))


def test_chunking_covers_all_tokens_with_overlap(spark):
    from platform_etl_drug_disease_spark.plans.retrieval import (
        _CHUNK_SIZE,
        _CHUNK_STEP,
        doc_chunking,
    )

    out = doc_chunking(spark, SF_SMOKE)
    docs = _docs(spark).withColumn("n", F.size(F.split(F.trim(F.lower("text")), r"\s+")))
    joined = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("n_chunks"), F.max("n_chunk_tokens").alias("max_len"))
        .join(docs.select("doc_id", "n"), "doc_id")
        .collect()
    )
    assert joined, "chunking produced no rows"
    for r in joined:
        assert r.n_chunks == len(range(0, r.n, _CHUNK_STEP))
        assert r.max_len <= _CHUNK_SIZE


def test_pii_counts_and_redaction(spark):
    from platform_etl_drug_disease_spark.operators.pii import with_pii_stats

    df = spark.createDataFrame(
        [
            (1, "mail me at bob@corp.example.com or 555-123-4567"),
            (2, "server 192.168.0.1 is clean"),
            (3, "nothing here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in with_pii_stats(df).collect()}
    assert (rows[1].n_email, rows[1].n_phone, rows[1].n_ipv4) == (1, 1, 0)
    assert (rows[2].n_email, rows[2].n_phone, rows[2].n_ipv4) == (0, 0, 1)
    assert (rows[3].n_email, rows[3].n_phone, rows[3].n_ipv4) == (0, 0, 0)
    # doc 3 untouched by redaction
    assert rows[3].clean_len == len("nothing here")
    # doc 1: both spans replaced by <PII>
    assert rows[1].clean_len == len("mail me at <PII> or <PII>")


def test_semantic_dedup_partitions_corpus(spark):
    from platform_etl_drug_disease_spark.operators.similarity import semantic_dedup
    from platform_etl_drug_disease_spark.schemas import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings", ["vec_id", "embedding"])
    cents = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    out = semantic_dedup(emb, cents).collect()
    n_vec = emb.count()
    # cells partition the corpus: membership counts sum to n
    assert sum(r.n_members for r in out) == n_vec
    # keepers are unique and belong to their cell digest
    keepers = [r.kept_id for r in out]
    assert len(set(keepers)) == len(keepers)
    # a centroid's own vector scores 1.0 to itself → it must be its keeper
    own = {r.cent_id: r for r in out}
    for cid, r in own.items():
        if r.kept_id == cid:
            assert r.kept_cos == pytest.approx(1.0, abs=1e-6)


def test_bm25_plan_has_no_single_partition_window_over_corpus(spark):
    """The global top-k must compile to TakeOrderedAndProject, not a
    one-partition window over every scored document."""
    from platform_etl_drug_disease_spark.plan_lint import explain_string
    from platform_etl_drug_disease_spark.plans.retrieval import bm25_query

    plan = explain_string(bm25_query(spark, SF_SMOKE), mode="formatted")
    assert "TakeOrderedAndProject" in plan


def test_kmeans_converges_and_partitions(spark):
    from platform_etl_drug_disease_spark.operators.similarity import kmeans_fit
    from platform_etl_drug_disease_spark.schemas import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings", ["vec_id", "embedding"])
    n = emb.count()
    seeds = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    cents, assigned = kmeans_fit(emb, seeds, n_iters=2)
    # assignment partitions the corpus
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    # centroids are means of unit vectors: norms must be in (0, 1]
    rows = cents.collect()
    assert rows
    import math

    for r in rows:
        norm = math.sqrt(sum(x * x for x in r.cent_vec))
        assert 0.0 < norm <= 1.0 + 1e-9


def test_kmeans_deterministic(spark):
    from platform_etl_drug_disease_spark.operators.similarity import kmeans_fit
    from platform_etl_drug_disease_spark.schemas import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings", ["vec_id", "embedding"])
    seeds = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    a = kmeans_fit(emb, seeds, n_iters=2)[1].orderBy("vec_id").collect()
    b = kmeans_fit(emb, seeds, n_iters=2)[1].orderBy("vec_id").collect()
    assert a == b


def test_boilerplate_frac_bounds(spark):
    """Boilerplate fractions are well-formed per source (values oracle-checked
    at sf0.01 by tools/oracle_check.py)."""
    from platform_etl_drug_disease_spark.plans.retrieval import (
        boilerplate_span_stats,
    )

    out = boilerplate_span_stats(spark, SF_SMOKE).collect()
    assert out
    for r in out:
        assert 0.0 <= r.avg_boiler_frac <= 1.0
        assert 0 <= r.n_flagged <= r.n_docs


def test_no_expensive_exprs_sunk_into_filters(spark):
    """InferFiltersFromGenerate must not re-materialize shingle/token arrays
    inside a Filter below the repartition exchange (measured 20 s single-core
    stall when it does — see boilerplate_span_stats)."""
    from platform_etl_drug_disease_spark.plan_lint import filter_conditions
    from platform_etl_drug_disease_spark.plans.retrieval import (
        bm25_query,
        boilerplate_span_stats,
        doc_chunking,
        tfidf_query,
    )

    for fn in (boilerplate_span_stats, tfidf_query, bm25_query, doc_chunking):
        for cond in filter_conditions(fn(spark, SF_SMOKE)):
            assert "array_distinct" not in cond, cond
            assert "transform(sequence" not in cond, cond
