"""The full drug-repurposing pipeline DAG (reference parity with
sim.sc:341-516, main).

Dataflow: 11 shaped inputs → tissue-filtered interaction network →
evidence union + per-datasource score pivot → propagation over
neighbours∪self → grouped harmonic association scoring → enrichment joins
(targets+drugs-by-mechanism+AEs, diseases+drugs-by-disease+aggregations) →
repurposing hypotheses (``array_except``: drugs known for the target minus
drugs already used for the disease) → AE-profile overlap scoring →
two outputs: ``associations`` (parquet) and ``drug_disease`` (JSON).

Scale-deliberate differences from the reference (semantics identical):
- ``persist()`` at every multi-consumer node — the reference recomputes the
  entire association lineage for its second output (SURVEY.md C2);
- explicit pivot values (no distinct pre-scan);
- broadcast hints on the small dimension joins;
- no cosmetic global sorts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from platform_etl_drug_disease_spark.operators.arrays import overlap_coefficient
from platform_etl_drug_disease_spark.plans.associations import (
    make_associations,
    pivot_evidence_scores,
    propagate_over_network,
)
from platform_etl_drug_disease_spark.plans.domain_loaders import (
    shape_aggregated_drugs,
    shape_diseases,
    shape_drugs,
    shape_evidence,
    shape_expression,
    shape_faers_by_drug,
    shape_faers_by_target,
    shape_genetics_evidence,
    shape_targets,
)
from platform_etl_drug_disease_spark.plans.network import tissue_filtered_network


class PipelineOutputs:
    """The pipeline's two outputs. ``drug_disease`` is built LAZILY on
    first attribute access (round-11 optimization, guide §1.2 "don't
    compute things you throw away" applied to PLAN CONSTRUCTION): its DAG
    is ~15 eager Catalyst-analysis ops over the pipeline's largest trees
    (the hypotheses projection with nested transforms, the AE-overlap
    explode join and scoring chain), and the whitelist catalog query reads
    only ``associations`` — building the second output there was pure
    driver-side waste at every scale. Consumers are unchanged: attribute
    access returns the identical DataFrame the eager form returned."""

    def __init__(
        self, associations: DataFrame, drug_disease_fn: Callable[[], DataFrame]
    ) -> None:
        self.associations = associations
        self._drug_disease_fn = drug_disease_fn
        self._drug_disease: DataFrame | None = None

    @property
    def drug_disease(self) -> DataFrame:
        if self._drug_disease is None:
            self._drug_disease = self._drug_disease_fn()
        return self._drug_disease


def drugs_for_disease(drugs: DataFrame, aes_by_drug: DataFrame, aggregated: DataFrame) -> DataFrame:
    """Per disease: every known drug with its metadata + AE profile
    (sim.sc:380-399). right_outer keeps aggregation rows whose drug has no
    metadata in the drug index — reference semantics."""
    enriched = drugs.join(aes_by_drug, "drug_id", "left_outer").join(
        aggregated, "drug_id", "right_outer"
    )
    # the aes→drug_aes rename happens as the struct field's alias instead of
    # a withColumnRenamed between the joins (round-11 op-count cut; the
    # optimizer collapsed the rename into the struct either way)
    return enriched.groupBy("disease_id").agg(
        F.collect_list(
            F.struct(
                F.col("aes").alias("drug_aes"),
                "drug_id",
                "indication_ids",
                "max_clinical_trial_phase",
                "mechanisms_of_action",
                "number_of_mechanisms_of_action",
                "pref_name",
            )
        ).alias("drugs_for_disease"),
        F.first("associated_disease_ids").alias("associated_disease_ids"),
        F.first("associated_target_ids").alias("associated_target_ids"),
    )


def drugs_for_target(drugs: DataFrame, aes_by_target: DataFrame) -> DataFrame:
    """Per target: drugs acting on it via mechanism-of-action components
    (sim.sc:400-422): nested transform → flatten → explode → rollup, plus
    the target's AE profile."""
    target_ids = F.flatten(
        F.transform(
            "mechanisms_of_action",
            lambda m: F.transform(m["target_components"], lambda c: c["ensembl"]),
        )
    )
    return (
        drugs.where(F.col("number_of_mechanisms_of_action") > 0)
        .withColumn("target_id", F.explode(target_ids))
        .groupBy("target_id")
        .agg(
            F.collect_list(
                F.struct(
                    "drug_id",
                    "max_clinical_trial_phase",
                    "drug_type",
                    "pref_name",
                    "indication_ids",
                )
            ).alias("drugs_for_target")
        )
        .join(aes_by_target, "target_id", "left_outer")
        .withColumnRenamed("aes", "target_aes")
    )


def run_pipeline(
    drug: DataFrame,
    target: DataFrame,
    disease: DataFrame,
    evidence: DataFrame,
    interactions: DataFrame,
    aggregated_drugs: DataFrame,
    studies: DataFrame,
    predictions: DataFrame,
    faers_by_drug: DataFrame,
    faers_by_target: DataFrame,
    expression: DataFrame,
    whitelist: DataFrame | None = None,
    harmonic_cutoff: float = 0.1,
) -> PipelineOutputs:
    """Wire the full DAG over raw (schema-conforming) inputs and return both
    output DataFrames, lazily. Mirrors main (sim.sc:341-516) including the
    whitelist branch: with a whitelist, associations group by
    (neighbour, whitelist_id) and skip the harmonic/new-drug cutoffs."""
    drugs = shape_drugs(drug)
    expressions = shape_expression(expression)
    targets = shape_targets(target)
    diseases = shape_diseases(disease)
    network = tissue_filtered_network(interactions, targets, expressions).persist()
    aggregated = shape_aggregated_drugs(aggregated_drugs)
    evidences = shape_evidence(evidence)
    genetics = shape_genetics_evidence(studies, predictions)
    aes_by_drug = shape_faers_by_drug(faers_by_drug).persist()
    aes_by_target = shape_faers_by_target(faers_by_target)

    df_dr = drugs_for_disease(drugs, aes_by_drug, aggregated)
    df_d = diseases.join(df_dr, "disease_id", "left_outer").persist()
    df_t = (
        targets.join(drugs_for_target(drugs, aes_by_target), "target_id", "left_outer")
        .join(network, "target_id", "left_outer")
        .persist()
    )

    evs = evidences.unionByName(genetics).persist()
    evs_scores = pivot_evidence_scores(evs)
    evs_pivoted = evs.join(evs_scores, "evs_id", "inner")

    if whitelist is not None:
        selected = whitelist.withColumn(
            "disease_id", F.explode("whitelist")
        ).persist()
        prepared = propagate_over_network(evs_pivoted, df_t).join(
            F.broadcast(selected), "disease_id", "inner"
        )
        associations = (
            make_associations(
                prepared,
                [F.col("neighbour").alias("target_id"), F.col("whitelist_id")],
            )
            .join(F.broadcast(selected), "whitelist_id", "inner")
            .join(df_t, "target_id")
            .join(df_d, "disease_id")
            .withColumn(
                "new_drugs",
                F.array_except(
                    F.col("drugs_for_target.drug_id"), F.col("drugs_for_disease.drug_id")
                ),
            )
            .withColumn("new_drugs_size", F.size("new_drugs"))
        )
    else:
        prepared = propagate_over_network(evs_pivoted, df_t)
        associations = (
            make_associations(
                prepared,
                [F.col("neighbour").alias("target_id"), F.col("disease_id")],
            )
            .where(F.col("harmonic") > harmonic_cutoff)
            .join(df_t, "target_id")
            .join(df_d, "disease_id")
            .withColumn(
                "new_drugs",
                F.array_except(
                    F.col("drugs_for_target.drug_id"), F.col("drugs_for_disease.drug_id")
                ),
            )
            .withColumn("new_drugs_size", F.size("new_drugs"))
            .where(F.col("new_drugs_size") > 0)
        )

    associations = associations.persist()

    def _build_drug_disease() -> DataFrame:
        return _drug_disease_output(associations, aes_by_drug)

    return PipelineOutputs(
        associations=associations, drug_disease_fn=_build_drug_disease
    )


def _drug_disease_output(
    associations: DataFrame, aes_by_drug: DataFrame
) -> DataFrame:
    """The second output's DAG (hypotheses projection → AE-overlap scoring),
    factored out of :func:`run_pipeline` so it can build lazily — see
    :class:`PipelineOutputs`. Expression-for-expression identical to the
    former inline chain."""
    hypotheses = associations.select(
        "disease_id",
        "target_id",
        "harmonic",
        "harmonic_genetics",
        "harmonic_literature",
        "target_name",
        "disease_name",
        "therapeutic_areas",
        F.array_distinct(
            F.flatten(
                F.transform(
                    "drugs_for_disease",
                    lambda d: F.transform(
                        d["drug_aes"], lambda ae: ae["drug_ae_event"]
                    ),
                )
            )
        ).alias("disease_aes_from_drugs"),
        F.array_distinct(F.flatten(F.col("drugs_for_disease.indication_ids"))).alias(
            "disease_indication_from_drugs"
        ),
        F.array_max(F.col("drugs_for_disease.max_clinical_trial_phase")).alias(
            "disease_max_clinical_trial_phase_from_drugs"
        ),
        F.array_max(F.col("drugs_for_target.max_clinical_trial_phase")).alias(
            "target_max_clinical_trial_phase_from_drugs"
        ),
        F.col("associated_disease_ids").alias("associated_disease_ids_from_disease_drug_agg"),
        F.col("associated_target_ids").alias("associated_target_ids_from_disease_drug_agg"),
        F.col("new_drugs").alias("hypotheses"),
    )

    drug_ae_events = aes_by_drug.select(
        "drug_id", F.col("aes.drug_ae_event").alias("drug_ae_events")
    )
    joined = hypotheses.withColumn("drug_hypothesis", F.explode("hypotheses")).join(
        F.broadcast(drug_ae_events),
        F.col("drug_hypothesis") == F.col("drug_id"),
        "left_outer",
    )
    # ONE select replaces the rename + the two score withColumns (round-11
    # driver-side op-count cut: every eager Dataset op re-analyzes the full
    # tree, and CollapseProject merged these three into a single Project
    # anyway — the optimized plan is unchanged, only the build cost drops).
    # The score expressions read `drug_ae_events` directly: it is the same
    # column the rename aliased, exactly as the collapsed Project computed.
    scored = joined.select(
        *[
            F.col("drug_ae_events").alias("drug_hypothesis_aes")
            if c == "drug_ae_events"
            else F.col(c)
            for c in joined.columns
        ],
        overlap_coefficient("drug_ae_events", "disease_aes_from_drugs").alias(
            "drug_hypothesis_aes_score"
        ),
        overlap_coefficient("disease_aes_from_drugs", "drug_ae_events").alias(
            "disease_aes_score"
        ),
    )
    drug_disease = scored.withColumn(
        "drug_hypothesis_disease_aes_score",
        F.lit(0.4) * F.col("drug_hypothesis_aes_score")
        + F.lit(0.6) * F.col("disease_aes_score"),
    ).where(F.col("drug_hypothesis_disease_aes_score") > 0.0)
    return drug_disease
