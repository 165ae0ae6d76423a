"""Domain input shapers (reference parity with Loaders.*, sim.sc:78-289).

Each shaper is a pure ``DataFrame -> DataFrame`` transform over an input that
matches the corresponding schema in ``schemas.py`` — reading is the job of
``sources.readers`` (explicit schemas, never inference). Column names and
semantics match the reference exactly so the downstream DAG is
output-compatible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from platform_etl_drug_disease_spark.operators.arrays import flatten_distinct


def shape_expression(df: DataFrame) -> DataFrame:
    """(gene, tissues[struct]) → (target_id, tissues[string]): keep tissues
    with rna.zscore > 0 or protein.level > 0, project efo_code
    (sim.sc:79-90) — HOF filter+transform, JVM-side."""
    expressed = F.transform(
        F.filter(
            "tissues",
            lambda t: (t["rna"]["zscore"] > 0) | (t["protein"]["level"] > 0),
        ),
        lambda t: t["efo_code"],
    )
    return df.select(F.col("gene").alias("target_id"), expressed.alias("tissues"))


def shape_drugs(df: DataFrame) -> DataFrame:
    """Drug index projection (sim.sc:93-107): rename + indications.efo_id
    field-extraction to an id array."""
    return df.select(
        F.col("id").alias("drug_id"),
        "max_clinical_trial_phase",
        F.col("type").alias("drug_type"),
        "pref_name",
        "mechanisms_of_action",
        F.col("indications.efo_id").alias("indication_ids"),
        "number_of_mechanisms_of_action",
    )


def shape_targets(df: DataFrame) -> DataFrame:
    """Target index projection with GO restructure (sim.sc:109-132):
    go[{id, value.term}] → gos[{code, term}]."""
    gos = F.transform(
        "go", lambda t: F.struct(t["id"].alias("code"), t["value"]["term"].alias("term"))
    )
    return df.select(
        F.col("id").alias("target_id"),
        F.col("approved_symbol").alias("target_name"),
        "biotype",
        gos.alias("gos"),
        "tractability",
        "uniprot_accessions",
        "uniprot_subcellular_location",
        "uniprot_similarity",
    )


def shape_diseases(df: DataFrame) -> DataFrame:
    """EFO ontology shaping (sim.sc:159-188): id = last URI segment,
    ancestors = flatten+distinct of path_codes (built-in composition, not the
    reference's UDF), descendants = the ancestor relation inverted by
    explode → group → collect_set; inner-joined back (every disease is its
    own ancestor, so the join keeps all shaped rows)."""
    efos = df.withColumn("id", F.substring_index("code", "/", -1)).withColumn(
        "ancestors", flatten_distinct("path_codes")
    )
    descendants = (
        efos.where(F.size("ancestors") > 0)
        .select(F.col("id").alias("descendant"), F.explode("ancestors").alias("id"))
        .groupBy("id")
        .agg(F.collect_set("descendant").alias("descendants"))
    )
    return efos.join(descendants, "id").select(
        F.col("id").alias("disease_id"),
        F.col("label").alias("disease_name"),
        "ancestors",
        "descendants",
        "phenotypes",
        F.col("therapeutic_codes").alias("therapeutic_areas"),
    )


def shape_evidence(df: DataFrame) -> DataFrame:
    """Literature evidence (sim.sc:222-235): europepmc only, nested struct
    fields lifted."""
    return df.where(F.col("sourceID") == "europepmc").select(
        F.col("sourceID").alias("datasource"),
        F.col("disease.id").alias("disease_id"),
        F.col("target.id").alias("target_id"),
        F.col("id").alias("evs_id"),
        F.col("scores.association_score").alias("score"),
    )


def shape_genetics_evidence(studies: DataFrame, predictions: DataFrame) -> DataFrame:
    """GWAS evidence synthesis (sim.sc:190-219): predictions ⋈ studies,
    variant id concat, score cutoff 0.5, sha1 evidence id, datasource tag."""
    preds = predictions.select(
        "study_id",
        F.concat_ws(
            "_", F.col("chrom"), F.col("pos").cast("string"), F.col("ref"), F.col("alt")
        ).alias("variant_id"),
        F.col("y_proba_all_features").alias("score"),
        F.col("gene_id").alias("target_id"),
    )
    studies_sel = studies.select("study_id", "trait_reported", "trait_efos", "trait_category")
    return (
        preds.join(studies_sel, "study_id", "inner")
        .withColumn("disease_id", F.explode("trait_efos"))
        .withColumn("datasource", F.lit("genetics"))
        .where(F.col("score") > 0.5)
        .withColumn(
            "evs_id",
            F.sha1(F.concat("study_id", "variant_id", "disease_id", "target_id")),
        )
        .select("disease_id", "evs_id", "score", "target_id", "datasource")
    )


def shape_faers_by_drug(df: DataFrame) -> DataFrame:
    """FAERS AE rollup per drug (sim.sc:237-255): nested struct collect.
    Sorted for deterministic downstream comparisons (collect_list order is
    partition-dependent; the reference tolerates that nondeterminism)."""
    return (
        df.select(
            F.col("chembl_id").alias("drug_id"),
            F.col("event").alias("drug_ae_event"),
            F.col("count").alias("drug_ae_count"),
            F.col("llr").alias("drug_ae_llr"),
            F.col("critval").alias("drug_ae_llr_critval"),
        )
        .groupBy("drug_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "drug_ae_event", "drug_ae_count", "drug_ae_llr", "drug_ae_llr_critval"
                    )
                )
            ).alias("aes")
        )
    )


def shape_faers_by_target(df: DataFrame) -> DataFrame:
    """FAERS AE rollup per target (sim.sc:257-275)."""
    return (
        df.select(
            "target_id",
            F.col("event").alias("target_ae_event"),
            F.col("report_count").alias("target_ae_count"),
            F.col("llr").alias("target_ae_llr"),
            F.col("critval").alias("target_ae_llr_critval"),
        )
        .groupBy("target_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "target_ae_event",
                        "target_ae_count",
                        "target_ae_llr",
                        "target_ae_llr_critval",
                    )
                )
            ).alias("aes")
        )
    )


def shape_aggregated_drugs(df: DataFrame) -> DataFrame:
    """Aggregated (disease, drug) projection (sim.sc:277-289)."""
    return df.select(
        "disease_id",
        "drug_id",
        F.col("associated_diseases").alias("associated_disease_ids"),
        F.col("associated_targets").alias("associated_target_ids"),
    )
