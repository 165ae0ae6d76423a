"""platform_etl_drug_disease_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``opentargets-archive/platform-etl-drug-disease`` (a Spark 2.4 Scala batch ETL
that scores target–disease associations and proposes drug-repurposing
hypotheses), re-expressed as an idiomatic PySpark operator library designed for
100 TB scale:

- ``session``    — SparkSession factory (AQE on, tuned shuffle partitions)
- ``schemas``    — explicit StructTypes for every input (no schema inference)
- ``sources``    — readers/sinks (JSON, parquet, CSV/ORC, optional, glob)
- ``operators``  — composable ``DataFrame -> DataFrame`` transforms mirroring
                   the reference's operator inventory (SURVEY.md §2) plus
                   LLM-pipeline extensions (dedup, similarity, text analysis,
                   multimodal plumbing)
- ``functions``  — column-level expression builders (harmonic fold, hashes)
- ``plans``      — query catalog + the reference-parity drug-disease DAG
- ``streaming``  — Structured Streaming variants of the event-time operators

Reference citations in docstrings use ``sim.sc:N`` =
``platformDataBackendDrugDiseaseSimilarity.sc`` line N of the reference repo.
No code is copied from the reference; it is a semantics blueprint only.
"""

__version__ = "0.1.0"
