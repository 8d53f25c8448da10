"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``sliaros/building_energy_data_pipeline``
(see SURVEY.md), re-expressed Spark-first.

Layout
------
- ``session``    — SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
- ``sources``    — readers / writers / discovery (SURVEY §2.1 S1–S17)
- ``operators``  — transforms, sampling, dedup, similarity, text, multimodal
- ``functions``  — scalar helper expressions (SURVEY §2.8 F1–F9)
- ``schema``     — sampling-based inference, profiling, DDL, diff (§1.4, §2.9)
- ``plans``      — the oracle-checked query library (feeds __spark_entry__)
- ``ops``        — maintenance: compaction, health, history (§2.10)
- ``streaming``  — Structured Streaming ingestion (§2.11)
"""

__version__ = "0.1.0"
