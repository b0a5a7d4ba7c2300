"""Domain pipeline stages — the reference's DAG re-expressed as lazy
DataFrame transformations with parquet stage boundaries (SURVEY.md §3).

Entry points mirror the reference's GitHub-Actions jobs:
landings (ingest -> preprocess -> merge -> weights -> validate),
trips (pds preprocess -> validate -> merge), estimate, public exports.
"""
