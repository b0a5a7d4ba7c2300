"""Thin DAG runner (SURVEY.md §3.4)."""

from peskas_timor_data_pipeline_spark.plans.runner import Pipeline, Stage  # noqa: F401
