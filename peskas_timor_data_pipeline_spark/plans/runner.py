"""Pipeline DAG runner: named stages, parquet checkpoints, dependency
resolution (replaces the reference's GitHub-Actions YAML + GCS artifacts,
.github/workflows/data-pipeline.yaml:21-266).

Within a stage everything is one lazy Catalyst plan; a stage boundary is a
versioned parquet write (the same durability role the reference's GCS
artifacts play). Stages re-read from parquet, so a failed run resumes from
the last completed stage.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from peskas_timor_data_pipeline_spark.sources.io import read_stage, write_stage

log = logging.getLogger(__name__)


@dataclass
class Stage:
    name: str
    fn: Callable[..., DataFrame]          # (spark, **input_dfs) -> DataFrame
    inputs: list[str] = field(default_factory=list)  # upstream stage names


@dataclass
class Pipeline:
    spark: SparkSession
    artifact_dir: str
    stages: list[Stage] = field(default_factory=list)

    def stage(self, name: str, inputs: list[str] | None = None):
        """Decorator registration: @pipe.stage("merged", inputs=["v1","v2"])."""

        def deco(fn: Callable[..., DataFrame]) -> Callable[..., DataFrame]:
            self.stages.append(Stage(name, fn, inputs or []))
            return fn

        return deco

    def run(self, only: set[str] | None = None) -> dict[str, str]:
        """Run stages in declaration order (a valid topological order by
        construction); returns stage -> artifact path."""
        paths: dict[str, str] = {}
        for st in self.stages:
            if only and st.name not in only:
                continue
            upstream = {
                name: read_stage(self.spark, self.artifact_dir, name)
                for name in st.inputs
            }
            log.info("stage %s: running (inputs=%s)", st.name, st.inputs)
            out = st.fn(self.spark, **upstream)
            paths[st.name] = write_stage(out, self.artifact_dir, st.name)
            log.info("stage %s -> %s", st.name, paths[st.name])
        return paths
