"""Lineage materialization for iterative / multi-reference plans.

``localCheckpoint`` stores blocks on executors — fast, but lost with the
executor, which aborts a long dedup or component run instead of recomputing.
For cluster runs callers pass ``checkpoint_dir`` (any shared filesystem
path) and get a RELIABLE checkpoint that survives executor loss; the
default stays local for tests and single-node runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Cut lineage eagerly: reliable ``checkpoint()`` under
    ``checkpoint_dir`` when given, else ``localCheckpoint()``."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)
