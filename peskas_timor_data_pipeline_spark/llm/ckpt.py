"""Lineage materialization for iterative / multi-reference plans.

``localCheckpoint`` stores blocks on executors — fast, but lost with the
executor, which aborts a long dedup or component run instead of recomputing.
For cluster runs callers pass ``checkpoint_dir`` (any shared filesystem
path) and get a RELIABLE checkpoint that survives executor loss; the
default stays local for tests and single-node runs.
"""

from __future__ import annotations

from collections.abc import Sequence
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Cut lineage eagerly: reliable ``checkpoint()`` under
    ``checkpoint_dir`` when given, else ``localCheckpoint()``.

    A frame whose plan is ALREADY a bare checkpoint scan (callers may
    pre-materialize an input to overlap its job with other work) passes
    through untouched — re-checkpointing it would copy every block for
    zero lineage gain."""
    if df._jdf.queryExecution().analyzed().getClass().getSimpleName() == (
        "LogicalRDD"
    ):
        return df
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


def materialize_many(
    dfs: Sequence[DataFrame], checkpoint_dir: str | None = None
) -> list[DataFrame]:
    """Checkpoint several INDEPENDENT frames as CONCURRENT jobs.

    Eager checkpoints are driver-blocking actions; issuing them one after
    another serializes jobs whose stages have no data dependency, leaving
    the cluster idle through each job's straggler tail. Submitting them
    from a small thread pool lets the scheduler back-fill executors freed
    by one job's tail with the next job's tasks (optimization guide §2.6
    "overlap independent jobs") — same frames, same values, same plans;
    only the wall-clock overlap changes. Callers must only pass frames
    with no compute dependency on each other."""
    if len(dfs) <= 1:
        return [materialize(df, checkpoint_dir) for df in dfs]
    with ThreadPoolExecutor(max_workers=len(dfs)) as pool:
        return list(pool.map(lambda d: materialize(d, checkpoint_dir), dfs))
