"""Correctness harness: named queries + DuckDB oracle twins.

Each module contributes ``QUERIES: dict[name, (spark_fn, oracle_sql|None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` exercises one operator family
from SURVEY.md §2 on the driver's synthetic tables, and the oracle SQL is its
ANSI-SQL twin for DuckDB. Column names/aliases match exactly (the driver
sorts columns by name and hashes values).

Determinism conventions (see SURVEY.md §7.4):
- every double aggregate is rounded; granularity scales with magnitude so
  float summation-order differences cannot flip the rounded value
- ordered firsts/medians use explicit orderings, never input order
- pseudo-random choices use md5-based ordering, identical in both engines
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def registry() -> dict[str, tuple[QueryFn, str | None]]:
    from peskas_timor_data_pipeline_spark.harness import (
        aggregates_q,
        core_relational_q,
        flagship,
        llm_q,
        stats_q,
        validators_q,
        windows_q,
    )

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (flagship, core_relational_q, aggregates_q, windows_q,
                validators_q, stats_q, llm_q):
        for name, entry in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = entry
    return out
