"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CPUE query at sf0.001 (smoke);
``queries()``/``oracle_sql()`` expose the full operator inventory from
SURVEY.md §2 with DuckDB oracle twins, checked by the driver at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from peskas_timor_data_pipeline_spark.harness import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from peskas_timor_data_pipeline_spark.harness.flagship import flagship_cpue

    return flagship_cpue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (omitted => driver
    records a weaker rows-only check)."""
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
