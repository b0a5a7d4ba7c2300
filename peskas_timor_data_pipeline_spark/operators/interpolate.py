"""Time-series interpolation imputation (SURVEY.md M7).

The reference fills gaps in monthly series with zoo::na.approx(rule=2) plus
noise replicates that collapse under the mean (R/estimate-catch.R:364-431).
Here: pure window-function linear interpolation — last/next non-null via
ignoreNulls window frames, rule=2 end extension. No UDF, one shuffle on the
series key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interpolate_linear(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Linear interpolation of nulls in ``value_col`` within each series
    (partitioned by ``keys``, ordered by ``order_col``); boundary nulls take
    the nearest non-null (na.approx rule=2). Adds ``is_imputed``."""
    out_col = out_col or value_col
    w = Window.partitionBy(*keys).orderBy(order_col)
    rn = F.row_number().over(w)
    df = df.withColumn("__rn__", rn)

    w_back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    v = F.col(value_col)
    non_null_rn = F.when(v.isNotNull(), F.col("__rn__"))
    df = (
        df.withColumn("__pv__", F.last(v, ignorenulls=True).over(w_back))
        .withColumn("__prn__", F.last(non_null_rn, ignorenulls=True).over(w_back))
        .withColumn("__nv__", F.first(v, ignorenulls=True).over(w_fwd))
        .withColumn("__nrn__", F.first(non_null_rn, ignorenulls=True).over(w_fwd))
    )
    interp = (
        F.when(v.isNotNull(), v)
        .when(F.col("__pv__").isNull(), F.col("__nv__"))  # rule=2 head
        .when(F.col("__nv__").isNull(), F.col("__pv__"))  # rule=2 tail
        .otherwise(
            F.col("__pv__")
            + (F.col("__nv__") - F.col("__pv__"))
            * (F.col("__rn__") - F.col("__prn__"))
            / (F.col("__nrn__") - F.col("__prn__"))
        )
    )
    return (
        df.withColumn("is_imputed", v.isNull() & interp.isNotNull())
        .withColumn(out_col, interp)
        .drop("__rn__", "__pv__", "__prn__", "__nv__", "__nrn__")
    )
