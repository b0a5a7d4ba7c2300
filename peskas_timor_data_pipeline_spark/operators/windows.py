"""Window operators (SURVEY.md §2.5, A5-A6, W1-W5).

Everything here is a Catalyst window function — single shuffle on the
partition key, then in-partition sort. At 100 TB the partition keys (boat,
imei, submission group) have bounded cardinality per key so no single
partition blows up; skewed keys are handled by AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top1_per_group(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """First row per group under an explicit ordering (W2; worst-alert
    selection `arrange(desc(alert_number)) + row_number()==1`,
    R/validation-functions.R:343-351)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def mode_per_group(
    df: DataFrame, keys: Sequence[str], value: str, out_col: str | None = None
) -> DataFrame:
    """Most frequent value per group, ties broken by the value itself for
    determinism (A5; most-frequent municipality per imei,
    R/estimate-catch.R:561-573)."""
    out_col = out_col or value
    counts = df.groupBy(*keys, value).agg(F.count(F.lit(1)).alias("__cnt__"))
    w = Window.partitionBy(*keys).orderBy(F.desc("__cnt__"), F.col(value))
    return (
        counts.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(*keys, F.col(value).alias(out_col))
    )


def sessionize(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    new_session: Column,
    session_col: str = "session_id",
) -> DataFrame:
    """Generic gap-based sessionization: a running sum over a boolean
    "this row starts a new session" column (A6 core,
    R/validate-pds-trips.R:242-308 — consecutive tracker trips with
    <3 h gap and <2 km end->start distance are merged into one session).

    ``new_session`` may reference lag/lead columns the caller prepared.
    NOTE the reference's one-step `lag(associated_to)` chains at most
    pairwise; use :func:`pairwise_merge_sessions` for exact parity and this
    full transitive closure for the (better-defined) scalable variant.
    """
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    flag = F.when(new_session, F.lit(0)).otherwise(F.lit(1))
    return df.withColumn(
        session_col,
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def with_gap_to_next(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    ts_end: str,
    ts_start: str,
    gap_col: str = "gap_seconds",
) -> DataFrame:
    """Seconds between this row's end and the next row's start within a
    partition (W1 lead pattern, R/validate-pds-trips.R:43-49)."""
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    nxt = F.lead(F.col(ts_start)).over(w)
    return df.withColumn(
        gap_col, F.unix_timestamp(nxt) - F.unix_timestamp(F.col(ts_end))
    )


def month_spine(
    spark,
    start: str = "2018-01-01",
    end: str | None = None,
    col_name: str = "landing_period",
) -> DataFrame:
    """Continuous month spine (W4, `get_frame` R/estimate-catch.R:534-546):
    one row per month from ``start`` to ``end`` (default: current date).
    Built with sequence+explode — no driver loop, parallelizable."""
    end_expr = f"to_date('{end}')" if end else "current_date()"
    return spark.range(1).select(
        F.explode(
            F.expr(f"sequence(to_date('{start}'), date_trunc('month', {end_expr})::date, interval 1 month)")
        ).alias(col_name)
    )


def group_share(
    df: DataFrame, keys: Sequence[str], value: str, out_col: str = "share"
) -> DataFrame:
    """Per-group normalized share value/sum(value) kept on rows (W3,
    `catch_taxa/sum(catch_taxa)` R/estimate-catch.R:593-603)."""
    w = Window.partitionBy(*keys)
    return df.withColumn(out_col, F.col(value) / F.sum(value).over(w))


def rolling_slope(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    window_rows: int = 7,
    out_col: str = "slope",
    round_to: int = 6,
) -> DataFrame:
    """Rolling OLS trend per group: over the trailing ``window_rows`` rows
    (ordered by ``x_col``), the least-squares slope
    ``(n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)`` — the monitoring-dashboard
    "is this metric drifting" primitive.

    Engine-exactness contract: ``x`` and ``y`` must be integer-scaled
    (days / counts / cents). All five running sums are then exact BIGINT
    window aggregates — no float summation-order surface — and the slope
    is one exact-integer division, rounded. Rows whose trailing frame is
    short (series head) report a null slope rather than a noisy one;
    a degenerate frame (all x equal) also yields null.

    Scale shape: ONE shuffle partitions groups, then a single constant-
    width ROWS window pass computes every sum in whole-stage codegen.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(x_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    x = F.col("__x__")
    y = F.col("__y__")
    base = df.select(
        "*",
        F.col(x_col).cast("long").alias("__x__"),
        F.col(y_col).cast("long").alias("__y__"),
    )
    sums = base.select(
        "*",
        F.count(F.lit(1)).over(w).alias("__cnt__"),
        F.sum(x).over(w).alias("__sx__"),
        F.sum(y).over(w).alias("__sy__"),
        F.sum(x * y).over(w).alias("__sxy__"),
        F.sum(x * x).over(w).alias("__sxx__"),
    )
    num = F.col("__cnt__") * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")
    den = F.col("__cnt__") * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")
    slope = F.when(
        (F.col("__cnt__") == window_rows) & (den != 0),
        F.round(num / den, round_to),
    )
    return sums.withColumn(out_col, slope).drop(
        "__x__", "__y__", "__cnt__", "__sx__", "__sy__", "__sxy__", "__sxx__"
    )


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    n_tiles: int,
    out_col: str,
) -> DataFrame:
    """Exact distributed ``ntile`` over a TOTAL order — standard SQL
    remainder semantics (first ``n mod k`` tiles one row larger) without
    ever moving the frame to one partition (the a30 bounded-axis escape,
    promoted to a reusable operator for VERDICT r08 ask #3).

    Two passes:

    1. ``repartitionByRange`` on the order columns — Spark's range
       exchange gives ascending, disjoint key ranges per partition — then
       a ``row_number`` window partitioned by the physical partition id
       computes each row's LOCAL rank (the pid hash exchange keeps each
       range bucket together; no global sort materializes).
    2. Per-bucket row counts (one row per partition — config-sized,
       never data-sized) get a cumulative-sum window on that bounded
       axis; global rank = bucket offset + local rank, and the tile is
       pure arithmetic on (rank, n, k).

    The order must be a total order (include a unique tie-break column)
    — otherwise rows with equal keys get an arbitrary but still
    deterministic-per-partitioning rank. Adds ``out_col`` (int 1..k);
    internal columns are dropped. The input lineage is evaluated once
    more per call (callers scoring several metrics should materialize
    the input first, as ``rfm_segments`` does).
    """
    order_by = list(order_by)
    parted = df.repartitionByRange(*order_by).withColumn(
        "__pid__", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid__").orderBy(*order_by)
    local = parted.withColumn(
        "__lr__", F.row_number().over(w_local).cast("long")
    )
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    # pin the partition ids: the counts aggregate and the join below both
    # re-read this frame, and a recompute could re-plan the range exchange
    local = materialize(local)
    counts = local.groupBy("__pid__").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt__")
    )
    # bounded-axis window: one row per shuffle partition, config-sized
    w_off = Window.orderBy("__pid__").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid__",
        F.coalesce(F.sum("__cnt__").over(w_off), F.lit(0))
        .cast("long")
        .alias("__off__"),
        F.sum("__cnt__").over(
            Window.orderBy("__pid__").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("__n__"),
    )
    k = F.lit(int(n_tiles)).cast("long")
    gr = F.col("__off__") + F.col("__lr__")  # 1-based global rank
    base = F.col("__n__").cast("long")
    q_sz = (base / k).cast("long")  # floor: non-negative -> truncation ok
    rem = base % k
    big = rem * (q_sz + F.lit(1))  # rows covered by the (q+1)-sized tiles
    tile = F.when(
        gr <= big, ((gr - 1) / (q_sz + F.lit(1))).cast("long") + F.lit(1)
    ).otherwise(rem + ((gr - big - 1) / q_sz).cast("long") + F.lit(1))
    return (
        local.join(F.broadcast(offsets), "__pid__")
        .withColumn(out_col, tile.cast("int"))
        .drop("__pid__", "__lr__", "__off__", "__n__")
    )
