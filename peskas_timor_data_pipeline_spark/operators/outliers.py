"""Robust outlier detection (SURVEY.md A8/A9/M1/M3).

Reimplements univOutl::LocScaleB's published formula — median ± k·1.4826·MAD,
optionally in log1p space with exp(bound)-1 back-transform — as pure Spark
aggregates (R/validation-functions.R:243-280 wraps it as `alert_outlier`
with degenerate-case guards; grouped per (gear, species) at :303-341).

Exact medians are used (groups are small: per-species/gear slices); switch
``approx=True`` for percentile_approx on ungrouped 100 TB columns.

Also the single-regressor OLS + Cook's distance of the price check
(R/validation-functions.R:405-506) in closed form via aggregates — no MLlib,
no UDF: for y = a + b·x,
    b = Sxy/Sxx,  a = ȳ - b·x̄,  leverage hᵢ = 1/n + (xᵢ-x̄)²/Sxx,
    CookDᵢ = eᵢ²·hᵢ / (p·s²·(1-hᵢ)²),  s² = SSE/(n-2), p=2.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAD_CONSISTENCY = 1.4826  # normal-consistency constant, as in univOutl/stats::mad


def _median(col: Column, approx: bool) -> Column:
    return F.percentile_approx(col, 0.5, 100000) if approx else F.median(col)


def loc_scale_bounds(
    df: DataFrame,
    value: str,
    keys: Sequence[str] | None = None,
    k: float = 3.0,
    logt: bool = True,
    approx: bool = False,
) -> DataFrame:
    """Per-group (or global when ``keys`` empty) robust bounds table:
    (keys..., lower_bound, upper_bound, n_valid).

    logt=True computes bounds on log1p(value) and back-transforms with
    exp(b)-1, matching LocScaleB(logt=TRUE) as called by the reference.
    Degenerate guards (R/validation-functions.R:250-268): groups where all
    values are null/zero, or where MAD<=0, yield NULL bounds (=> no alert).
    """
    keys = list(keys or [])
    x = F.log1p(F.col(value)) if logt else F.col(value)
    df2 = df.withColumn("__x__", x)

    med = df2.groupBy(*keys).agg(
        _median(F.col("__x__"), approx).alias("__med__"),
        F.count(F.col("__x__")).alias("n_valid"),
        F.sum(F.when(F.col(value) != 0, 1).otherwise(0)).alias("__nonzero__"),
    )
    join_how = "inner" if keys else "cross"
    mad = (
        df2.join(med.select(*keys, "__med__"), on=keys, how=join_how)
        if keys
        else df2.crossJoin(med.select("__med__"))
    )
    mad = mad.groupBy(*keys).agg(
        _median(F.abs(F.col("__x__") - F.col("__med__")), approx).alias("__mad__")
    )
    bounds = (med.join(mad, on=keys) if keys else med.crossJoin(mad)).select(
        *keys,
        "n_valid",
        F.col("__med__"),
        (F.col("__med__") - k * MAD_CONSISTENCY * F.col("__mad__")).alias("__lo__"),
        (F.col("__med__") + k * MAD_CONSISTENCY * F.col("__mad__")).alias("__hi__"),
        F.col("__mad__"),
        F.col("__nonzero__"),
    )
    lo = F.expm1(F.col("__lo__")) if logt else F.col("__lo__")
    hi = F.expm1(F.col("__hi__")) if logt else F.col("__hi__")
    degenerate = (F.col("__nonzero__") == 0) | (F.col("__mad__") <= 0) | F.col("__mad__").isNull()
    return bounds.select(
        *keys,
        "n_valid",
        F.when(~degenerate, lo).alias("lower_bound"),
        F.when(~degenerate, hi).alias("upper_bound"),
    )


def mad_alert(
    df: DataFrame,
    value: str,
    keys: Sequence[str] | None = None,
    k: float = 3.0,
    logt: bool = True,
    alert_number: int = 11,
    alert_col: str = "alert_number",
) -> DataFrame:
    """Attach an alert column flagging values outside the robust bounds
    (`alert_outlier`, R/validation-functions.R:243-280): NULL = pass."""
    keys = list(keys or [])
    bounds = loc_scale_bounds(df, value, keys, k=k, logt=logt)
    joined = (
        df.join(F.broadcast(bounds), on=keys, how="left")
        if keys
        else df.crossJoin(F.broadcast(bounds))
    )
    out_of_bounds = (F.col(value) < F.col("lower_bound")) | (
        F.col(value) > F.col("upper_bound")
    )
    return joined.withColumn(
        alert_col, F.when(out_of_bounds, F.lit(alert_number))
    ).drop("n_valid", "lower_bound", "upper_bound")


def ols_cooks_distance(
    df: DataFrame, x: str, y: str, out_prefix: str = ""
) -> DataFrame:
    """Single-regressor OLS fit + per-row Cook's distance, closed form
    (M3, R/validation-functions.R:405-506: lm(log(price+1) ~ log(kg+1)),
    broom::augment .cooksd). Two aggregate passes, zero UDFs.

    Adds columns: {p}fitted, {p}resid, {p}leverage, {p}cooksd.
    Rows with null x/y pass through with null diagnostics.
    """
    p = out_prefix
    valid = F.col(x).isNotNull() & F.col(y).isNotNull()
    stats = df.filter(valid).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.avg(x).alias("__xbar__"),
        F.avg(y).alias("__ybar__"),
        F.sum(F.col(x) * F.col(x)).alias("__sxx_raw__"),
        F.sum(F.col(x) * F.col(y)).alias("__sxy_raw__"),
    )
    df1 = df.crossJoin(F.broadcast(stats))
    sxx = F.col("__sxx_raw__") - F.col("__n__") * F.col("__xbar__") ** 2
    sxy = F.col("__sxy_raw__") - F.col("__n__") * F.col("__xbar__") * F.col("__ybar__")
    slope = sxy / sxx
    intercept = F.col("__ybar__") - slope * F.col("__xbar__")
    fitted = intercept + slope * F.col(x)
    resid = F.col(y) - fitted
    df2 = (
        df1.withColumn(f"{p}fitted", F.when(valid, fitted))
        .withColumn(f"{p}resid", F.when(valid, resid))
        .withColumn("__sxx__", sxx)
    )
    sse = df2.agg(F.sum(F.col(f"{p}resid") ** 2).alias("__sse__"))
    df3 = df2.crossJoin(F.broadcast(sse))
    s2 = F.col("__sse__") / (F.col("__n__") - 2)
    leverage = 1 / F.col("__n__") + (F.col(x) - F.col("__xbar__")) ** 2 / F.col("__sxx__")
    cooks = (F.col(f"{p}resid") ** 2 * leverage) / (2 * s2 * (1 - leverage) ** 2)
    return (
        df3.withColumn(f"{p}leverage", F.when(valid, leverage))
        .withColumn(f"{p}cooksd", F.when(valid, cooks))
        .drop("__n__", "__xbar__", "__ybar__", "__sxx_raw__", "__sxy_raw__", "__sxx__", "__sse__")
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clamp values into the group's
    [P(lower), P(upper)] percentile band — the tail-taming preprocessing
    between raw outlier detection (MAD/LocScaleB above, which FLAG) and
    modeling (this REWRITES, keeping row count intact).

    Scale shape: the bounds frame is one partial-aggregated percentile per
    group (rows = group cardinality), broadcast back onto the data — the
    big table is never shuffled. Adds ``out_col`` (default
    ``<value>_wins``) plus ``__lo__``/``__hi__`` bound columns the caller
    may drop.
    """
    out_col = out_col or f"{value_col}_wins"
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(value_col, float(lower)).alias("__lo__"),
        F.percentile(value_col, float(upper)).alias("__hi__"),
    )
    joined = df.join(F.broadcast(bounds), list(group_cols))
    return joined.withColumn(
        out_col,
        F.least(F.greatest(F.col(value_col), F.col("__lo__")), F.col("__hi__")),
    )
