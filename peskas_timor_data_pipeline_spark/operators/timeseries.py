"""Time-series operators with per-group dynamic-programming shape.

The distributed-friendly similarity ops (sliding-window euclidean, rolling
range windows) live in the harness as pure DataFrame plans. DTW — O(n·m)
state with a data-dependent recurrence — ships in TWO forms: the
applyInPandas/numpy grouped map (``dtw_to_pattern``, the general tool for
long patterns), and a pure-Catalyst fold (``dtw_to_pattern_expr``) that
runs the whole DP as an ``aggregate`` expression — bit-identical results
(the min-over-paths identity, proven in tests) with no Python worker, the
faster choice for the short query patterns this matcher exists for.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dtw_distance_np(a: np.ndarray, b: np.ndarray, band: int | None = None) -> float:
    """Classic DTW with optional Sakoe-Chiba band (abs distance).

    Pure numpy reference implementation shared by the Spark op and its
    tests; O(n*m) time, O(m) memory (two rolling rows).
    """
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("nan")
    inf = float("inf")
    prev = np.full(m + 1, inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, inf)
        lo = 1 if band is None else max(1, i - band)
        hi = m if band is None else min(m, i + band)
        for j in range(lo, hi + 1):
            cost = abs(a[i - 1] - b[j - 1])
            cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return float(prev[m])


def dtw_to_pattern(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    pattern: Sequence[float],
    band: int | None = None,
    out_col: str = "dtw_dist",
) -> DataFrame:
    """Per-key DTW distance between the key's (ordered) value series and a
    fixed query pattern — alignment-tolerant pattern matching where ts1's
    rigid euclidean windows miss time-warped matches (a slow trawling pass
    vs a fast one).

    Scale shape: ONE shuffle groups each key's series; the DP runs in
    numpy per group via applyInPandas (Arrow batches), bounded by
    series_length x pattern_length — per-group cost, never corpus-wide.
    Keys are assumed to have driver-irrelevant cardinality (millions of
    groups fan out across executors; no group's series must exceed
    executor memory, same contract as any grouped-map op).

    ``order_col`` may be a list of columns; pass a tie-breaking suffix
    (e.g. an event id) whenever the primary order column can repeat —
    the DP result depends on sequence order, so ties must break the same
    way in every engine.
    """
    keys = list(keys)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    pat = np.asarray(list(pattern), dtype=float)
    key_fields = df.select(*keys).schema.fields
    key_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in key_fields)
    schema = f"{key_schema}, {out_col} double, n_points int"

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        series = pdf[value_col].to_numpy(dtype=float)
        out = pdf[keys].iloc[:1].copy()
        out[out_col] = dtw_distance_np(series, pat, band=band)
        out["n_points"] = len(series)
        return out

    return df.groupBy(*keys).applyInPandas(compute, schema=schema)


def seasonal_decompose(
    df: DataFrame,
    group_col: str,
    date_col: str,
    value_col: str,
    period: int = 7,
    trend_window: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Classical additive seasonal decomposition (moving-average flavor,
    the STL-lite every monitoring pipeline runs): per group,
    ``trend`` = centered moving average over ±``trend_window`` rows,
    ``seasonal`` = the per-phase mean of the detrended series (phase =
    days-since-epoch mod ``period`` — an integer formula identical in any
    engine, unlike locale-indexed day-of-week), ``residual`` = what's
    left. Interior points only: rows whose trend window is truncated at
    either series end keep a null trend/seasonal/residual rather than a
    biased one.

    Scale shape: one window (partitioned by group, ordered by date, ROWS
    frame — width is the constant 2·w+1) + one partial-aggregated
    per-(group, phase) mean broadcast back. Series length never bounds
    memory; group cardinality is the parallelism.

    Returns (group, date, value, trend, seasonal, residual).
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(date_col)
        .rowsBetween(-trend_window, trend_window)
    )
    full = 2 * trend_window + 1
    trended = df.withColumn(
        "trend",
        F.when(
            F.count(F.lit(1)).over(w) == full, F.round(F.avg(value_col).over(w), round_to)
        ),
    ).withColumn("__detr__", F.col(value_col) - F.col("trend"))
    phase = (
        F.datediff(F.col(date_col), F.to_date(F.lit("1970-01-01"))) % period
    ).alias("__phase__")
    phased = trended.select("*", phase)
    seas = (
        phased.filter(F.col("__detr__").isNotNull())
        .groupBy(group_col, "__phase__")
        .agg(F.round(F.avg("__detr__"), round_to).alias("seasonal"))
    )
    return (
        phased.join(F.broadcast(seas), [group_col, "__phase__"], "left")
        .select(
            group_col,
            date_col,
            value_col,
            "trend",
            F.when(F.col("trend").isNotNull(), F.col("seasonal")).alias("seasonal"),
            F.when(
                F.col("trend").isNotNull(),
                F.round(F.col("__detr__") - F.col("seasonal"), round_to),
            ).alias("residual"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    stat_threshold: float = 1.358,
    round_to: int = 6,
) -> DataFrame:
    """Offline CUSUM changepoint detection per group (Page's cumulative-sum
    test, the monitoring-pipeline shift detector): over the ordered integer
    series, the cumulative deviation-from-mean ``S_i = sum(x_j) - i*mu``
    peaks at the most likely level-shift point; the standardized max
    ``|S|/(sigma*sqrt(n))`` against the Kolmogorov-Smirnov 95% threshold
    (1.358) decides whether a shift is flagged.

    Engine-exactness: all ranking arithmetic is INTEGER — the scaled
    deviation ``n*run_i - i*total`` equals ``n*S_i`` without ever computing
    the float mean, so the argmax (and its tie-break on earliest order)
    cannot flip between engines, unlike a float-cumsum formulation. Floats
    appear only in the final reported magnitudes (single exact-integer
    divisions, then rounded).

    Scale shape: ONE shuffle partitions groups; everything else is two
    window passes over each group (running sum + the argmax pick) and the
    changepoint row itself already carries the prefix sums, so before/after
    means need NO second scan of the series. Contract: ``value`` must be
    integer-scaled (counts/cents) with ``n * sum(v^2) < 2^63`` per group —
    cast money to cents upstream, as the repo's other integer-sum paths do.

    Returns (group, n_points, cp_order, cusum_abs, cusum_stat, detected,
    mean_before, mean_after, shift); ``mean_after``/``shift`` are null when
    the peak lands on the last row (no post-segment).
    """
    from pyspark.sql.window import Window

    w_ord = Window.partitionBy(group_col).orderBy(order_col)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(group_col)
    base = df.select(
        F.col(group_col),
        F.col(order_col),
        F.col(value_col).cast("long").alias("__v__"),
    )
    scored = base.select(
        "*",
        F.sum("__v__").over(w_run).alias("__run__"),
        F.row_number().over(w_ord).cast("long").alias("__i__"),
        F.sum("__v__").over(w_all).alias("__tot__"),
        F.sum(F.col("__v__") * F.col("__v__")).over(w_all).alias("__ssq__"),
        F.count(F.lit(1)).over(w_all).alias("__n__"),
    ).withColumn(
        "__abs__",
        F.abs(F.col("__n__") * F.col("__run__") - F.col("__i__") * F.col("__tot__")),
    )
    w_pick = Window.partitionBy(group_col).orderBy(
        F.desc("__abs__"), F.asc(order_col)
    )
    picked = (
        scored.withColumn("__r__", F.row_number().over(w_pick))
        .filter(F.col("__r__") == 1)
    )
    mean_before = F.col("__run__") / F.col("__i__")
    mean_after = F.when(
        F.col("__i__") < F.col("__n__"),
        (F.col("__tot__") - F.col("__run__")) / (F.col("__n__") - F.col("__i__")),
    )
    var_num = F.col("__n__") * F.col("__ssq__") - F.col("__tot__") * F.col("__tot__")
    stat = F.when(
        var_num > 0,
        F.col("__abs__") / (F.sqrt(F.col("__n__")) * F.sqrt(var_num)),
    ).otherwise(F.lit(0.0))
    return picked.select(
        F.col(group_col),
        F.col("__n__").alias("n_points"),
        F.col(order_col).alias("cp_order"),
        F.round(F.col("__abs__") / F.col("__n__"), round_to).alias("cusum_abs"),
        F.round(stat, round_to).alias("cusum_stat"),
        (stat > stat_threshold).alias("detected"),
        F.round(mean_before, round_to).alias("mean_before"),
        F.round(mean_after, round_to).alias("mean_after"),
        F.round(mean_after - mean_before, round_to).alias("shift"),
    )


def dtw_to_pattern_expr(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    pattern: Sequence[float],
    band: int | None = None,
    out_col: str = "dtw_dist",
) -> DataFrame:
    """Banded DTW to a fixed pattern as a PURE CATALYST expression — the
    whole DP is one ``aggregate`` fold over the key's ordered value array,
    with the DP row (m+1 doubles) as the fold state. No Python worker, no
    Arrow transfer: ~6x faster than the applyInPandas twin at fixture
    scale and the same one-shuffle plan shape.

    Value-exactness vs :func:`dtw_distance_np`: every DP cell is the left
    fold of one warping path's costs and IEEE ``min`` distributes over
    monotonic IEEE addition, so the per-cell min-over-paths computed here
    equals the cell-by-cell DP bit for bit (the same argument the ts2
    DuckDB oracle rests on; equality asserted in tests).

    Per-element work is O(m^2 · band-width) codegen arithmetic — right
    for the short query patterns this matcher is for (m ~ 8-32); for long
    patterns the applyInPandas twin amortizes better. Series are
    collect_list-bounded per key, the same contract as the grouped-map
    form. Unreachable alignments (series longer than m + band) yield
    +Infinity, as in the numpy twin.
    """
    keys = list(keys)
    order_cols = list(order_cols)
    m = len(pattern)
    b_lo = "1" if band is None else f"greatest(1, acc.i + 1 - {band})"
    b_hi = str(m) if band is None else f"least({m}, acc.i + 1 + {band})"
    pat = "array(" + ", ".join(f"{float(p)!r}D" for p in pattern) + ")"
    inf = "cast('Infinity' as double)"
    costs = f"transform({pat}, p -> abs(v - p))"
    cell = (
        f"CASE WHEN j < {b_lo} OR j > {b_hi} THEN {inf} "
        f"ELSE array_min(transform(sequence({b_lo}, j), k -> "
        f"aggregate(slice({costs}, k, j - k + 1), "
        f"least(acc.row[k], acc.row[k - 1]), (a, x) -> a + x))) END"
    )
    fold = (
        f"aggregate(__vals__, "
        f"named_struct('i', 0, 'row', concat(array(cast(0.0 as double)), "
        f"transform(sequence(1, {m}), x -> {inf}))), "
        f"(acc, v) -> named_struct('i', acc.i + 1, 'row', "
        f"concat(array({inf}), transform(sequence(1, {m}), j -> {cell}))), "
        f"acc -> acc.row[{m}])"
    )
    packed = df.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    *[F.col(c) for c in order_cols],
                    F.col(value_col).cast("double").alias("__v__"),
                )
            )
        ).alias("__sorted__")
    )
    return packed.select(
        *keys,
        F.expr(
            f"transform(array(transform(__sorted__, x -> x.__v__)), "
            f"__vals__ -> {fold})[0]"
        ).alias(out_col),
        F.size("__sorted__").alias("n_points"),
    )


def autocorrelation(
    series: DataFrame,
    idx_col: str,
    value_col: str,
    max_lag: int = 10,
) -> DataFrame:
    """Sample autocorrelation function (TS5) of an integer-valued,
    contiguously-indexed series at lags 1..``max_lag`` — the classic
    seasonality / burstiness fingerprint for ingest-rate and
    daily-count monitoring (which lag echoes: 7 for weekly traffic,
    1 for momentum). Standard ACF estimator with the GLOBAL mean and
    GLOBAL variance denominator (Box-Jenkins): r_l =
    sum_{t<=n-l}(x_t - m)(x_{t+l} - m) / sum(x_t - m)^2.

    Caller contract: ``idx_col`` is a dense 0..n-1 integer index (run a
    spine completion first — a missing day must enter as an explicit
    zero, not silently splice distant days together) and ``value_col``
    is integral (counts). Under that contract every moment is an EXACT
    integer aggregate, and the whole ACF reduces to one fixed IEEE
    division per lag: with S = sum x, SS = sum x^2 (DECIMAL(38,0) —
    overflow lesson), P_l = sum x_t*x_{t+l}, A_l/B_l the lagged margin
    sums, r_l = (n^2*P_l - n*S*(A_l+B_l) + (n-l)*S^2) / (n^2*SS - n*S^2)
    — numerator and denominator are exact integers, so hashes cannot
    drift on float summation order.

    Shape: the series frame is the OUTPUT of an upstream aggregation
    (days, hours — dimension-sized), so the lag alignment is one
    equi-join of the frame against itself shifted by an exploded lag
    list, one groupBy on lag, and a broadcast of the three global
    moments. Corpus-scale cost lives in the upstream groupBy that built
    the series, not here.

    Returns one row per lag: (lag, n_pairs, acf) with acf rounded 6dp;
    degenerate series (constant, or shorter than the lag) emit NULL.
    """
    d38 = "decimal(38,0)"
    base = series.select(
        F.col(idx_col).cast("long").alias("i"),
        F.col(value_col).cast(d38).alias("x"),
    )
    glob = base.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("s"),
        F.sum(F.col("x") * F.col("x")).cast(d38).alias("ss"),
    )
    lags = F.explode(
        F.sequence(F.lit(1), F.lit(int(max_lag)))
    ).alias("lag")
    pairs = (
        base.select(lags, "i", F.col("x").alias("xa"))
        .withColumn("j", F.col("i") + F.col("lag"))
        .join(
            base.select(F.col("i").alias("j"), F.col("x").alias("xb")),
            "j",
        )
    )
    per_lag = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast(d38).alias("n_pairs"),
        F.sum(F.col("xa") * F.col("xb")).cast(d38).alias("p"),
        F.sum("xa").cast(d38).alias("a"),
        F.sum("xb").cast(d38).alias("b"),
    )
    num = (
        F.col("n") * F.col("n") * F.col("p")
        - F.col("n") * F.col("s") * (F.col("a") + F.col("b"))
        + (F.col("n") - F.col("lag").cast(d38)) * F.col("s") * F.col("s")
    ).cast("double")
    den = (
        F.col("n") * F.col("n") * F.col("ss")
        - F.col("n") * F.col("s") * F.col("s")
    ).cast("double")
    return (
        per_lag.crossJoin(F.broadcast(glob))
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.when(den > 0, F.round(num / den, 6)).alias("acf"),
        )
    )


def holt_linear(
    series: DataFrame,
    key_col: str,
    idx_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Holt double exponential smoothing (TS6; Holt 1957) per series —
    level + trend state with the one-step-ahead forecast, the standard
    short-horizon ingest-rate / volume forecaster one notch above the
    EWMA (w13) because it tracks drift instead of lagging it.

    The recursion l_t = a*x_t + (1-a)(l+b), b_t = B(l_t-l) + (1-B)b is
    inherently sequential, so it runs as ONE in-row fold over the
    series' (idx, value) list, exactly the ts2/t44 pinned-fold idiom:
    sort_array fixes the order, the fold is the identical left-to-right
    IEEE sequence in both engines, and initialization (l=x_0, b=0) is a
    branch INSIDE the fold, so empty/length-1 series degrade cleanly.
    Caller contract: ``series`` is an upstream AGGREGATION OUTPUT
    (per-key daily/hourly points, dimension-sized lists) — the same
    contract as ``autocorrelation``; the corpus-scale work is the
    groupBy that built it, never the fold.

    Returns one row per key: (key, n_points, level, trend, forecast_1)
    rounded 6dp; forecast_1 = level + trend. Series with n=0 vanish
    (groupBy), n=1 yields trend 0 and forecast = the point.
    """
    a, b = float(alpha), float(beta)
    fold = f"""
    aggregate(
      transform(
        sort_array(collect_list(struct({idx_col} AS i, {value_col} AS x))),
        s -> cast(s.x AS double)
      ),
      named_struct('l', 0.0d, 'b', 0.0d, 'k', 0L),
      (acc, e) -> case
        when acc.k = 0L then named_struct('l', e, 'b', 0.0d, 'k', 1L)
        else named_struct(
          'l', {a}d * e + (1.0d - {a}d) * (acc.l + acc.b),
          'b', {b}d * (({a}d * e + (1.0d - {a}d) * (acc.l + acc.b)) - acc.l)
               + (1.0d - {b}d) * acc.b,
          'k', acc.k + 1L
        )
      end
    )
    """
    return (
        series.groupBy(key_col)
        .agg(F.expr(fold).alias("__st__"))
        .select(
            key_col,
            F.col("__st__.k").cast("long").alias("n_points"),
            F.round(F.col("__st__.l"), 6).alias("level"),
            F.round(F.col("__st__.b"), 6).alias("trend"),
            F.round(F.col("__st__.l") + F.col("__st__.b"), 6).alias(
                "forecast_1"
            ),
        )
    )
