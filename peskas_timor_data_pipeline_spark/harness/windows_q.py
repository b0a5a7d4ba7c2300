"""Window operators (SURVEY.md §2.5 W1-W5) with DuckDB oracle twins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from peskas_timor_data_pipeline_spark.harness.tables import (
    exact_avg, exact_avg_sql, exact_sum, exact_sum_sql, load,
)
from peskas_timor_data_pipeline_spark.operators.windows import (
    group_share,
    top1_per_group,
    with_gap_to_next,
)


# --- W1: lead/lag over partition (inter-trip gap) ----------------------------

def w1_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    gapped = with_gap_to_next(
        ev.select("user_id", "event_id", "ts"),
        ["user_id"],
        "ts",
        ts_end="ts",
        ts_start="ts",
    )
    return gapped.groupBy("user_id").agg(
        F.count("gap_seconds").alias("n_gaps"),
        F.round(F.avg("gap_seconds"), 6).alias("avg_gap_s"),
        F.max("gap_seconds").alias("max_gap_s"),
    )


# NB unix_timestamp truncates to whole seconds; epoch() in DuckDB keeps
# microseconds — the oracle floors both ends the same way.
W1_ORACLE = """
WITH gapped AS (
  SELECT user_id,
         floor(epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts)))
         - floor(epoch(ts)) AS gap_seconds
  FROM events
)
SELECT user_id, count(gap_seconds) AS n_gaps,
       round(avg(gap_seconds), 6) AS avg_gap_s,
       CAST(max(gap_seconds) AS BIGINT) AS max_gap_s
FROM gapped GROUP BY user_id
"""


# --- W2: top-1 per group under explicit ordering ------------------------------

def w2_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return top1_per_group(
        orders, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")]
    ).select("o_custkey", "o_orderkey", "o_totalprice")


W2_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
"""


# --- W3: per-group normalized shares kept on rows ------------------------------

def w3_group_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    shared = group_share(rev, ["n_name"], "rev", "share")
    return shared.select(
        "n_name", "s_suppkey", F.round("rev", 0).alias("rev"), F.round("share", 6).alias("share")
    )


W3_ORACLE = """
WITH rev AS (
  SELECT n_name, s_suppkey,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, s_suppkey
)
SELECT n_name, s_suppkey, round(rev, 0) AS rev,
       round(rev / sum(rev) OVER (PARTITION BY n_name), 6) AS share
FROM rev
"""


# --- W4: month-spine completion --------------------------------------------------

def w4_spine_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("period")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    bounds = orders.agg(
        F.min(F.trunc(F.to_date("o_orderdate"), "month")).alias("lo"),
        F.max(F.trunc(F.to_date("o_orderdate"), "month")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 month)")).alias("period")
    )
    return (
        spine.join(monthly, "period", "left")
        .fillna(0, subset=["n_orders"])
        .withColumn("is_imputed", F.col("n_orders") == 0)
    )


W4_ORACLE = """
WITH bounds AS (
  SELECT CAST(min(date_trunc('month', o_orderdate)) AS DATE) lo,
         CAST(max(date_trunc('month', o_orderdate)) AS DATE) hi
  FROM orders
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS period FROM bounds
), monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS period, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT period, coalesce(n_orders, 0) AS n_orders,
       coalesce(n_orders, 0) = 0 AS is_imputed
FROM spine LEFT JOIN monthly USING (period)
"""


# --- W5: current-period proration with lead ----------------------------------------

def w5_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # value * elapsed/period_length using lead(period) and a fixed "as-of"
    # date (the reference uses today(); fixed here for determinism).
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("period")
    ).agg(exact_sum("o_totalprice", 100, 0).alias("value"))
    w = Window.orderBy("period")
    as_of = F.lit("2001-06-15").cast("date")
    with_next = monthly.withColumn("next_period", F.lead("period").over(w))
    return with_next.select(
        "period",
        "value",
        F.when(
            F.col("next_period").isNotNull() | (F.datediff(as_of, F.col("period")) < 0),
            F.col("value"),
        )
        .otherwise(
            F.round(
                F.col("value")
                * F.datediff(as_of, F.col("period"))
                / F.datediff(F.add_months(F.col("period"), 1), F.col("period")),
                6,
            )
        )
        .alias("prorated_value"),
    )


W5_ORACLE = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS period,
         {exact_sum_sql('o_totalprice', 100, 0)} AS value
  FROM orders GROUP BY 1
), with_next AS (
  SELECT *, lead(period) OVER (ORDER BY period) AS next_period FROM monthly
)
SELECT period, value,
       CASE WHEN next_period IS NOT NULL OR date_diff('day', period, DATE '2001-06-15') < 0
            THEN value
            ELSE round(value * date_diff('day', period, DATE '2001-06-15')
                 / date_diff('day', period, period + INTERVAL 1 MONTH), 6)
       END AS prorated_value
FROM with_next
"""


QUERIES = {
    "w1_lead_lag": (w1_lead_lag, W1_ORACLE),
    "w2_top1_per_group": (w2_top1_per_group, W2_ORACLE),
    "w3_group_share": (w3_group_share, W3_ORACLE),
    "w4_spine_completion": (w4_spine_completion, W4_ORACLE),
    "w5_proration": (w5_proration, W5_ORACLE),
}


# --- W6: time-grain downsampling with deterministic first ---------------------------

def w6_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 1 s -> 1 min GPS downsample shape
    (R/merge-trips.R:135-151) on events: per (user, minute) keep the
    earliest event's value (deterministic first via min(struct)) and the
    mean value. One shuffle; partial aggregation does the 60x reduction
    map-side."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy(
        # date_trunc coerces TIMESTAMP_NTZ back to TimestampType (OS-TZ
        # rendering leak at collect); re-cast under the pinned-UTC session
        "user_id",
        F.date_trunc("minute", F.col("ts")).cast("timestamp_ntz").alias("minute"),
    ).agg(
        F.min(F.struct("ts", "event_id", "value")).alias("__first__"),
        exact_avg("value", 10000).alias("mean_value"),
        F.count(F.lit(1)).alias("n_fixes"),
    )
    return agg.select(
        "user_id",
        "minute",
        F.col("__first__.event_id").alias("first_event_id"),
        F.round(F.col("__first__.value"), 6).alias("first_value"),
        "mean_value",
        "n_fixes",
    )


W6_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, date_trunc('minute', ts) AS minute, event_id, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('minute', ts)
                            ORDER BY ts, event_id) AS rn
  FROM events
), firsts AS (
  SELECT user_id, minute, event_id AS first_event_id,
         round(value, 6) AS first_value
  FROM ranked WHERE rn = 1
), means AS (
  SELECT user_id, date_trunc('minute', ts) AS minute,
         {exact_avg_sql('value', 10000)} AS mean_value, count(*) AS n_fixes
  FROM events GROUP BY 1, 2
)
SELECT user_id, minute, first_event_id, first_value, mean_value, n_fixes
FROM firsts JOIN means USING (user_id, minute)
"""

QUERIES["w6_downsample"] = (w6_downsample, W6_ORACLE)


# --- W7: rolling event-time range window --------------------------------------------

def w7_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour sum/count over event time via a
    rangeBetween frame on epoch seconds — the event-time rolling metric
    (rate limiting, burst detection, trailing revenue) that row-based
    frames get WRONG under irregular event spacing. One shuffle on the
    partition key; the frame scan is sort-local within each user."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("rolling_value_1h"),
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
    )


W7_ORACLE = """
SELECT user_id, event_id,
       round(sum(value) OVER w, 6) AS rolling_value_1h,
       count(*) OVER w AS n_events_1h
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (
  PARTITION BY user_id
  ORDER BY epoch(ts)
  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
)
"""

QUERIES["w7_rolling_range"] = (w7_rolling_range, W7_ORACLE)


# --- TS1: time-series subsequence similarity search ---------------------------------

TS_W = 8  # subsequence length
TS_PATTERN = [100.0, 200.0, 300.0, 400.0, 400.0, 300.0, 200.0, 100.0]  # spike shape


def ts1_subsequence_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per-user event-value subsequences closest (euclidean) to a
    query pattern — the distributed form of time-series similarity search
    (pattern scan over sensor/track streams, e.g. 'trips whose speed
    profile looks like trawling').

    Scale shape: sliding windows materialize per row via collect_list
    over a ROWS frame (sort-local within each user after ONE shuffle);
    the distance is a fixed-length fold entirely in codegen against the
    broadcast-literal pattern; top-k is TakeOrderedAndProject, not a
    global sort. The window array length is the pattern length — state
    per row is w doubles, independent of series length."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-(TS_W - 1), 0)
    )
    pat = ", ".join(f"{v!r}D" for v in TS_PATTERN)
    dist = F.expr(
        f"round(sqrt(aggregate(zip_with(win, array({pat}),"
        f" (x, y) -> (x - y) * (x - y)), 0D, (a, e) -> a + e)), 6)"
    )
    return (
        ev.select(
            "user_id", "event_id",
            F.collect_list("value").over(w).alias("win"),
        )
        .filter(F.size("win") == TS_W)
        .select("user_id", "event_id", dist.alias("dist"))
        .orderBy(F.col("dist").asc(), F.col("user_id").asc(), F.col("event_id").asc())
        .limit(10)
    )


_TS_PAT_SQL = "[" + ", ".join(str(v) for v in TS_PATTERN) + "]"

TS1_ORACLE = f"""
WITH wins AS (
  SELECT user_id, event_id,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {TS_W - 1} PRECEDING AND CURRENT ROW
         ) AS win
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id,
       round(sqrt(list_sum(list_transform(win,
             (x, i) -> (x - {_TS_PAT_SQL}[i]) * (x - {_TS_PAT_SQL}[i])))), 6) AS dist
FROM wins
WHERE len(win) = {TS_W}
ORDER BY dist, user_id, event_id
LIMIT 10
"""

QUERIES["ts1_subsequence_search"] = (ts1_subsequence_search, TS1_ORACLE)


# --- TS2: DTW pattern alignment (applyInPandas DP; recursive-CTE oracle) --------------

def ts2_dtw_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user DTW distance to the ts1 spike pattern — alignment-tolerant
    matching where ts1's rigid windows miss time-warped instances. The DP
    runs as a PURE CATALYST fold (dtw_to_pattern_expr — no Python worker;
    bit-equal to the applyInPandas/numpy twin by the min-over-paths
    identity, asserted in tests and ~6x faster at fixture scale); the
    oracle replays the same DP as a recursive CTE (see TS2_ORACLE). Series
    longer than m + band have no in-band warping path (classic Sakoe-Chiba
    on a rectangular matrix) — the DP reports +inf; both engines surface
    that as NULL so the output stays driver-hashable."""
    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        dtw_to_pattern_expr,
    )

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    out = dtw_to_pattern_expr(
        ev.select("user_id", "ts", "event_id", "value"),
        ["user_id"], ["ts", "event_id"], "value", TS_PATTERN, band=16,
    )
    finite = F.when(
        F.col("dtw_dist") < F.lit(float("inf")), F.round("dtw_dist", 6)
    )
    return out.select("user_id", finite.alias("dtw_dist"), "n_points")


# The oracle replays the numpy DP exactly. Correctness of the rewrite:
# every DP cell value cur[j] is the left-fold  ((min(prev_k) + c_k) + ...)
# + c_j  of exactly one warping path's costs, and IEEE min distributes
# over (monotonic) IEEE addition, so  min over path-candidates == the
# cell-by-cell DP, bit for bit — no float tolerance needed beyond the
# same round(_, 6) both engines apply.  The recursion carries one DP row
# (m+1 doubles, positions 1..m+1 = pattern indices 0..m) per user per
# series row; the Sakoe-Chiba band (|i-j| <= 16) infs out-of-band cells,
# identical to operators/timeseries.py::dtw_distance_np.
_TS2_PAT = "[" + ", ".join(str(v) for v in TS_PATTERN) + "]::DOUBLE[]"
_TS2_M = len(TS_PATTERN)

TS2_ORACLE = f"""
WITH RECURSIVE ser AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         CAST(value AS DOUBLE) AS v,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE event_type = 'purchase'
), dp AS (
  SELECT user_id, n, 0 AS i,
         list_prepend(0.0::DOUBLE,
           list_transform(generate_series(1, {_TS2_M}), x -> 'Infinity'::DOUBLE)) AS prev
  FROM (SELECT DISTINCT user_id, n FROM ser)
  UNION ALL
  SELECT d.user_id, d.n, s.i,
         list_prepend('Infinity'::DOUBLE,
           list_transform(generate_series(1, {_TS2_M}), j ->
             CASE WHEN j < greatest(1, s.i - 16) OR j > least({_TS2_M}, s.i + 16)
                  THEN 'Infinity'::DOUBLE
                  ELSE list_min(list_transform(generate_series(greatest(1, s.i - 16), j), k ->
                         list_reduce(
                           list_prepend(least(d.prev[k + 1], d.prev[k]),
                             list_slice(list_transform({_TS2_PAT}, p -> abs(s.v - p)), k, j)),
                           (a, x) -> a + x)))
             END)) AS prev
  FROM dp d JOIN ser s ON s.user_id = d.user_id AND s.i = d.i + 1
)
SELECT user_id,
       CASE WHEN isfinite(prev[{_TS2_M + 1}]) THEN round(prev[{_TS2_M + 1}], 6) END AS dtw_dist,
       CAST(n AS INTEGER) AS n_points
FROM dp WHERE i = n
"""

QUERIES["ts2_dtw_alignment"] = (ts2_dtw_alignment, TS2_ORACLE)


# --- W8: cumulative distinct users (first-appearance rewrite) --------------------------

def w8_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of distinct users ever seen, per day. The naive form
    (COUNT(DISTINCT) over an expanding window) re-scans the whole prefix
    per day — O(days x rows). Rewrite: a user contributes exactly once, on
    their FIRST day — so cumulative distinct = cumulative sum of
    first-appearance counts: one groupBy(user) for first days, one tiny
    per-day count, one cumsum over the day spine. All partial-aggregated;
    the expanding window runs over #days rows, not #events.

    Types are pinned to long/BIGINT on BOTH sides: DuckDB's sum(BIGINT)
    promotes to HUGEINT (int128), and round 2's driver run recorded a
    hash mismatch (rows/schema green) consistent with the canonicalizer
    stringifying HUGEINT differently from Spark's long — the only oracle
    in the repo whose integer window-sum wasn't CAST back to BIGINT."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    per_day = first_day.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    # complete against the spine of days that actually have events, so days
    # with no NEW users still appear with their running total
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        days.join(per_day, "day", "left")
        .fillna(0, subset=["new_users"])
        .withColumn("cum_distinct_users", F.sum("new_users").over(w).cast("long"))
        .select("day", F.col("new_users").cast("long").alias("new_users"),
                "cum_distinct_users")
    )


W8_ORACLE = """
WITH fd AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
), per_day AS (
  SELECT day, count(*) AS new_users FROM fd GROUP BY day
), days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
)
SELECT d.day, CAST(coalesce(p.new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(coalesce(p.new_users, 0)) OVER (ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_distinct_users
FROM days d LEFT JOIN per_day p USING (day)
"""

QUERIES["w8_cumulative_distinct"] = (w8_cumulative_distinct, W8_ORACLE)


# --- TS3: classical seasonal decomposition ----------------------------------------------

def ts3_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive decomposition of the daily per-event-type value series:
    ±3-row centered moving-average trend (interior points only), weekly
    seasonal means on the integer days-since-epoch phase, residual. Daily
    sums are rounded BEFORE the windows so every downstream float op sees
    identical inputs in both engines; the trend average then sums the
    frame in the same order on both sides."""
    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("value"))
    return seasonal_decompose(
        daily, "event_type", "day", "value", period=7, trend_window=3
    )


TS3_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, round(sum(value), 6) AS value
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), tr AS (
  SELECT event_type, day, value,
         CASE WHEN count(*) OVER w = 7
              THEN round(avg(value) OVER w, 6) END AS trend
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT event_type, day, value, trend, value - trend AS detr,
         (day - DATE '1970-01-01') % 7 AS phase
  FROM tr
), seas AS (
  SELECT event_type, phase, round(avg(detr), 6) AS seasonal
  FROM det WHERE detr IS NOT NULL GROUP BY event_type, phase
)
SELECT t.event_type, t.day, t.value, t.trend,
       CASE WHEN t.trend IS NOT NULL THEN s.seasonal END AS seasonal,
       CASE WHEN t.trend IS NOT NULL
            THEN round(t.detr - s.seasonal, 6) END AS residual
FROM det t LEFT JOIN seas s
  ON t.event_type = s.event_type AND t.phase = s.phase
"""

QUERIES["ts3_seasonal_decompose"] = (ts3_seasonal_decompose, TS3_ORACLE)


def ts4_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection on the daily event-count series per
    event type. The ranking statistic is pure integer arithmetic
    (n*run - i*tot = n*S_i), so the argmax position is engine-exact; the
    oracle rebuilds the full scaled-deviation walk and the standardized
    threshold decision."""
    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        cusum_changepoint,
    )

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    out = cusum_changepoint(daily, "event_type", "day", "n_events")
    return out.withColumnRenamed("cp_order", "cp_date")


TS4_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), scored AS (
  SELECT event_type, day, v,
         CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
         CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
         CAST(sum(v * v) OVER (PARTITION BY event_type) AS BIGINT) AS ssq,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
), dev AS (
  SELECT *, abs(n * run - i * tot) AS sabs FROM scored
), picked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY sabs DESC, day) AS r
  FROM dev
)
SELECT event_type,
       n AS n_points,
       day AS cp_date,
       round(sabs / CAST(n AS DOUBLE), 6) AS cusum_abs,
       round(CASE WHEN n * ssq - tot * tot > 0
                  THEN sabs / (sqrt(CAST(n AS DOUBLE))
                               * sqrt(CAST(n * ssq - tot * tot AS DOUBLE)))
                  ELSE 0.0 END, 6) AS cusum_stat,
       (CASE WHEN n * ssq - tot * tot > 0
             THEN sabs / (sqrt(CAST(n AS DOUBLE))
                          * sqrt(CAST(n * ssq - tot * tot AS DOUBLE)))
             ELSE 0.0 END) > 1.358 AS detected,
       round(run / CAST(i AS DOUBLE), 6) AS mean_before,
       round(CASE WHEN i < n THEN (tot - run) / CAST(n - i AS DOUBLE) END, 6)
         AS mean_after,
       round(CASE WHEN i < n THEN (tot - run) / CAST(n - i AS DOUBLE) END
             - run / CAST(i AS DOUBLE), 6) AS shift
FROM picked WHERE r = 1
"""

QUERIES["ts4_cusum_changepoint"] = (ts4_cusum_changepoint, TS4_ORACLE)


def w9_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day OLS slope of the daily event-count series per event
    type (the drift gauge). x = integer days-since-epoch, y = integer
    counts, so all five window sums are exact BIGINTs and the slope is one
    exact division — no float-order surface anywhere."""
    from peskas_timor_data_pipeline_spark.operators.windows import rolling_slope

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    daily = daily.withColumn(
        "x", F.datediff(F.col("day"), F.to_date(F.lit("1970-01-01"))).cast("long")
    )
    out = rolling_slope(daily, "event_type", "x", "n_events", window_rows=7)
    return out.select("event_type", "day", "n_events", "slope")


W9_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), sums AS (
  SELECT event_type, day, n_events,
         CAST(count(*) OVER w AS BIGINT) AS cnt,
         CAST(sum(x) OVER w AS BIGINT) AS sx,
         CAST(sum(n_events) OVER w AS BIGINT) AS sy,
         CAST(sum(x * n_events) OVER w AS BIGINT) AS sxy,
         CAST(sum(x * x) OVER w AS BIGINT) AS sxx
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, n_events,
       CASE WHEN cnt = 7 AND cnt * sxx - sx * sx <> 0
            THEN round((cnt * sxy - sx * sy) / CAST(cnt * sxx - sx * sx AS DOUBLE), 6)
       END AS slope
FROM sums
"""

QUERIES["w9_rolling_slope"] = (w9_rolling_slope, W9_ORACLE)


def w10_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: per user
    (ordered by ts with event_id as the deterministic tie-break), count
    consecutive event-type pairs and normalize per source state. Counts
    are integer; each probability is one exact division."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__prev__", F.lag("event_type").over(w))
        .filter(F.col("__prev__").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("__prev__").alias("prev_type"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type", "event_type", "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("prob"),
    )


W10_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), counts AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
         AS prob
FROM counts
"""

QUERIES["w10_event_transitions"] = (w10_event_transitions, W10_ORACLE)


def w11_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day. A rolling COUNT
    DISTINCT window would rescan each 7-day suffix per row; instead each
    distinct (user, day) activation is exploded to the <=7 future days it
    keeps the user 'weekly active' on, and WAU becomes a plain
    partial-aggregated distinct count per day — the banned O(days x rows)
    window rewritten as a bounded 7x row expansion. Days with no events
    simply don't appear (spine completion is w4's job)."""
    ev = load(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    dau = active.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    span = active.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("day"),
    ).distinct()
    wau = span.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day", "dau", "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


W11_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY day
), span AS (
  SELECT DISTINCT user_id, day + CAST(o AS INTEGER) AS day
  FROM active, unnest(generate_series(0, 6)) AS u(o)
), wau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS wau FROM span GROUP BY day
)
SELECT d.day, d.dau, w.wau, round(d.dau / CAST(w.wau AS DOUBLE), 6) AS stickiness
FROM dau d JOIN wau w ON d.day = w.day
"""

QUERIES["w11_rolling_active_users"] = (w11_rolling_active_users, W11_ORACLE)


def w12_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session paths: 30-minute-gap sessionization per user (the A6
    running-sum machinery), then each session's first 5 event types in
    (ts, event_id) order joined into a path string, counted and ranked.
    The per-session collect is bounded by the session definition itself
    (a 30-min-gap session has bounded events), so the sort_array stays
    KB-scale — the one place a collect_list is contractually safe."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional seconds (= DuckDB epoch()), not the floored unix_timestamp
    gap = (
        F.col("ts").cast("timestamp").cast("double")
        - F.lag("ts").over(w).cast("timestamp").cast("double")
    )
    flagged = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "__new__", (gap.isNull()) | (gap > 1800)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum(F.when(F.col("__new__"), 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    1, 5,
                ),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    top = counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(10)
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.withColumn("rank", F.row_number().over(wr).cast("int")).select(
        "rank", "path", "n_sessions"
    )


W12_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS newf
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS MATERIALIZED (
  SELECT *, CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_id
  FROM flagged
), ordered AS (
  SELECT user_id, session_id, event_type,
         row_number() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts, event_id) AS rn
  FROM sess
), paths AS MATERIALIZED (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ordered WHERE rn <= 5
  GROUP BY user_id, session_id
), counts AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM paths GROUP BY path
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rank
  FROM counts
)
SELECT CAST(rank AS INTEGER) AS rank, path, n_sessions
FROM ranked WHERE rank <= 10
"""

QUERIES["w12_session_paths"] = (w12_session_paths, W12_ORACLE)


# --- W13: exponentially weighted moving average -----------------------------------------

def w13_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha = 0.2) of purchase values over the last 16
    events — the smoothing primitive behind anomaly baselines and rate
    limiters. The recurrence is a LEFT FOLD over a constant-width ROWS
    window (collect_list preserves frame order): state per row is 16
    doubles, independent of series length, and the fold order is pinned
    identically in DuckDB's list_reduce, so the float path is
    bit-identical — no recursion, no applyInPandas.

    A true infinite-history EWMA is a sessionized streaming op
    (applyInPandasWithState territory); the bounded-window form is the
    batch-exact variant whose weights differ by at most 0.8^16 ~ 2.8%
    of total mass."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-15, 0)
    )
    ewma = F.expr(
        "round(aggregate(slice(__win__, 2, size(__win__) - 1), "
        "element_at(__win__, 1), "
        "(acc, x) -> cast(0.2 as double) * x + cast(0.8 as double) * acc), 6)"
    )
    return (
        ev.select(
            "user_id", "event_id",
            F.collect_list("value").over(w).alias("__win__"),
        )
        .select("user_id", "event_id", ewma.alias("ewma"))
    )


W13_ORACLE = """
WITH wins AS (
  SELECT user_id, event_id,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW
         ) AS win
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id,
       round(list_reduce(win,
             (acc, x) -> 0.2::DOUBLE * x + 0.8::DOUBLE * acc), 6) AS ewma
FROM wins
"""

QUERIES["w13_ewma"] = (w13_ewma, W13_ORACLE)


# --- W15: OHLC bucket downsampling ------------------------------------------------------

def w15_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open/high/low/close per (user, day) over purchase values — the
    candlestick compaction every monitoring/market pipeline runs. open
    and close are deterministic min_by/max_by on the FULL (ts, event_id)
    event identity (ties cannot flip between engines); one shuffle, all
    partial-aggregated — no window, no sort."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # Spark's min_by/max_by order structs lexicographically — a (micros,
    # event_id) struct is the same total order as the oracle's zero-padded
    # string key (DuckDB's min_by takes scalar keys only, so IT keeps the
    # printf key) without a per-row format_string allocation
    key = F.struct(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_id").alias("eid"),
    )
    return (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id", "day",
            F.round("open", 6).alias("open"), "high", "low",
            F.round("close", 6).alias("close"), "n_events",
        )
    )


W15_ORACLE = """
SELECT user_id, CAST(ts AS DATE) AS day,
       round(min_by(value, printf('%020d#%012d', epoch_us(ts), event_id)), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(max_by(value, printf('%020d#%012d', epoch_us(ts), event_id)), 6) AS close,
       count(*) AS n_events
FROM events WHERE event_type = 'purchase'
GROUP BY user_id, CAST(ts AS DATE)
"""

QUERIES["w15_ohlc"] = (w15_ohlc, W15_ORACLE)


# --- W16: interval union (merged-overlap coverage time) ---------------------------------

def w16_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total COVERED time per user when every event opens a 10-minute
    activity interval: merge overlapping intervals (the classic
    union-of-intervals sweep) and sum the merged spans — 'time on site'
    semantics, where summing raw durations would double-count overlaps.

    Sweep = two windows over integer MICROSECONDS (engine-exact): an
    island starts where the interval's start exceeds the running max of
    prior ends; island id = running sum of starts; each island's span is
    max(end) - min(start). One shuffle on user_id; ROWS frames only."""
    from pyspark.sql.window import Window

    span_us = 600 * 1_000_000
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(span_us)).alias("e"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy("user_id", "island").agg(
        F.min("s").alias("is_"), F.max("e").alias("ie")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.expr("sum(ie - is_) div 1000000L").alias("covered_seconds"),
    )


W16_ORACLE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), islands0 AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), islands AS (
  SELECT user_id, island, min(s) AS is_, max(e) AS ie
  FROM islands0 GROUP BY user_id, island
)
SELECT user_id, count(*) AS n_islands,
       CAST(sum(ie - is_) // 1000000 AS BIGINT) AS covered_seconds
FROM islands GROUP BY user_id
"""

QUERIES["w16_interval_union"] = (w16_interval_union, W16_ORACLE)


# --- TS5: autocorrelation function --------------------------------------------------------

def ts5_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample ACF at lags 1..10 (operators/timeseries.py::
    autocorrelation) of the daily event-count series, spine-completed so
    missing days enter as explicit zeros and lag alignment is positional
    truth. Every moment is an exact DECIMAL(38,0) aggregate; each lag's
    r is one integer-ratio division."""
    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        autocorrelation,
    )

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    bounds = daily.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.lit(0), F.datediff(F.col("d1"), F.col("d0")))
        ).alias("i"),
        "d0",
    )
    series = (
        spine.join(
            daily.crossJoin(F.broadcast(bounds)).select(
                F.datediff(F.col("d"), F.col("d0")).alias("i"),
                "x",
            ),
            "i",
            "left",
        )
        .select("i", F.coalesce("x", F.lit(0)).alias("x"))
    )
    return autocorrelation(series, "i", "x", max_lag=10)


TS5_ORACLE = """
WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY CAST(ts AS DATE)
), bounds AS (
  SELECT min(d) AS d0, max(d) AS d1 FROM daily
), spine AS (
  SELECT unnest(generate_series(0,
           (SELECT date_diff('day', d0, d1) FROM bounds), 1)) AS i
), series AS MATERIALIZED (
  SELECT CAST(s.i AS BIGINT) AS i, CAST(COALESCE(dl.x, 0) AS HUGEINT) AS x
  FROM spine s
  LEFT JOIN (
    SELECT date_diff('day', b.d0, d) AS i, x FROM daily CROSS JOIN bounds b
  ) dl USING (i)
), gmom AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s, sum(x * x) AS ss
  FROM series
), lags AS (
  SELECT unnest(generate_series(1, 10, 1)) AS lag
), pairs AS (
  SELECT l.lag, a.x AS xa, b.x AS xb
  FROM lags l
  JOIN series a ON TRUE
  JOIN series b ON b.i = a.i + l.lag
), per AS MATERIALIZED (
  SELECT lag, CAST(count(*) AS HUGEINT) AS np,
         sum(xa * xb) AS p, sum(xa) AS a, sum(xb) AS b
  FROM pairs GROUP BY lag
), calc AS (
  SELECT lag, np,
         CAST(g.n * g.n * per.p - g.n * g.s * (per.a + per.b)
              + (g.n - CAST(lag AS HUGEINT)) * g.s * g.s AS DOUBLE) AS num,
         CAST(g.n * g.n * g.ss - g.n * g.s * g.s AS DOUBLE) AS den
  FROM per CROSS JOIN gmom g
)
SELECT CAST(lag AS INTEGER) AS lag, CAST(np AS BIGINT) AS n_pairs,
       CASE WHEN den > 0 THEN round(num / den, 6) END AS acf
FROM calc
"""

QUERIES["ts5_acf"] = (ts5_acf, TS5_ORACLE)


# --- W17: multi-touch attribution ---------------------------------------------------------

def w17_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch + linear conversion attribution (operators/funnel.py::
    multi_touch_attribution): purchases are conversions, the window is
    the run of a user's events since their previous purchase, channels
    are event types. Linear credit rounds to micro-units per touch
    before the BIGINT sum; ordering ties break on event_id."""
    from peskas_timor_data_pipeline_spark.operators.funnel import (
        multi_touch_attribution,
    )

    e = load(spark, sf_dir, "events")
    return multi_touch_attribution(
        e.select("user_id", "ts", "event_id", "event_type"),
        "user_id",
        ["ts", "event_id"],
        "event_type",
        "purchase",
    )


W17_ORACLE = """
WITH tagged AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM events
), touches AS (
  SELECT user_id, cum AS seg, ts, event_id, event_type
  FROM tagged WHERE c = 0
), convs AS (
  SELECT user_id, cum - 1 AS seg FROM tagged WHERE c = 1
), closed AS MATERIALIZED (
  SELECT t.* FROM touches t
  WHERE EXISTS (SELECT 1 FROM convs c
                WHERE c.user_id = t.user_id AND c.seg = t.seg)
), scored AS (
  SELECT event_type AS channel,
         CASE WHEN row_number() OVER (PARTITION BY user_id, seg
                                      ORDER BY ts DESC, event_id DESC) = 1
              THEN 1 ELSE 0 END AS last_t,
         CAST(floor(1000000.0
                    / count(*) OVER (PARTITION BY user_id, seg)
                    + 0.5) AS BIGINT) AS lin
  FROM closed
)
SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(last_t) AS BIGINT) AS last_touch_conversions,
       CAST(sum(lin) AS BIGINT) AS linear_credit_micro
FROM scored GROUP BY channel
"""

QUERIES["w17_attribution"] = (w17_attribution, W17_ORACLE)


# --- TS6: Holt double exponential smoothing -----------------------------------------------

def ts6_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level+trend smoothing (operators/timeseries.py::holt_linear,
    alpha=0.5 beta=0.3) of the per-event-type daily count series: the
    sequential recursion runs as ONE pinned sorted in-row fold per
    series (the ts2/t44 idiom), identical left-to-right IEEE sequence in
    both engines. Observation-sequence semantics: missing days are
    skipped, not zero-filled (contrast ts5's spine contract)."""
    from peskas_timor_data_pipeline_spark.operators.timeseries import (
        holt_linear,
    )

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    return holt_linear(daily, "event_type", "d", "x", alpha=0.5, beta=0.3)


# NOTE: deliberately a recursive CTE, not a list_reduce fold — DuckDB's
# list_reduce mutates the accumulator struct IN PLACE field by field, so a
# later field expression reading an acc field an earlier field already
# overwrote (exactly the l/b coupled recurrence) computes garbage; the
# recursive-CTE row update is simultaneous, like Spark's aggregate().
TS6_ORACLE = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), pts AS MATERIALIZED (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
         CAST(x AS DOUBLE) AS x
  FROM daily
), walk(event_type, i, l, b) AS (
  SELECT event_type, i, x, 0.0::DOUBLE FROM pts WHERE i = 1
  UNION ALL
  SELECT w.event_type, p.i,
         0.5::DOUBLE * p.x + (1.0::DOUBLE - 0.5::DOUBLE) * (w.l + w.b),
         0.3::DOUBLE
           * ((0.5::DOUBLE * p.x
               + (1.0::DOUBLE - 0.5::DOUBLE) * (w.l + w.b)) - w.l)
           + (1.0::DOUBLE - 0.3::DOUBLE) * w.b
  FROM walk w JOIN pts p
    ON p.event_type = w.event_type AND p.i = w.i + 1
), last AS (
  SELECT event_type, max(i) AS n FROM pts GROUP BY event_type
)
SELECT w.event_type, CAST(w.i AS BIGINT) AS n_points,
       round(w.l, 6) AS level, round(w.b, 6) AS trend,
       round(w.l + w.b, 6) AS forecast_1
FROM walk w JOIN last ON w.event_type = last.event_type AND w.i = last.n
"""

QUERIES["ts6_holt_linear"] = (ts6_holt_linear, TS6_ORACLE)
