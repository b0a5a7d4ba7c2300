"""Aggregation operators (SURVEY.md §2.4 A1-A15) with DuckDB oracle twins.

Scale shape: every groupBy here partial-aggregates map-side (low-cardinality
keys), the MAD/median passes are two-phase aggregates on the group key, and
the nested-model round-trip shuffles once on the nest key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from peskas_timor_data_pipeline_spark.functions.datetime_fns import week_start_sunday
from peskas_timor_data_pipeline_spark.harness.tables import (
    exact_avg, exact_avg_sql, exact_sum, exact_sum_sql, load,
)
from peskas_timor_data_pipeline_spark.operators.outliers import loc_scale_bounds, mad_alert
from peskas_timor_data_pipeline_spark.operators.restructure import nest, pivot_longer, pivot_wider, unnest
from peskas_timor_data_pipeline_spark.operators.windows import mode_per_group, sessionize


# --- A1: group_by + summarise (full stat battery) ---------------------------

def a1_groupby_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        exact_avg("l_extendedprice", 100).alias("avg_price"),
        exact_sum("l_extendedprice * (1 - l_discount)", 10000, 0).alias("sum_revenue"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.round(F.median("l_discount"), 6).alias("median_discount"),
    )


A1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       {exact_avg_sql('l_extendedprice', 100)} AS avg_price,
       {exact_sum_sql('l_extendedprice * (1 - l_discount)', 10000, 0)} AS sum_revenue,
       min(l_shipdate) AS first_ship,
       max(l_shipdate) AS last_ship,
       count(*) AS n,
       count(DISTINCT l_suppkey) AS n_suppliers,
       round(median(l_discount), 6) AS median_discount
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- A2: summarise across every numeric column ------------------------------

def a2_summarise_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    numeric = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return li.agg(
        *[exact_avg(c, 100).alias(f"avg_{c}") for c in numeric],
        F.count(F.lit(1)).alias("n"),
    )


A2_ORACLE = f"""
SELECT {exact_avg_sql('l_quantity', 100)} AS avg_l_quantity,
       {exact_avg_sql('l_extendedprice', 100)} AS avg_l_extendedprice,
       {exact_avg_sql('l_discount', 100)} AS avg_l_discount,
       {exact_avg_sql('l_tax', 100)} AS avg_l_tax,
       count(*) AS n
FROM lineitem
"""


# --- A3: add_count (group size kept on rows) ---------------------------------

def a3_add_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("n") >= 15)
        .select("o_orderkey", "o_custkey", "n")
    )


A3_ORACLE = """
SELECT o_orderkey, o_custkey, n
FROM (SELECT o_orderkey, o_custkey, count(*) OVER (PARTITION BY o_custkey) AS n FROM orders)
WHERE n >= 15
"""


# --- A4: conditional aggregates -----------------------------------------------

def a4_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("prop_high_discount"),
        # conditional mean over cents data via exact integer sums (the
        # e23 order-dependence class; ANSI-safe — the matched count can't
        # be 0 while the cents sum is non-null, and both NULL out together)
        F.round(
            F.sum(
                F.expr(
                    "CASE WHEN l_discount > 0.05 "
                    "THEN cast(floor(l_extendedprice * 100 + 0.5d) as bigint) END"
                )
            )
            / 100.0
            / F.sum(F.when(F.col("l_discount") > 0.05, 1)),
            6,
        ).alias("avg_price_when_discounted"),
        F.sum(F.when(F.col("l_quantity") > 45, 1)).alias("n_bulk"),
    )


A4_ORACLE = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) / count(*), 6) AS prop_high_discount,
       round(sum(CASE WHEN l_discount > 0.05
                 THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) END) / 100.0
             / sum(CASE WHEN l_discount > 0.05 THEN 1 END), 6) AS avg_price_when_discounted,
       CAST(sum(CASE WHEN l_quantity > 45 THEN 1 END) AS BIGINT) AS n_bulk
FROM lineitem GROUP BY l_returnflag
"""


# --- A5: mode per group ---------------------------------------------------------

def a5_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return mode_per_group(li, ["l_suppkey"], "l_returnflag", "top_flag")


A5_ORACLE = """
SELECT l_suppkey, l_returnflag AS top_flag
FROM (
  SELECT l_suppkey, l_returnflag,
         row_number() OVER (PARTITION BY l_suppkey ORDER BY count(*) DESC, l_returnflag) AS rn
  FROM lineitem GROUP BY l_suppkey, l_returnflag
) WHERE rn = 1
"""


# --- A6: gap-based sessionization (consecutive-trip merge shape) -----------------

def a6_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prepared = ev.withColumn("prev_ts", F.lag("ts").over(w))
    gap_ok = (
        F.col("prev_ts").isNotNull()
        & (
            (
                F.col("ts").cast("timestamp").cast("double")
                - F.col("prev_ts").cast("timestamp").cast("double")
            )
            <= 1800.0
        )
    )
    sess = sessionize(prepared, ["user_id"], "ts", gap_ok, "session_id")
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
        F.max("n_events").alias("max_session_events"),
        F.round(F.sum("session_value"), 4).alias("total_value"),
    )


A6_ORACLE = """
WITH prepared AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NOT NULL
                  AND (epoch(ts) - epoch(prev_ts)) <= 1800.0
             THEN 0 ELSE 1 END AS new_session
  FROM prepared
), sess AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         round(sum(value), 4) AS session_value
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions,
       round(avg(n_events), 6) AS avg_events_per_session,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       round(sum(session_value), 4) AS total_value
FROM per_session GROUP BY user_id
"""


# --- A7: grid binning -------------------------------------------------------------

def a7_grid_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from peskas_timor_data_pipeline_spark.functions.geo import grid_cell

    ev = load(spark, sf_dir, "events")
    binned = ev.select(
        grid_cell(F.col("value"), 0.0, 25.0).alias("cell_x"),
        F.hour("ts").alias("cell_y"),
        "value",
    )
    return binned.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.median("value"), 6).alias("median_value"),
        exact_avg("value", 10000).alias("avg_value"),
    )


A7_ORACLE = f"""
SELECT CAST(floor(value / 25.0) AS BIGINT) AS cell_x,
       CAST(extract(hour FROM ts) AS INTEGER) AS cell_y,
       count(*) AS n,
       round(median(value), 6) AS median_value,
       {exact_avg_sql('value', 10000)} AS avg_value
FROM events GROUP BY 1, 2
"""


# --- A8/M1: grouped robust MAD bounds (LocScaleB) -----------------------------------

def a8_mad_bounds_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bounds = loc_scale_bounds(li, "l_quantity", ["l_returnflag"], k=3.0, logt=True)
    return bounds.select(
        "l_returnflag",
        "n_valid",
        F.round("lower_bound", 6).alias("lower_bound"),
        F.round("upper_bound", 6).alias("upper_bound"),
    )


A8_ORACLE = """
WITH x AS (
  SELECT l_returnflag AS g, ln(1 + l_quantity) AS xv, l_quantity FROM lineitem
), med AS (
  SELECT g, median(xv) AS m, count(xv) AS n_valid,
         sum(CASE WHEN l_quantity <> 0 THEN 1 ELSE 0 END) AS nz
  FROM x GROUP BY g
), mad AS (
  SELECT x.g, median(abs(xv - m)) AS md FROM x JOIN med USING (g) GROUP BY x.g
)
SELECT g AS l_returnflag, n_valid,
       round(CASE WHEN nz > 0 AND md > 0 THEN exp(m - 3 * 1.4826 * md) - 1 END, 6) AS lower_bound,
       round(CASE WHEN nz > 0 AND md > 0 THEN exp(m + 3 * 1.4826 * md) - 1 END, 6) AS upper_bound
FROM med JOIN mad USING (g)
"""


# --- A9/M1: global MAD alert with degenerate guards -----------------------------------

def a9_mad_alert_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    alerted = mad_alert(orders, "o_totalprice", keys=None, k=2.0, logt=True, alert_number=11)
    return alerted.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("alert_number") == 11, 1).otherwise(0)).alias("n_alerts"),
    )


A9_ORACLE = """
WITH x AS (SELECT *, ln(1 + o_totalprice) AS xv FROM orders),
med AS (SELECT median(xv) AS m,
               sum(CASE WHEN o_totalprice <> 0 THEN 1 ELSE 0 END) AS nz FROM x),
mad AS (SELECT median(abs(xv - m)) AS md FROM x, med),
bounds AS (
  SELECT CASE WHEN nz > 0 AND md > 0 THEN exp(m - 2 * 1.4826 * md) - 1 END AS lo,
         CASE WHEN nz > 0 AND md > 0 THEN exp(m + 2 * 1.4826 * md) - 1 END AS hi
  FROM med, mad
)
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CASE WHEN o_totalprice < lo OR o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts
FROM orders, bounds GROUP BY o_orderpriority
"""


# --- A10/M2-tail: exact quantile per group ----------------------------------------------

def a10_quantile_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.7), 6).alias("p70_price"),
        F.round(F.percentile("l_quantity", 0.9), 6).alias("p90_qty"),
    )


A10_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.7), 6) AS p70_price,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
FROM lineitem GROUP BY l_returnflag
"""


# --- A11: pivot wide + unpivot long --------------------------------------------------------

def a11_pivot_wider(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wide = pivot_wider(
        li.select("l_suppkey", "l_returnflag"),
        ["l_suppkey"],
        "l_returnflag",
        "l_returnflag",
        agg=F.count(F.lit(1)),
        values=["A", "N", "R"],
    )
    return wide.fillna(0, subset=["A", "N", "R"])


A11W_ORACLE = """
SELECT l_suppkey,
       CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS "A",
       CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS "N",
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS "R"
FROM lineitem GROUP BY l_suppkey
"""


def a11_pivot_longer(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    typed = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return pivot_longer(typed, ["p_partkey"], ["size", "retailprice"], "metric", "value")


A11L_ORACLE = """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
"""


# --- A12: two-level nested model round-trip --------------------------------------------------

def a12_two_level_nest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # species_group/length_individuals analogue: order -> supplier ->
    # line-items, nested two levels deep then fully unnested and aggregated.
    # Pre-partitioning on the COARSEST nest key makes both nest levels
    # shuffle-free: HashPartitioning(l_orderkey) satisfies the clustering
    # for groupBy(l_orderkey, l_suppkey) AND groupBy(l_orderkey) — one
    # exchange total instead of two (the pattern for multi-level nesting
    # at 100 TB: shuffle once on the trip key, nest all levels in place).
    li = load(spark, sf_dir, "lineitem").repartition("l_orderkey")
    level1 = nest(
        li,
        keys=["l_orderkey", "l_suppkey"],
        nested_col="length_individuals",
        value_cols=["l_linenumber", "l_quantity", "l_returnflag"],
    )
    level2 = nest(
        level1,
        keys=["l_orderkey"],
        nested_col="species_group",
        value_cols=["l_suppkey", "length_individuals"],
    )
    flat = unnest(unnest(level2, "species_group"), "length_individuals")
    return flat.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


A12_ORACLE = """
SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY l_returnflag
"""


# --- A13: explicit two-level rollup (municipal -> national) ------------------------------------

def a13_rollup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    # money in integer cents end-to-end: double sums merge in partition
    # order, which varies run to run — an unlucky schedule once flipped a
    # rounded avg at the 1e-6 boundary (observed under CPU starvation).
    # Integer sums are order-free; the only float ops left are single
    # divisions of exact integers, identical everywhere.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    municipal = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.trunc(F.to_date("o_orderdate"), "month").alias("period"))
        .agg(F.sum(cents).alias("municipal_cents"))
    )
    return municipal.groupBy("period").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.round(F.sum("municipal_cents") / 100.0, 0).alias("national_total"),
        F.round(
            F.sum("municipal_cents") / 100.0 / F.count(F.lit(1)), 6
        ).alias("avg_municipal"),
        F.round(F.median("municipal_cents") / 100.0, 6).alias("median_municipal"),
    )


A13_ORACLE = """
WITH municipal AS (
  SELECT n_name, CAST(date_trunc('month', o_orderdate) AS DATE) AS period,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS municipal_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT period, CAST(count(*) AS BIGINT) AS n_nations,
       round(sum(municipal_cents) / 100.0, 0) AS national_total,
       round(sum(municipal_cents) / 100.0 / count(*), 6) AS avg_municipal,
       round(median(municipal_cents) / 100.0, 6) AS median_municipal
FROM municipal GROUP BY period
"""


# --- A14: time-binned multi-source aggregation ---------------------------------------------------

def a14_time_binned_multisource(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    o_bins = orders.groupBy(
        week_start_sunday(F.col("o_orderdate")).alias("week")
    ).agg(F.count(F.lit(1)).alias("n_landings"))
    l_bins = li.groupBy(week_start_sunday(F.col("l_shipdate")).alias("week")).agg(
        F.count(F.lit(1)).alias("n_tracks")
    )
    matched = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            week_start_sunday(F.col("l_shipdate"))
            == week_start_sunday(F.col("o_orderdate"))
        )
        .groupBy(week_start_sunday(F.col("o_orderdate")).alias("week"))
        .agg(F.countDistinct("o_orderkey").alias("n_matched"))
    )
    out = (
        o_bins.join(l_bins, "week", "full")
        .join(matched, "week", "full")
        .fillna(0, subset=["n_landings", "n_tracks", "n_matched"])
    )
    return out.withColumn(
        "prop_matched",
        F.round(
            F.col("n_matched")
            / (F.col("n_landings") + F.col("n_tracks") - F.col("n_matched")),
            6,
        ),
    )


A14_ORACLE = """
WITH o_bins AS (
  SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE) + 1) - 1 AS DATE) AS week,
         count(*) AS n_landings
  FROM orders GROUP BY 1
), l_bins AS (
  SELECT CAST(date_trunc('week', CAST(l_shipdate AS DATE) + 1) - 1 AS DATE) AS week,
         count(*) AS n_tracks
  FROM lineitem GROUP BY 1
), matched AS (
  SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE) + 1) - 1 AS DATE) AS week,
         count(DISTINCT o_orderkey) AS n_matched
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE CAST(date_trunc('week', CAST(l_shipdate AS DATE) + 1) - 1 AS DATE)
        = CAST(date_trunc('week', CAST(o_orderdate AS DATE) + 1) - 1 AS DATE)
  GROUP BY 1
)
SELECT week,
       coalesce(n_landings, 0) AS n_landings,
       coalesce(n_tracks, 0) AS n_tracks,
       coalesce(n_matched, 0) AS n_matched,
       round(coalesce(n_matched, 0) * 1.0
             / (coalesce(n_landings, 0) + coalesce(n_tracks, 0) - coalesce(n_matched, 0)), 6) AS prop_matched
FROM o_bins
FULL JOIN l_bins USING (week)
FULL JOIN matched USING (week)
"""


# --- A15: metric arithmetic + unpivot (nutrient rollup shape) --------------------------------------

def a15_metric_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        exact_sum("l_extendedprice * (1 - l_discount)", 10000, 0).alias("revenue"),
        exact_sum("l_extendedprice * l_tax", 10000, 0).alias("tax_amount"),
        exact_sum("l_extendedprice * l_discount", 10000, 0).alias("discount_amount"),
    )
    return pivot_longer(
        per_flag, ["l_returnflag"], ["revenue", "tax_amount", "discount_amount"],
        "metric", "value",
    )


A15_ORACLE = f"""
WITH per_flag AS (
  SELECT l_returnflag,
         {exact_sum_sql('l_extendedprice * (1 - l_discount)', 10000, 0)} AS revenue,
         {exact_sum_sql('l_extendedprice * l_tax', 10000, 0)} AS tax_amount,
         {exact_sum_sql('l_extendedprice * l_discount', 10000, 0)} AS discount_amount
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'revenue' AS metric, revenue AS value FROM per_flag
UNION ALL
SELECT l_returnflag, 'tax_amount' AS metric, tax_amount AS value FROM per_flag
UNION ALL
SELECT l_returnflag, 'discount_amount' AS metric, discount_amount AS value FROM per_flag
"""


QUERIES = {
    "a1_groupby_stats": (a1_groupby_stats, A1_ORACLE),
    "a2_summarise_across": (a2_summarise_across, A2_ORACLE),
    "a3_add_count": (a3_add_count, A3_ORACLE),
    "a4_conditional_agg": (a4_conditional_agg, A4_ORACLE),
    "a5_mode_per_group": (a5_mode_per_group, A5_ORACLE),
    "a6_sessionization": (a6_sessionization, A6_ORACLE),
    "a7_grid_binning": (a7_grid_binning, A7_ORACLE),
    "a8_mad_bounds_grouped": (a8_mad_bounds_grouped, A8_ORACLE),
    "a9_mad_alert_global": (a9_mad_alert_global, A9_ORACLE),
    "a10_quantile_group": (a10_quantile_group, A10_ORACLE),
    "a11_pivot_wider": (a11_pivot_wider, A11W_ORACLE),
    "a11_pivot_longer": (a11_pivot_longer, A11L_ORACLE),
    "a12_two_level_nest": (a12_two_level_nest, A12_ORACLE),
    "a13_rollup_two_level": (a13_rollup_two_level, A13_ORACLE),
    "a14_time_binned_multisource": (a14_time_binned_multisource, A14_ORACLE),
    "a15_metric_unpivot": (a15_metric_unpivot, A15_ORACLE),
}


# --- A16: salted two-phase aggregation for Zipfian keys ----------------------------

def a16_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe rewrite of a hot-key aggregation: identical results to a
    plain groupBy (the oracle IS the plain groupBy), but each key spreads
    over 16 salt buckets before reducing — the pattern for Zipfian species
    codes at 100 TB where one group would pin a single task."""
    from peskas_timor_data_pipeline_spark.operators.skew import salted_agg

    li = load(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "n": ("l_orderkey", "count"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty", 2).alias("sum_qty"),
        "n",
        "min_price",
        "max_price",
    )


A16_ORACLE = """
SELECT l_returnflag,
       round(sum(l_quantity), 2) AS sum_qty,
       count(l_orderkey) AS n,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
"""

QUERIES["a16_salted_agg"] = (a16_salted_agg, A16_ORACLE)


# --- A17: tumbling-window aggregation (the streaming bin, batch-checked) ------------

def a17_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows via F.window — identical semantics to the
    streaming windowed aggregation (§2.10); the oracle bins by epoch
    division. Works unchanged on a readStream source."""
    ev = load(spark, sf_dir, "events")
    win = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return win.select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


A17_ORACLE = """
SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000)
         AS window_start,
       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""
# make_timestamp(micros) is timezone-free; to_timestamp() returns
# TIMESTAMPTZ whose cast back to naive goes through DuckDB's session
# TimeZone (the OS TZ) — shifted output on any non-UTC host

QUERIES["a17_tumbling_window"] = (a17_tumbling_window, A17_ORACLE)


# --- A18: single-pass rollup (grouping sets) -----------------------------------------

def a18_grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The municipal->national re-aggregation (A13, R/estimate-catch.R:487-532)
    as ONE pass with ``rollup``: Spark's grouping-sets expansion computes the
    detail level and the grand total in a single shuffle (partial aggregation
    on both levels), where the reference aggregates twice. ``grouping_id``
    labels the level so sum-of-sums and grand totals stay distinguishable."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    return (
        joined.rollup("n_regionkey", "n_name")
        .agg(
            F.grouping_id().alias("level"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice", 100, 0).alias("total"),
        )
        .select("n_regionkey", "n_name", "level", "n_orders", "total")
    )


A18_ORACLE = f"""
SELECT n_regionkey, n_name,
       CAST(grouping(n_regionkey) * 2 + grouping(n_name) AS BIGINT) AS level,
       count(*) AS n_orders,
       {exact_sum_sql('o_totalprice', 100, 0)} AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_regionkey, n_name)
"""

QUERIES["a18_grouping_rollup"] = (a18_grouping_rollup, A18_ORACLE)


# --- A19: KMV distinct-count sketch (deterministic, mergeable) -----------------------

KMV_K = 64


def a19_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per return flag via a KMV bottom-k sketch
    (operators/sketches.py) — the engine-portable alternative to HLL++ for
    cross-engine-auditable approximate distinct counts. Output carries the
    estimate next to the exact count so the oracle value-checks the
    estimator itself, not just the plumbing."""
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    li = load(spark, sf_dir, "lineitem")
    sk = kmv_sketch(li, ["l_returnflag"], "l_suppkey", k=KMV_K)
    est = sk.select(
        "l_returnflag",
        F.round(kmv_estimate(KMV_K), 4).alias("est_distinct"),
        F.col("n_kept").alias("sketch_size"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("exact_distinct")
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag",
        "est_distinct",
        "sketch_size",
        "exact_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


_UNIT_HASH_SQL = (
    "(('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 12))::BIGINT + 1.0)"
    f" / {16 ** 12}.0"
)

A19_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT l_returnflag, {_UNIT_HASH_SQL} AS h FROM lineitem
), kept AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
  FROM hashed
), sk AS (
  SELECT l_returnflag, count(*) AS n_kept, max(h) AS h_k
  FROM kept WHERE rn <= {KMV_K} GROUP BY l_returnflag
), est AS (
  SELECT l_returnflag,
         round(CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE)
                    ELSE ({KMV_K} - 1) / h_k END, 4) AS est_distinct,
         n_kept AS sketch_size
  FROM sk
), exact AS (
  SELECT l_returnflag, count(DISTINCT l_suppkey) AS exact_distinct
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, est_distinct, sketch_size, exact_distinct,
       round(abs(est_distinct - exact_distinct) / exact_distinct, 4) AS rel_err
FROM est JOIN exact USING (l_returnflag)
"""

QUERIES["a19_kmv_distinct"] = (a19_kmv_distinct, A19_ORACLE)


# --- A20: KMV set algebra (sketch-only union/intersection/Jaccard) -------------------

def a20_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-set overlap between return flags estimated purely from KMV
    sketches (no rescan of lineitem for the estimates), with the exact
    Jaccard alongside so the oracle value-checks the estimator."""
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        kmv_set_estimates,
        kmv_sketch,
    )

    li = load(spark, sf_dir, "lineitem")
    sk = kmv_sketch(li, ["l_returnflag"], "l_suppkey", k=KMV_K)
    pairs = (
        sk.select(F.col("l_returnflag").alias("flag_a"), F.col("hs").alias("hs_a"))
        .join(
            sk.select(F.col("l_returnflag").alias("flag_b"), F.col("hs").alias("hs_b")),
            F.col("flag_a") < F.col("flag_b"),
        )
    )
    est = kmv_set_estimates(pairs, KMV_K)

    membership = li.select("l_returnflag", "l_suppkey").distinct()
    a = membership.select(F.col("l_returnflag").alias("flag_a"), "l_suppkey")
    b = membership.select(F.col("l_returnflag").alias("flag_b"), "l_suppkey")
    common = (
        a.join(b, "l_suppkey")
        .filter(F.col("flag_a") < F.col("flag_b"))
        .groupBy("flag_a", "flag_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = membership.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    exact = (
        common.join(
            sizes.select(F.col("l_returnflag").alias("flag_a"), F.col("n_distinct").alias("na")),
            "flag_a",
        )
        .join(
            sizes.select(F.col("l_returnflag").alias("flag_b"), F.col("n_distinct").alias("nb")),
            "flag_b",
        )
        .withColumn(
            "exact_jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
    )
    return (
        est.join(exact, ["flag_a", "flag_b"])
        .select(
            "flag_a",
            "flag_b",
            F.round("est_union", 4).alias("est_union"),
            F.round("est_inter", 4).alias("est_inter"),
            F.round("est_jaccard", 4).alias("est_jaccard"),
            F.round("exact_jaccard", 4).alias("exact_jaccard"),
        )
    )


A20_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT l_returnflag, {_UNIT_HASH_SQL} AS h FROM lineitem
), kept AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
  FROM hashed
), sk AS (
  SELECT l_returnflag, list(h ORDER BY h) AS hs
  FROM kept WHERE rn <= {KMV_K} GROUP BY l_returnflag
), pr AS (
  SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b,
         a.hs AS hs_a, b.hs AS hs_b,
         list_slice(list_sort(list_distinct(list_concat(a.hs, b.hs))), 1, {KMV_K}) AS u
  FROM sk a JOIN sk b ON a.l_returnflag < b.l_returnflag
), est AS (
  SELECT flag_a, flag_b,
         CASE WHEN len(u) < {KMV_K} THEN CAST(len(u) AS DOUBLE)
              ELSE ({KMV_K} - 1) / u[len(u)] END AS est_union,
         len(list_intersect(u, list_intersect(hs_a, hs_b))) * 1.0 / len(u) AS rho
  FROM pr
), membership AS (
  SELECT DISTINCT l_returnflag, l_suppkey FROM lineitem
), common AS (
  SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b, count(*) AS n_common
  FROM membership a JOIN membership b
    ON a.l_suppkey = b.l_suppkey AND a.l_returnflag < b.l_returnflag
  GROUP BY 1, 2
), sizes AS (
  SELECT l_returnflag, count(*) AS n_distinct FROM membership GROUP BY 1
)
SELECT e.flag_a, e.flag_b,
       round(e.est_union, 4) AS est_union,
       round(e.rho * e.est_union, 4) AS est_inter,
       round(e.rho, 4) AS est_jaccard,
       round(c.n_common * 1.0 / (sa.n_distinct + sb.n_distinct - c.n_common), 4) AS exact_jaccard
FROM est e
JOIN common c ON c.flag_a = e.flag_a AND c.flag_b = e.flag_b
JOIN sizes sa ON sa.l_returnflag = e.flag_a
JOIN sizes sb ON sb.l_returnflag = e.flag_b
"""

QUERIES["a20_kmv_set_ops"] = (a20_kmv_set_ops, A20_ORACLE)


# --- A21: incremental rollup maintenance (continuous aggregate) -----------------------

def a21_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate refresh: lineitem arrives as three deterministic
    batches (orderkey mod 3); each batch's partial aggregate folds into the
    rollup state. The oracle aggregates the whole table directly — the
    incremental path must be indistinguishable from the batch path."""
    from peskas_timor_data_pipeline_spark.operators.incremental import (
        merge_rollup,
        partial_rollup,
    )

    li = load(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    measures = {
        "sum_qty": ("sum", "l_quantity"),
        "n": ("count", "l_quantity"),
        "min_ship": ("min", "l_shipdate"),
        "max_ship": ("max", "l_shipdate"),
    }
    state = None
    for i in range(3):
        batch = li.filter(F.col("l_orderkey") % 3 == i)
        state = merge_rollup(state, partial_rollup(batch, keys, measures), keys, measures)
    return state.select(
        *keys,
        F.round("sum_qty", 2).alias("sum_qty"),
        "n",
        "min_ship",
        "max_ship",
        # finalize mean from mergeable (sum, count) at read time
        F.round(F.col("sum_qty") / F.col("n"), 6).alias("avg_qty"),
    )


A21_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(l_quantity) AS n,
       min(l_shipdate) AS min_ship,
       max(l_shipdate) AS max_ship,
       round(sum(l_quantity) / count(l_quantity), 6) AS avg_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

QUERIES["a21_incremental_rollup"] = (a21_incremental_rollup, A21_ORACLE)


# --- A22: sampled quantile estimation (deterministic sample sketch) -------------------

SAMPLE_K = 128


def a22_sampled_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median extendedprice per return flag estimated from a deterministic
    128-row uniform sample per group (md5-ranked — reproducible on any
    engine), next to the exact median so the oracle value-checks the
    estimator. The scale story: the sample path shuffles k rows per group;
    the exact path shuffles every value."""
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        uniform_row_sample,
    )

    li = load(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data (~20%
    # deliberate dirty-data duplicates with DIFFERING prices) — a tied hash
    # straddling the rank-k boundary let each engine keep a different
    # physical row (caught by the sf0.1 sweep; sf0.01 passed by luck).
    # Folding integer cents into the key makes any remaining tie
    # value-identical in the measured column, so the pick is engine-free.
    row_key = F.concat_ws(
        "#",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
    )
    sampled = uniform_row_sample(li, ["l_returnflag"], row_key, k=SAMPLE_K)
    est = sampled.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("est_median"),
        F.count(F.lit(1)).alias("sample_n"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 4).alias("exact_median")
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag", "est_median", "sample_n", "exact_median"
    )


A22_ORACLE = f"""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY (('0x' || substr(md5(concat_ws('#', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR))), 1, 12))::BIGINT + 1.0) / {16 ** 12}.0
         ) AS rn
  FROM lineitem
), est AS (
  SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.5), 4) AS est_median,
         count(*) AS sample_n
  FROM ranked WHERE rn <= {SAMPLE_K} GROUP BY l_returnflag
), exact AS (
  SELECT l_returnflag, round(median(l_extendedprice), 4) AS exact_median
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, est_median, sample_n, exact_median
FROM est JOIN exact USING (l_returnflag)
"""

QUERIES["a22_sampled_quantile"] = (a22_sampled_quantile, A22_ORACLE)


# --- A23: native session windows ------------------------------------------------------

def a23_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session aggregation with a 10-minute inactivity gap using
    Spark's NATIVE session_window (state-store-backed in streaming; here
    the batch form). The oracle derives the identical sessions with the
    portable lag + cumulative-flag rewrite (operators.windows.sessionize),
    value-checking that the two formulations agree — session start/end,
    event count, and value sum per session."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("user_id", "n_events", "value_sum", "first_ts", "last_ts")
    )


A23_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) >= 600
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events WHERE event_type = 'click'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), labeled AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM ordered
)
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 6) AS value_sum,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM labeled
GROUP BY user_id, sess
"""

QUERIES["a23_session_window"] = (a23_session_window, A23_ORACLE)


# --- A24: exact weighted median per group ----------------------------------------------

def a24_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag weighted median of unit price, weighted by quantity —
    the lower weighted median (smallest value whose cumulative weight
    reaches half the total). No built-in exists in either engine; the
    rewrite is one sorted window for the running weight plus a min-over-
    qualifying-values aggregate. Window width is bounded by the group, and
    the pre-aggregation by (group, value) keeps it at distinct values, not
    rows."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    # pre-aggregate identical prices: the window then runs over distinct
    # (flag, price) combos — bounded domain, not the raw row count
    by_val = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum("l_quantity").alias("w")
    )
    win = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("l_returnflag")
    ranked = by_val.withColumn("cum_w", F.sum("w").over(win)).withColumn(
        "tot_w", F.sum("w").over(tot)
    )
    return (
        ranked.filter(F.col("cum_w") * 2 >= F.col("tot_w"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("weighted_median_price"))
    )


A24_ORACLE = """
WITH by_val AS (
  SELECT l_returnflag, l_extendedprice, sum(l_quantity) AS w
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT l_returnflag, l_extendedprice,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot_w
  FROM by_val
)
SELECT l_returnflag, min(l_extendedprice) AS weighted_median_price
FROM ranked WHERE cum_w * 2 >= tot_w
GROUP BY l_returnflag
"""

QUERIES["a24_weighted_median"] = (a24_weighted_median, A24_ORACLE)


# --- A25: Count-Min sketch frequency estimation -----------------------------------------

def a25_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over document tokens (4 hash rows x 256 hex-string
    buckets), point-queried for the 20 most frequent tokens next to their
    true counts. The oracle rebuilds the sketch from the same md5 bucket
    formula, so a hashing, merge, or min-estimate bug breaks the hash; the
    est >= true over-count invariant is pinned in the unit test."""
    from peskas_timor_data_pipeline_spark.harness.tables import load
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    truec = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_c"))
    top = truec.orderBy(F.desc("true_c"), F.asc("tok")).limit(20)
    sketch = cms_sketch(toks, "tok", d=4, bucket_hex_chars=2)
    return cms_estimate(top, sketch, "tok", d=4, bucket_hex_chars=2)


A25_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents
), ne AS (
  SELECT tok FROM toks WHERE tok <> ''
), truec AS (
  SELECT tok, count(*) AS true_c FROM ne GROUP BY tok
), top AS (
  SELECT tok, true_c FROM truec ORDER BY true_c DESC, tok LIMIT 20
), seeds AS (
  SELECT unnest(generate_series(0, 3)) AS seed
), sk AS (
  SELECT seed, substring(md5('cms' || seed || '#' || tok), 1, 2) AS bucket,
         count(*) AS c
  FROM ne CROSS JOIN seeds
  GROUP BY seed, substring(md5('cms' || seed || '#' || tok), 1, 2)
)
SELECT t.tok, CAST(t.true_c AS BIGINT) AS true_c,
       CAST(min(coalesce(s.c, 0)) AS BIGINT) AS est_c
FROM top t CROSS JOIN seeds j
LEFT JOIN sk s ON s.seed = j.seed
             AND s.bucket = substring(md5('cms' || j.seed || '#' || t.tok), 1, 2)
GROUP BY t.tok, t.true_c
"""

QUERIES["a25_count_min"] = (a25_count_min, A25_ORACLE)


# --- A26: per-group winsorization -------------------------------------------------------

def a26_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize l_extendedprice into each return flag's [P5, P95] band and
    report the clamp counts and clamped-series stats — pins the percentile
    bounds, every clamp decision, and the rewritten values."""
    from peskas_timor_data_pipeline_spark.harness.tables import load
    from peskas_timor_data_pipeline_spark.operators.outliers import winsorize

    li = load(spark, sf_dir, "lineitem")
    w = winsorize(li, ["l_returnflag"], "l_extendedprice", 0.05, 0.95)
    return w.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_extendedprice") < F.col("__lo__"), 1).otherwise(0)
        ).alias("n_low"),
        F.sum(
            F.when(F.col("l_extendedprice") > F.col("__hi__"), 1).otherwise(0)
        ).alias("n_high"),
        F.round(F.min("__lo__"), 6).alias("p05"),
        F.round(F.min("__hi__"), 6).alias("p95"),
        exact_avg("l_extendedprice_wins", 100).alias("avg_wins"),
        exact_sum("l_extendedprice_wins", 100, 2).alias("sum_wins"),
    )


A26_ORACLE = f"""
WITH bounds AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY l_returnflag
), w AS (
  SELECT l.l_returnflag, l.l_extendedprice, b.lo, b.hi,
         least(greatest(l.l_extendedprice, b.lo), b.hi) AS wins
  FROM lineitem l JOIN bounds b USING (l_returnflag)
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       round(min(lo), 6) AS p05,
       round(min(hi), 6) AS p95,
       {exact_avg_sql('wins', 100)} AS avg_wins,
       {exact_sum_sql('wins', 100, 2)} AS sum_wins
FROM w GROUP BY l_returnflag
"""

QUERIES["a26_winsorize"] = (a26_winsorize, A26_ORACLE)


# --- A27: ordered-sequence funnel -------------------------------------------------------

def a27_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel over the event log: first
    qualifying occurrence strictly after the previous step, per-step user
    counts and conversion rates. The oracle chains the same conditional
    min-aggregations, so an ordering or strictness bug breaks the hash."""
    from peskas_timor_data_pipeline_spark.operators.funnel import funnel

    ev = load(spark, sf_dir, "events")
    return funnel(ev, "user_id", "ts", "event_type",
                  ["view", "click", "purchase"])


A27_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
  GROUP BY e.user_id
), counts AS (
  SELECT 1 AS step, 'view' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
)
SELECT step, step_name, n_users,
       CASE WHEN lag(n_users) OVER (ORDER BY step) > 0
            THEN round(n_users
                       / CAST(lag(n_users) OVER (ORDER BY step) AS DOUBLE), 6)
       END AS conv_from_prev,
       CASE WHEN first_value(n_users) OVER (ORDER BY step) > 0
            THEN round(n_users
                       / CAST(first_value(n_users) OVER (ORDER BY step) AS DOUBLE), 6)
       END AS conv_from_top
FROM counts
"""

QUERIES["a27_funnel"] = (a27_funnel, A27_ORACLE)


# --- A28: weekly retention cohorts ------------------------------------------------------

def a28_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix on integer week indexes (floor(days/7) from a
    fixed epoch — engine-exact, no locale week truncation): cohort = first
    active week, cell = users active offset weeks later + share of
    cohort."""
    from peskas_timor_data_pipeline_spark.operators.funnel import (
        retention_cohorts,
    )

    ev = load(spark, sf_dir, "events")
    return retention_cohorts(ev, "user_id", "ts", epoch="2024-01-01")


A28_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id,
         CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS w
  FROM events
), first AS (
  SELECT user_id, min(w) AS w0 FROM active GROUP BY user_id
), cells AS (
  SELECT f.w0 AS cohort_week, a.w - f.w0 AS week_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM active a JOIN first f ON a.user_id = f.user_id
  GROUP BY f.w0, a.w - f.w0
), sizes AS (
  SELECT cohort_week, n_active AS n_cohort FROM cells WHERE week_offset = 0
)
SELECT c.cohort_week, c.week_offset, c.n_active, s.n_cohort,
       round(c.n_active / CAST(s.n_cohort AS DOUBLE), 6) AS retention
FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
"""

QUERIES["a28_retention_cohorts"] = (a28_retention_cohorts, A28_ORACLE)


# --- A29: A/B two-proportion z-test -----------------------------------------------------

def a29_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: variant = user_id parity, conversion = the user
    ever made a high-value (>100) purchase; two-proportion pooled
    z-statistic. All counts integer;
    p-hats and z are exact single expressions over identical integers, so
    the statistic is engine-exact at 6 dp."""
    ev = load(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(F.when((F.col("event_type") == "purchase") & (F.col("value") > 100), 1).otherwise(0)).alias(
            "converted"
        )
    ).select(
        (F.col("user_id") % 2).alias("variant"), "converted"
    )
    per = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_conv"),
    )
    a = per.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("na"), F.col("n_conv").alias("ca")
    )
    b = per.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("nb"), F.col("n_conv").alias("cb")
    )
    j = a.crossJoin(b)
    pa = F.col("ca") / F.col("na")
    pb = F.col("cb") / F.col("nb")
    pool = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    se = F.sqrt(pool * (1 - pool) * (1 / F.col("na") + 1 / F.col("nb")))
    return j.select(
        "na", "ca", "nb", "cb",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        # a saturated pool (0% or 100% both variants) has se = 0: report a
        # null statistic instead of tripping ANSI divide-by-zero
        F.when(se > 0, F.round((pa - pb) / se, 6)).alias("z_stat"),
    )


A29_ORACLE = """
WITH users AS (
  SELECT user_id % 2 AS variant,
         max(CASE WHEN event_type = 'purchase' AND value > 100 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), per AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_conv
  FROM users GROUP BY variant
), a AS (SELECT n_users AS na, n_conv AS ca FROM per WHERE variant = 0),
b AS (SELECT n_users AS nb, n_conv AS cb FROM per WHERE variant = 1)
SELECT na, ca, nb, cb,
       round(ca / CAST(na AS DOUBLE), 6) AS rate_a,
       round(cb / CAST(nb AS DOUBLE), 6) AS rate_b,
       CASE WHEN sqrt((ca + cb) / CAST(na + nb AS DOUBLE)
                      * (1 - (ca + cb) / CAST(na + nb AS DOUBLE))
                      * (1.0 / na + 1.0 / nb)) > 0
            THEN round((ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE))
                       / sqrt((ca + cb) / CAST(na + nb AS DOUBLE)
                              * (1 - (ca + cb) / CAST(na + nb AS DOUBLE))
                              * (1.0 / na + 1.0 / nb)), 6)
       END AS z_stat
FROM a CROSS JOIN b
"""

QUERIES["a29_ab_test"] = (a29_ab_test, A29_ORACLE)


# --- A30: log-histogram quantiles -------------------------------------------------------

def a30_log_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per type from the base-2 cents
    histogram: integer bucketing via binary string length (no float log at
    a power-of-two boundary), geometric-midpoint estimates, cumulative
    pick. Every step is integer or exact-rational, so the sketch is
    engine-exact — unlike approx_percentile/HLL whose estimates no other
    engine reproduces."""
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        log_histogram_quantiles,
    )

    ev = load(spark, sf_dir, "events")
    return log_histogram_quantiles(ev, "event_type", "value")


A30_ORACLE = """
WITH cents AS (
  SELECT event_type,
         CAST(length(bin(CAST(round(value * 100) AS BIGINT))) - 1 AS INTEGER) AS b
  FROM events
), counts AS (
  SELECT event_type, b, CAST(count(*) AS BIGINT) AS c
  FROM cents GROUP BY event_type, b
), cum AS (
  SELECT event_type, b,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         round(3.0 * (CAST(1 AS BIGINT) << b) / 200.0, 6) AS est
  FROM counts
)
SELECT event_type, max(n) AS n,
       min(CASE WHEN cm >= CAST(ceil(0.5 * n) AS BIGINT) THEN est END) AS p5,
       min(CASE WHEN cm >= CAST(ceil(0.9 * n) AS BIGINT) THEN est END) AS p9,
       min(CASE WHEN cm >= CAST(ceil(0.99 * n) AS BIGINT) THEN est END) AS p99
FROM cum GROUP BY event_type
"""

QUERIES["a30_log_histogram_quantiles"] = (a30_log_histogram_quantiles, A30_ORACLE)


# --- A31: weekly growth accounting ------------------------------------------------------

def a31_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New / retained / resurrected / churned users per integer week —
    the growth ledger. All set logic is user+week keyed joins over ONE
    distinct activity frame; every output is an integer count."""
    from peskas_timor_data_pipeline_spark.operators.funnel import (
        growth_accounting,
    )

    ev = load(spark, sf_dir, "events")
    return growth_accounting(ev, "user_id", "ts", epoch="2024-01-01")


A31_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id,
         CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS w
  FROM events
), first AS (
  SELECT user_id, min(w) AS w0 FROM active GROUP BY user_id
), cur AS (
  SELECT a.user_id, a.w, f.w0,
         p.user_id IS NOT NULL AS prev
  FROM active a
  JOIN first f ON a.user_id = f.user_id
  LEFT JOIN active p ON p.user_id = a.user_id AND p.w + 1 = a.w
), per_week AS (
  SELECT w AS week,
         CAST(count(*) AS BIGINT) AS active,
         CAST(sum(CASE WHEN w0 = w THEN 1 ELSE 0 END) AS BIGINT) AS new,
         CAST(sum(CASE WHEN prev THEN 1 ELSE 0 END) AS BIGINT) AS retained,
         CAST(sum(CASE WHEN w0 < w AND NOT prev THEN 1 ELSE 0 END) AS BIGINT)
           AS resurrected
  FROM cur GROUP BY w
), gone AS (
  SELECT n.week, CAST(count(*) AS BIGINT) AS churned
  FROM (SELECT user_id, w + 1 AS week FROM active) n
  LEFT JOIN active a ON a.user_id = n.user_id AND a.w = n.week
  WHERE a.user_id IS NULL
  GROUP BY n.week
)
SELECT coalesce(p.week, g.week) AS week,
       coalesce(p.active, 0) AS active,
       coalesce(p.new, 0) AS new,
       coalesce(p.retained, 0) AS retained,
       coalesce(p.resurrected, 0) AS resurrected,
       coalesce(g.churned, 0) AS churned
FROM per_week p FULL OUTER JOIN gone g ON p.week = g.week
"""

QUERIES["a31_growth_accounting"] = (a31_growth_accounting, A31_ORACLE)


# --- A32: Benford first-digit audit -----------------------------------------------------

def a32_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud/no-fraud screening: first significant digit distribution of
    order totals vs Benford's law, with the chi-square contribution per
    digit. Digit extraction is string-based (first char of the integer
    cents — no float log), counts are integer, and each expected value is
    one ln expression over identical integers."""
    orders = load(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    w = Window.partitionBy()
    n = F.sum("observed").over(w)
    expected = n * (F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)))
    return counts.select(
        "digit",
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round((F.col("observed") - expected) * (F.col("observed") - expected)
                / expected, 6).alias("chi2_term"),
    )


A32_ORACLE = """
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS observed
  FROM orders GROUP BY 1
)
SELECT digit, observed,
       round(sum(observed) OVER () * (ln(1.0 + 1.0 / digit) / ln(10.0)), 6)
         AS expected,
       round((observed - sum(observed) OVER () * (ln(1.0 + 1.0 / digit) / ln(10.0)))
             * (observed - sum(observed) OVER () * (ln(1.0 + 1.0 / digit) / ln(10.0)))
             / (sum(observed) OVER () * (ln(1.0 + 1.0 / digit) / ln(10.0))), 6)
         AS chi2_term
FROM counts
"""

QUERIES["a32_benford"] = (a32_benford, A32_ORACLE)


# --- A33: funnel time-to-convert --------------------------------------------------------

def a33_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency through the view->purchase funnel: per completing user, the
    seconds from first view to the first strictly-later purchase; rolled
    up as count plus exact p50/p90. Durations are integer seconds, so the
    percentile interpolation is exact rational arithmetic."""
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"), F.first("t_view").alias("t_view"))
    )
    # unix_timestamp FLOORS sub-seconds while DuckDB's epoch cast rounds —
    # exact integer microseconds sidestep the truncation-semantics gap
    secs = p.select(
        (
            (
                F.unix_micros(F.col("t_buy").cast("timestamp"))
                - F.unix_micros(F.col("t_view").cast("timestamp"))
            )
            / 1000000.0
        ).alias("secs")
    )
    return secs.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("secs", 0.5), 6).alias("p50_secs"),
        F.round(F.percentile("secs", 0.9), 6).alias("p90_secs"),
    )


A33_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_buy, min(v.t_view) AS t_view
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts > v.t_view
  GROUP BY e.user_id
), secs AS (
  SELECT (epoch_us(t_buy) - epoch_us(t_view)) / 1000000.0 AS secs
  FROM p
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(secs, 0.5), 6) AS p50_secs,
       round(quantile_cont(secs, 0.9), 6) AS p90_secs
FROM secs
"""

QUERIES["a33_time_to_convert"] = (a33_time_to_convert, A33_ORACLE)


# --- A34: session bounce rate -----------------------------------------------------------

def a34_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-minute-gap sessions containing
    exactly one event, keyed by the session's first day. Reuses the A6
    running-sum sessionization; counts integer, rate = one exact
    division."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional seconds (exact micros/1e6, = DuckDB epoch()); the floored
    # unix_timestamp form diverges when a gap straddles the 1800 s boundary
    # inside one second
    gap = (
        F.col("ts").cast("timestamp").cast("double")
        - F.lag("ts").over(w).cast("timestamp").cast("double")
    )
    sess = ev.select("user_id", "ts", "event_id").withColumn(
        "session_id",
        F.sum(
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.to_date(F.min("ts")).alias("day"),
    )
    return per_session.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("long")
        .alias("n_bounces"),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
    )


A34_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS newf
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         CAST(min(ts) AS DATE) AS day
  FROM sess GROUP BY user_id, session_id
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
FROM per_session GROUP BY day
"""

QUERIES["a34_bounce_rate"] = (a34_bounce_rate, A34_ORACLE)


# --- A35: HyperLogLog distinct sketch (engine-exact md5 registers) ----------------------

def a35_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-user estimate per event type, next to the exact count
    it approximates (operators/sketches.py::hll_sketch): 1024 integer
    registers from pure md5/bit-string arithmetic, a harmonic sum that is
    float-exact by construction (all terms share the 2^-39 grid), and the
    standard linear-counting small-range correction."""
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    ev = load(spark, sf_dir, "events")
    regs = hll_sketch(ev, ["event_type"], "user_id", b=10)
    est = hll_estimate(regs, ["event_type"], b=10)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


A35_ORACLE = """
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM events
), reg AS (
  SELECT event_type, h // 274877906944 AS j,
         max(CASE WHEN h % 274877906944 = 0 THEN 39
                  ELSE 39 - length(bin(h % 274877906944)) END) AS M
  FROM h GROUP BY event_type, h // 274877906944
), agg AS (
  SELECT event_type, sum(power(2.0, -M)) AS zu, count(*) AS nr
  FROM reg GROUP BY event_type
), ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT a.event_type, 1024 AS m, CAST(1024 - nr AS BIGINT) AS n_empty,
       round(CASE WHEN (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024
                       / (zu + (1024 - nr)) <= 2560.0 AND 1024 - nr > 0
                  THEN 1024.0 * ln(1024.0 / (1024 - nr))
                  ELSE (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024
                       / (zu + (1024 - nr)) END, 3) AS est_distinct,
       e.exact_distinct
FROM agg a JOIN ex e USING (event_type)
"""

QUERIES["a35_hll"] = (a35_hll, A35_ORACLE)


# --- G1: fixed-point PageRank over the event-transition graph ---------------------------

def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the event-type transition graph (edges =
    consecutive events per user, weight = transition count), 3 iterations
    of integer nano-unit fixed-point arithmetic
    (operators/graph.py::pagerank_fixed_point) — bit-identical across
    engines because no float ever enters the rank update."""
    from pyspark.sql.window import Window

    from peskas_timor_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    trans = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank_fixed_point(trans, "src", "dst", "w", n_iter=3)


def _g1_sql(n_iter: int = 3) -> str:
    ctes = ["""ed AS MATERIALIZED (
  SELECT s, d, count(*) AS w FROM (
    SELECT event_type AS s,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
    FROM events
  ) WHERE d IS NOT NULL GROUP BY s, d
)""", """nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (SELECT s AS node FROM ed UNION ALL SELECT d FROM ed)
)""", """nn AS (SELECT count(*) AS n FROM nodes)""", """ew AS MATERIALIZED (
  SELECT ed.s, ed.d, ed.w, ow.ow
  FROM ed JOIN (SELECT s, sum(w) AS ow FROM ed GROUP BY s) ow USING (s)
)""", """r0 AS (
  SELECT node, CAST(1000000000 // nn.n AS BIGINT) AS r FROM nodes, nn
)"""]
    for i in range(n_iter):
        ctes.append(f"""r{i + 1} AS MATERIALIZED (
  SELECT n.node,
         CAST(15 * 1000000000::BIGINT // (100 * nn.n)
              + 85 * coalesce(s.s, 0) // 100 AS BIGINT) AS r
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.d AS node, sum(r.r * e.w // e.ow) AS s
    FROM ew e JOIN r{i} r ON r.node = e.s GROUP BY e.d
  ) s ON s.node = n.node
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank_nanos, {n_iter} AS n_iter FROM r{n_iter}"
    )


QUERIES["g1_pagerank"] = (g1_pagerank, _g1_sql())


# --- A36: sliding 7-day distinct users via HLL register unions --------------------------

def a36_sliding_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct-user estimate per day WITHOUT rescanning
    any day's events: sketch each day once (hll_sketch), then the sliding
    union is an element-wise register max over an integer-day RANGE
    window — the pattern that turns rolling MAU over 100 TB of events
    into arithmetic over (days x 1024) register rows. Gaps in the
    calendar are handled by the RANGE frame; buckets absent from a
    window fall back to the linear-counting zeros path."""
    from pyspark.sql.window import Window

    from peskas_timor_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    regs = hll_sketch(ev, ["day"], "user_id", b=10)
    days = regs.select("day").distinct()
    seen_j = regs.select("j").distinct()
    grid = days.crossJoin(seen_j)
    w = (
        Window.partitionBy("j")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    slid = (
        grid.join(regs, ["day", "j"], "left")
        .withColumn("M7", F.max("M").over(w))
        .filter(F.col("M7").isNotNull())
        .select("day", "j", F.col("M7").alias("M"))
    )
    return hll_estimate(slid, ["day"], b=10).orderBy("day")


A36_ORACLE = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM events
), regs AS (
  SELECT day, h // 274877906944 AS j,
         max(CASE WHEN h % 274877906944 = 0 THEN 39
                  ELSE 39 - length(bin(h % 274877906944)) END) AS M
  FROM ev GROUP BY day, h // 274877906944
), grid AS (
  SELECT d.day, s.j
  FROM (SELECT DISTINCT day FROM regs) d
  CROSS JOIN (SELECT DISTINCT j FROM regs) s
), slid AS (
  SELECT g.day, g.j,
         max(r.M) OVER (
           PARTITION BY g.j
           ORDER BY g.day - DATE '1970-01-01'
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
         ) AS M7
  FROM grid g LEFT JOIN regs r ON r.day = g.day AND r.j = g.j
), agg AS (
  SELECT day, sum(power(2.0, -M7)) AS zu, count(*) AS nr
  FROM slid WHERE M7 IS NOT NULL GROUP BY day
)
SELECT day, 1024 AS m, CAST(1024 - nr AS BIGINT) AS n_empty,
       round(CASE WHEN (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024
                       / (zu + (1024 - nr)) <= 2560.0 AND 1024 - nr > 0
                  THEN 1024.0 * ln(1024.0 / (1024 - nr))
                  ELSE (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024
                       / (zu + (1024 - nr)) END, 3) AS est_distinct
FROM agg
ORDER BY day
"""

QUERIES["a36_sliding_hll"] = (a36_sliding_hll, A36_ORACLE)


# --- A38: Gini coefficient of per-user activity -----------------------------------------

def a38_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of event-count concentration across users, per
    event type — the inequality gauge for activity/traffic skew (and the
    number that says whether a salting strategy is worth it). The
    rank-weighted numerator 2*sum(i*y_i) - (n+1)*sum(y) is EXACT integer
    arithmetic over the sorted counts; one float division at the end.
    Ranking ties break on user_id — equal counts contribute the same
    total weight either way, so the statistic is tie-stable."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("y"), F.asc("user_id"))
    ranked = per_user.withColumn("i", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("y").alias("total"),
            (2 * F.sum(F.col("i") * F.col("y"))
             - (F.count(F.lit(1)) + 1) * F.sum("y")).alias("__num__"),
        )
        .select(
            "event_type",
            "n_users",
            F.col("total").cast("long").alias("total"),
            F.round(
                F.col("__num__") / (F.col("n_users") * F.col("total")), 6
            ).alias("gini"),
        )
    )


A38_ORACLE = """
WITH per_user AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, y,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY y, user_id) AS BIGINT) AS i
  FROM per_user
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(y) AS BIGINT) AS total,
       round(CAST(2 * sum(i * y) - (count(*) + 1) * sum(y) AS DOUBLE)
             / CAST(count(*) * sum(y) AS DOUBLE), 6) AS gini
FROM ranked GROUP BY event_type
"""

QUERIES["a38_gini"] = (a38_gini, A38_ORACLE)


def _copurchase_pairs(spark, sf_dir: str, modulus: int):
    """Shared part co-purchase edge builder for the graph queries (g2/g3/
    g4): parts are adjacent when they share an order, scoped to a
    deterministic 1-in-``modulus`` order sample. Bounded BY THE BASKET
    (<= 7 lineitems per order -> <= 21 pairs) — the market-basket
    guarantee that keeps the self-join linear in orders."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % modulus == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    return (
        x.join(y, "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
    )


def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count over the part co-purchase graph (parts are
    adjacent when they share an order) via the degree-ordered
    node-iterator (operators/graph.py::triangle_count). The co-occurrence
    edge build is bounded BY THE BASKET (<= 7 lineitems per order -> <= 21
    pairs), the classic market-basket guarantee; the oracle counts
    triangles independently with a 3-way canonical a<b<c join, so the
    degree-orientation machinery is verified against a structurally
    different exact method."""
    from peskas_timor_data_pipeline_spark.operators.graph import triangle_count

    # deterministic 1-in-5 order scope: at sf0.1 the full co-purchase
    # graph runs ~1.2M edges with average degree ~120 — tens of millions
    # of wedges, which the DRIVER's vanilla 1g session (and the oracle's
    # unoriented 3-way join under a DuckDB memory cap) cannot hold. The
    # operator itself is the scale path; the fixture query checks
    # correctness on a graph sized to the grading harness.
    return triangle_count(_copurchase_pairs(spark, sf_dir, 5), "src", "dst")


G2_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 5 = 0),
und AS MATERIALIZED (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y USING (l_orderkey)
  WHERE x.l_partkey < y.l_partkey
),
nodes AS (SELECT DISTINCT n FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und)),
tri AS (
  SELECT count(*) AS n_triangles
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
       CAST(t.n_triangles AS BIGINT) AS n_triangles
FROM tri t
"""

QUERIES["g2_triangle_count"] = (g2_triangle_count, G2_ORACLE)


# --- G3: k-core peeling over the part co-purchase graph ---------------------------------

def g3_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (operators/graph.py::k_core) on a 1-in-20
    co-purchase graph: parts adjacent when they share an order, k=8,
    3 PINNED peeling rounds (both engines replay the identical peeling
    prefix — run-to-fixpoint would make the row set depend on convergence
    detection). The 1-in-20 scope keeps the fixture graph sparse enough
    that peeling actually removes nodes at every SF; the operator itself
    carries the scale story (per-round: one degree groupBy + two
    semi-joins, no cartesian)."""
    from peskas_timor_data_pipeline_spark.operators.graph import k_core

    return k_core(_copurchase_pairs(spark, sf_dir, 20), "src", "dst",
                  k=8, n_rounds=3)


def _g3_sql(k: int = 8, n_rounds: int = 3) -> str:
    ctes = ["""li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 20 = 0)""", """e0 AS MATERIALIZED (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y USING (l_orderkey)
  WHERE x.l_partkey < y.l_partkey
)"""]
    for i in range(n_rounds):
        ctes.append(f"""d{i} AS MATERIALIZED (
  SELECT n, count(*) AS d FROM (
    SELECT a AS n FROM e{i} UNION ALL SELECT b FROM e{i}
  ) GROUP BY n
)""")
        ctes.append(f"""e{i + 1} AS MATERIALIZED (
  SELECT a, b FROM e{i}
  WHERE a IN (SELECT n FROM d{i} WHERE d >= {k})
    AND b IN (SELECT n FROM d{i} WHERE d >= {k})
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT node, CAST(count(*) AS BIGINT) AS degree,
       {k} AS k, {n_rounds} AS n_rounds
FROM (SELECT a AS node FROM e{n_rounds} UNION ALL SELECT b FROM e{n_rounds})
GROUP BY node HAVING count(*) >= {k}"""
    )


QUERIES["g3_kcore"] = (g3_kcore, _g3_sql())


# --- A39: Neyman-optimal stratified allocation ------------------------------------------

def a39_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation (operators/estimate.py::neyman_allocation) of a
    1000-row QA sample across (l_returnflag, l_linestatus) strata weighted
    by quantity variance: per-stratum moments are exact integer
    aggregates, every derived float is a fixed per-row IEEE expression,
    and the one cross-strata float sum is a pinned sorted fold — the only
    way a float reduction enters a hashed output (SURVEY §7.4)."""
    from peskas_timor_data_pipeline_spark.operators.estimate import (
        neyman_allocation,
    )

    li = load(spark, sf_dir, "lineitem")
    return neyman_allocation(
        li, ["l_returnflag", "l_linestatus"], "l_quantity", total_n=1000
    )


A39_ORACLE = """
WITH per AS MATERIALIZED (
  SELECT l_returnflag, l_linestatus,
         count(*) AS n_rows,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_m,
         sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT))
           AS sum_m2
  FROM lineitem GROUP BY l_returnflag, l_linestatus
), wv AS (
  SELECT *,
         CASE WHEN n_rows >= 2
              THEN CAST(CAST(n_rows AS HUGEINT) * sum_m2
                        - CAST(sum_m AS HUGEINT) * CAST(sum_m AS HUGEINT)
                        AS DOUBLE)
                   / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0))
              ELSE 0.0::DOUBLE END AS var_d,
         CAST(n_rows AS DOUBLE)
           * sqrt(CASE WHEN n_rows >= 2
                       THEN CAST(CAST(n_rows AS HUGEINT) * sum_m2
                                 - CAST(sum_m AS HUGEINT) * CAST(sum_m AS HUGEINT)
                                 AS DOUBLE)
                            / (CAST(n_rows AS DOUBLE)
                               * (CAST(n_rows AS DOUBLE) - 1.0))
                       ELSE 0.0::DOUBLE END) AS w
  FROM per
), tot AS (
  SELECT list_reduce([0.0::DOUBLE] || list_sort(list(w)), (a, b) -> a + b)
         AS wsum
  FROM wv
)
SELECT l_returnflag, l_linestatus,
       CAST(n_rows AS BIGINT) AS n_rows,
       sum_m,
       CAST(floor(var_d * 1000000 + 0.5) AS BIGINT) AS var_micro,
       CASE WHEN t.wsum > 0
            THEN CAST(floor(1000.0::DOUBLE * w / t.wsum + 0.5) AS BIGINT)
            ELSE 0 END AS alloc_n
FROM wv CROSS JOIN tot t
"""

QUERIES["a39_neyman_allocation"] = (a39_neyman_allocation, A39_ORACLE)


# --- A40: Cohen's kappa inter-rater agreement -------------------------------------------

def a40_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (operators/estimate.py::cohen_kappa) between two
    deterministic 'annotators' over orders: priority-derived vs fixed
    price-tercile labels on the shared {high, med, low} set. Exact
    integer contingency arithmetic end to end; the final signed ratio is
    floor()ed over the one double division identically in both engines
    (truncating div would differ on negative kappa)."""
    from peskas_timor_data_pipeline_spark.operators.estimate import cohen_kappa

    o = load(spark, sf_dir, "orders")
    labeled = o.select(
        F.when(F.substring("o_orderpriority", 1, 1).isin("1", "2"), "high")
        .when(F.substring("o_orderpriority", 1, 1) == "3", "med")
        .otherwise("low")
        .alias("rater_a"),
        F.when(F.expr("floor(o_totalprice * 100 + 0.5d)") >= 33000000, "high")
        .when(F.expr("floor(o_totalprice * 100 + 0.5d)") >= 16500000, "med")
        .otherwise("low")
        .alias("rater_b"),
    )
    return cohen_kappa(labeled, "rater_a", "rater_b")


A40_ORACLE = """
WITH labeled AS (
  SELECT CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 'high'
              WHEN substr(o_orderpriority, 1, 1) = '3' THEN 'med'
              ELSE 'low' END AS la,
         CASE WHEN floor(o_totalprice * 100 + 0.5) >= 33000000 THEN 'high'
              WHEN floor(o_totalprice * 100 + 0.5) >= 16500000 THEN 'med'
              ELSE 'low' END AS lb
  FROM orders
), cont AS MATERIALIZED (
  SELECT la, lb, count(*) AS c FROM labeled GROUP BY la, lb
), marg AS (
  SELECT coalesce(CAST(sum(CAST(ra.s AS BIGINT) * CAST(cb.s AS BIGINT))
                       AS BIGINT), 0) AS pe_num
  FROM (SELECT la, sum(c) AS s FROM cont GROUP BY la) ra
  JOIN (SELECT lb, sum(c) AS s FROM cont GROUP BY lb) cb ON ra.la = cb.lb
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT) AS n_agree
  FROM cont
)
SELECT t.n, t.n_agree, m.pe_num,
       CAST(t.n_agree * 1000000 // t.n AS BIGINT) AS po_ppm,
       CAST(floor(1000000.0::DOUBLE * m.pe_num
                  / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)))
            AS BIGINT) AS pe_ppm,
       CASE WHEN t.n * t.n != m.pe_num THEN
         CAST(floor(1000000.0::DOUBLE * (t.n * t.n_agree - m.pe_num)
                    / (t.n * t.n - m.pe_num)) AS BIGINT) END AS kappa_micro
FROM tot t CROSS JOIN marg m
"""

QUERIES["a40_cohen_kappa"] = (a40_cohen_kappa, A40_ORACLE)


# --- G4: deterministic label propagation communities -------------------------------------

def g4_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous min-tie label propagation
    (operators/graph.py::label_propagation) on the same sparse 1-in-20
    co-purchase graph as g3, 3 pinned rounds. Unlike connected
    components, LPA can split a component into several communities; the
    determinism pins (synchronous rounds + smallest-label ties) make the
    community assignment a pure function of the graph, hash-checkable
    against the oracle's window replay."""
    from peskas_timor_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    return label_propagation(_copurchase_pairs(spark, sf_dir, 20),
                             "src", "dst", n_rounds=3)


def _g4_sql(n_rounds: int = 3) -> str:
    ctes = ["""li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 20 = 0)""", """und AS MATERIALIZED (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y USING (l_orderkey)
  WHERE x.l_partkey < y.l_partkey
)""", """bo AS MATERIALIZED (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
)""", """l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM bo)"""]
    for i in range(n_rounds):
        ctes.append(f"""l{i + 1} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT b.v AS node, l.label, count(*) AS c,
           row_number() OVER (PARTITION BY b.v
                              ORDER BY count(*) DESC, l.label) AS rn
    FROM bo b JOIN l{i} l ON l.node = b.u
    GROUP BY b.v, l.label
  ) WHERE rn = 1
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, label, {n_rounds} AS n_rounds FROM l{n_rounds}"
    )


QUERIES["g4_label_propagation"] = (g4_label_propagation, _g4_sql())


def g5_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss peeling (operators/graph.py::k_truss) on the 1-in-20
    co-purchase graph: edges must sit in >= k-2 triangles, 3 PINNED
    peeling rounds (same pinned-prefix contract as g3's k-core — both
    engines replay the identical peeling sequence). Strictly stronger
    cohesion than the k-core: every surviving edge has k-2 triangle
    witnesses on the survivor set."""
    from peskas_timor_data_pipeline_spark.operators.graph import k_truss

    return k_truss(_copurchase_pairs(spark, sf_dir, 20), "src", "dst",
                   k=4, n_rounds=3)


def _g5_sql(k: int = 4, n_rounds: int = 3) -> str:
    ctes = ["""li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 20 = 0)""", """e0 AS MATERIALIZED (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y USING (l_orderkey)
  WHERE x.l_partkey < y.l_partkey
)"""]
    for i in range(n_rounds):
        ctes.append(f"""tri{i} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e{i} e1 JOIN e{i} e2 ON e1.b = e2.a
  WHERE EXISTS (SELECT 1 FROM e{i} e3 WHERE e3.a = e1.a AND e3.b = e2.b)
)""")
        ctes.append(f"""sup{i} AS MATERIALIZED (
  SELECT e.a, e.b, coalesce(c.support, 0) AS support
  FROM e{i} e LEFT JOIN (
    SELECT a, b, count(*) AS support FROM (
      SELECT x AS a, y AS b FROM tri{i}
      UNION ALL SELECT y AS a, z AS b FROM tri{i}
      UNION ALL SELECT x AS a, z AS b FROM tri{i}
    ) GROUP BY a, b
  ) c USING (a, b)
)""")
        ctes.append(f"""e{i + 1} AS MATERIALIZED (
  SELECT a, b FROM sup{i} WHERE support >= {k - 2}
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT a, b, CAST(support AS BIGINT) AS support,
       {k} AS k, {n_rounds} AS n_rounds
FROM sup{n_rounds - 1} WHERE support >= {k - 2}"""
    )


QUERIES["g5_ktruss"] = (g5_ktruss, _g5_sql())


# --- G6: link prediction (common neighbors + Adamic-Adar) --------------------------------

def g6_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors / Adamic-Adar link prediction
    (operators/graph.py::link_prediction_scores) on the same sparse
    1-in-20 co-purchase graph as g3: score non-adjacent part pairs
    sharing an order-mate and keep the global top 50. Per-center AA
    terms round to integer micro-units BEFORE the pair sum, so the
    hashed aggregate is a BIGINT sum; the top-50 ordering is total
    (cn desc, aa desc, x, y)."""
    from peskas_timor_data_pipeline_spark.operators.graph import (
        link_prediction_scores,
    )

    return link_prediction_scores(
        _copurchase_pairs(spark, sf_dir, 20), "src", "dst", top_r=50
    )


G6_ORACLE = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 20 = 0
), e AS MATERIALIZED (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y USING (l_orderkey)
  WHERE x.l_partkey < y.l_partkey
), deg AS MATERIALIZED (
  SELECT n, count(*) AS d FROM (
    SELECT a AS n FROM e UNION ALL SELECT b FROM e
  ) GROUP BY n
), adj AS MATERIALIZED (
  SELECT c, x,
         CASE WHEN d > 1
              THEN CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE)) + 0.5) AS BIGINT)
              ELSE 0 END AS aa_w
  FROM (SELECT a AS c, b AS x FROM e UNION ALL SELECT b AS c, a AS x FROM e) u
  JOIN deg ON u.c = deg.n
), wedge AS (
  SELECT a1.x AS u, a2.x AS v, a1.aa_w
  FROM adj a1 JOIN adj a2 USING (c)
  WHERE a1.x < a2.x
), cand AS (
  SELECT u, v, aa_w FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = w.u AND e.b = w.v)
), scored AS (
  SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors,
         CAST(sum(aa_w) AS BIGINT) AS aa_micro
  FROM cand GROUP BY u, v
)
SELECT u AS x, v AS y, common_neighbors, aa_micro
FROM scored
ORDER BY common_neighbors DESC, aa_micro DESC, x, y
LIMIT 50
"""

QUERIES["g6_link_prediction"] = (g6_link_prediction, G6_ORACLE)


# --- G7: pointer-jump hierarchy closure ---------------------------------------------------

def g7_tree_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rooted-tree transitive closure by pointer jumping
    (operators/graph.py::pointer_jump_closure) on the deterministic
    halving hierarchy parent(k) = max(k div 2, 1) over part keys — a
    binary category tree of depth log2(max key), flattened in 5 PINNED
    doubling rounds (resolves depth <= 32; the fixture's deepest node is
    ~18). The oracle replays the chain with a recursive CTE — the naive
    O(depth) recursion the doubling operator exists to avoid."""
    from peskas_timor_data_pipeline_spark.operators.graph import (
        pointer_jump_closure,
    )

    part = load(spark, sf_dir, "part")
    nodes = part.select(
        F.col("p_partkey").alias("node"),
        F.when(F.col("p_partkey") <= 1, F.col("p_partkey"))
        .otherwise(F.expr("p_partkey div 2"))
        .alias("parent"),
    )
    out = pointer_jump_closure(nodes, "node", "parent", n_rounds=5)
    return out.select(
        "node", "root", "depth", F.col("resolved").cast("int").alias("resolved")
    )


G7_ORACLE = """
WITH RECURSIVE nodes AS (
  SELECT p_partkey AS node,
         CASE WHEN p_partkey <= 1 THEN p_partkey ELSE p_partkey // 2 END AS parent
  FROM part
), walk(node, anc, depth) AS (
  SELECT node, parent, CASE WHEN parent = node THEN 0 ELSE 1 END FROM nodes
  UNION ALL
  SELECT w.node, n.parent, w.depth + 1
  FROM walk w JOIN nodes n ON w.anc = n.node
  WHERE n.parent <> w.anc
)
SELECT w.node, w.anc AS root, CAST(w.depth AS BIGINT) AS depth,
       1 AS resolved
FROM walk w JOIN nodes n ON w.anc = n.node
WHERE n.parent = n.node
"""

QUERIES["g7_tree_closure"] = (g7_tree_closure, G7_ORACLE)


# --- A41: pairwise association rules ------------------------------------------------------

def a41_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules
    (operators/affinity.py::association_rules): orders are baskets,
    part brands are items, min_support 20 — support/confidence/lift
    for every surviving brand pair, both rule directions. The Apriori
    prune broadcasts the frequent-brand set before pair generation;
    confidence/lift are single IEEE expressions over exact integer
    counts (never a float sum)."""
    from peskas_timor_data_pipeline_spark.operators.affinity import (
        association_rules,
    )

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    bi = li.join(
        part.select("p_partkey", "p_brand"), li.l_partkey == part.p_partkey
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
    return association_rules(bi, "basket", "item", min_support=20)


A41_ORACLE = """
WITH bi AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
), sup AS MATERIALIZED (
  SELECT item, CAST(count(*) AS BIGINT) AS sup
  FROM bi GROUP BY item HAVING count(*) >= 20
), pruned AS (
  SELECT basket, item FROM bi WHERE item IN (SELECT item FROM sup)
), pairs AS MATERIALIZED (
  SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS ps
  FROM pruned a JOIN pruned b USING (basket)
  WHERE a.item < b.item
  GROUP BY a.item, b.item HAVING count(*) >= 20
), nb AS (
  SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n FROM bi
), directed AS (
  SELECT ia AS antecedent, ib AS consequent, ps FROM pairs
  UNION ALL
  SELECT ib AS antecedent, ia AS consequent, ps FROM pairs
)
SELECT d.antecedent, d.consequent,
       d.ps AS pair_support,
       sa.sup AS antecedent_support,
       sc.sup AS consequent_support,
       nb.n AS n_baskets,
       round(CAST(d.ps AS DOUBLE) / sa.sup, 6) AS confidence,
       round(CAST(d.ps AS DOUBLE) * nb.n
             / (CAST(sa.sup AS DOUBLE) * sc.sup), 6) AS lift
FROM directed d
JOIN sup sa ON d.antecedent = sa.item
JOIN sup sc ON d.consequent = sc.item
CROSS JOIN nb
"""

QUERIES["a41_assoc_rules"] = (a41_assoc_rules, A41_ORACLE)


# --- G8: HITS hubs and authorities --------------------------------------------------------

def g8_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (operators/graph.py::hits_scores) on the directed
    customer -> part purchase graph from a 1-in-10 order sample: 3
    PINNED nano-integer rounds, top-25 per side. Every half-round is an
    exact BIGINT sum + DECIMAL(38,0) integral-div normalization — no
    float enters the iteration, so the oracle replays identical
    integers."""
    from peskas_timor_data_pipeline_spark.operators.graph import hits_scores

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    edges = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst"))
    )
    return hits_scores(edges, "src", "dst", n_rounds=3, top_r=25)


def _g8_sql(n_rounds: int = 3, top_r: int = 25) -> str:
    nano = 1_000_000_000
    ctes = ["""e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS s, l_partkey AS d
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderkey % 10 = 0
)""", f"""h0 AS MATERIALIZED (
  SELECT DISTINCT s AS n, CAST({nano} AS BIGINT) AS h FROM e
)"""]
    for r in range(1, n_rounds + 1):
        ctes.append(f"""ar{r} AS MATERIALIZED (
  SELECT d, CAST(sum(h) AS BIGINT) AS a_raw
  FROM e JOIN h{r - 1} ON e.s = h{r - 1}.n GROUP BY d
)""")
        ctes.append(f"""a{r} AS MATERIALIZED (
  SELECT d AS n,
         CAST((CAST(a_raw AS HUGEINT) * {nano})
              // CAST((SELECT max(a_raw) FROM ar{r}) AS HUGEINT) AS BIGINT)
           AS a
  FROM ar{r}
)""")
        ctes.append(f"""hr{r} AS MATERIALIZED (
  SELECT s, CAST(sum(a) AS BIGINT) AS h_raw
  FROM e JOIN a{r} ON e.d = a{r}.n GROUP BY s
)""")
        ctes.append(f"""h{r} AS MATERIALIZED (
  SELECT s AS n,
         CAST((CAST(h_raw AS HUGEINT) * {nano})
              // CAST((SELECT max(h_raw) FROM hr{r}) AS HUGEINT) AS BIGINT)
           AS h
  FROM hr{r}
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT * FROM (
  SELECT 'hub' AS side, n AS node, h AS score_nano FROM h{n_rounds}
  ORDER BY score_nano DESC, node LIMIT {top_r}
)
UNION ALL
SELECT * FROM (
  SELECT 'authority' AS side, n AS node, a AS score_nano FROM a{n_rounds}
  ORDER BY score_nano DESC, node LIMIT {top_r}
)"""
    )


QUERIES["g8_hits"] = (g8_hits, _g8_sql())


# --- A42: exponential time-decay aggregation ----------------------------------------------

def a42_decayed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted per-type event mass
    (operators/funnel.py::decayed_aggregate): half-life 7 days as of a
    pinned 2024-02-05 — the freshness prior for source scoring. Decay
    weights are fixed per-row IEEE expressions rounded to micro-units
    BEFORE the sums, so every aggregate is an exact BIGINT reduction."""
    from peskas_timor_data_pipeline_spark.operators.funnel import (
        decayed_aggregate,
    )

    e = load(spark, sf_dir, "events")
    return decayed_aggregate(
        e, ["event_type"], "ts", "value", as_of="2024-02-05",
        half_life_days=7,
    )


A42_ORACLE = """
WITH w AS (
  SELECT event_type,
         CAST(floor(
           1000000.0
           * exp(-0.09902102579427789 * CAST(greatest(
               date_diff('day', CAST(ts AS DATE), DATE '2024-02-05'), 0
             ) AS DOUBLE))
           + 0.5) AS BIGINT) AS wm,
         CAST(floor(
           1000000.0 * value
           * exp(-0.09902102579427789 * CAST(greatest(
               date_diff('day', CAST(ts AS DATE), DATE '2024-02-05'), 0
             ) AS DOUBLE))
           + 0.5) AS BIGINT) AS wvm
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(wm) AS BIGINT) AS decayed_count_micro,
       CAST(sum(wvm) AS BIGINT) AS decayed_value_micro
FROM w GROUP BY event_type
"""

QUERIES["a42_decayed_agg"] = (a42_decayed_agg, A42_ORACLE)


# --- A43: RFM segmentation ----------------------------------------------------------------

def a43_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer grid (operators/funnel.py::rfm_segments) over
    orders: quintile scores on recency vs pinned 2001-06-15 (the w5
    as-of), order count, and exact-cent spend; every ntile runs over a
    (metric, custkey) total order so boundaries are engine-independent."""
    from peskas_timor_data_pipeline_spark.operators.funnel import rfm_segments

    o = load(spark, sf_dir, "orders")
    return rfm_segments(
        o, "o_custkey", "o_orderdate", "o_totalprice",
        as_of="2001-06-15", n_tiles=5,
    )


A43_ORACLE = """
WITH per_cust AS MATERIALIZED (
  SELECT o_custkey AS cust,
         CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
                        DATE '2001-06-15') AS BIGINT) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS monetary_cents
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT cust, frequency, monetary_cents,
         ntile(5) OVER (ORDER BY recency_days DESC, cust) AS r_score,
         ntile(5) OVER (ORDER BY frequency ASC, cust) AS f_score,
         ntile(5) OVER (ORDER BY monetary_cents ASC, cust) AS m_score
  FROM per_cust
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(frequency) AS BIGINT) AS total_orders,
       CAST(sum(monetary_cents) AS BIGINT) AS total_monetary_cents
FROM scored GROUP BY r_score, f_score, m_score
"""

QUERIES["a43_rfm_segments"] = (a43_rfm_segments, A43_ORACLE)
