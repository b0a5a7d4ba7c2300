"""Fishery-indicator estimation (SURVEY.md §3.3 step 1).

`estimate_fishery_indicators` re-expressed as one lazy plan over ALL
regions at once — the reference maps an R function over municipalities
serially (R/estimate-catch.R:24-60); in Spark the region is just another
group key, so the "embarrassingly parallel" loop disappears into the
shuffle.

Steps: per (region, month) trip aggregates -> month-spine completion ->
linear-interpolation imputation (M7 replaces Amelia; deterministic) ->
catch = landing_catch x n_landings_per_boat x n_boats -> national rollup
(mean of municipal means / sum of sums, A13, R/estimate-catch.R:487-532).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.operators.interpolate import interpolate_linear


def monthly_indicators(trips: DataFrame) -> DataFrame:
    """Per (region, landing_period): n landings per boat, mean catch, mean
    price (estimate_landings/_value/_catch, R/estimate-catch.R:62-106,
    259-304). Input: merged trips with region, boat id, catch, price."""
    monthly = trips.groupBy(
        "region", F.trunc(F.to_date("landing_date"), "month").alias("landing_period")
    ).agg(
        F.countDistinct("landing_id").alias("n_landings"),
        F.countDistinct("boat_id").alias("n_boats_seen"),
        F.avg("landing_catch").alias("landing_catch"),
        F.avg("catch_price").alias("catch_price"),
    )
    return monthly.withColumn(
        "n_landings_per_boat", F.col("n_landings") / F.col("n_boats_seen")
    )


def complete_and_impute(monthly: DataFrame, spine: DataFrame) -> DataFrame:
    """Right-join every region onto the month spine (W4) and fill gaps by
    linear interpolation (M7 — the deterministic replacement for the
    Amelia/mice draw, whose replicates collapse to the mean anyway)."""
    regions = monthly.select("region").distinct()
    full = regions.crossJoin(spine).join(
        monthly, ["region", "landing_period"], "left"
    )
    out = full
    for c in ("n_landings_per_boat", "landing_catch", "catch_price"):
        out = interpolate_linear(out, ["region"], "landing_period", c)
        out = out.drop("is_imputed") if c != "catch_price" else out
    return out


def scale_to_fleet(imputed: DataFrame, boats_dim: DataFrame) -> DataFrame:
    """catch = landing_catch x n_landings_per_boat x n_boats
    (R/estimate-catch.R:408-430); boats dim from registered_boats
    (R/preprocess-metadata-tables.R:317-337), broadcast."""
    joined = imputed.join(F.broadcast(boats_dim), "region", "left")
    return joined.withColumn(
        "catch",
        F.col("landing_catch") * F.col("n_landings_per_boat") * F.col("n_boats"),
    ).withColumn(
        "revenue",
        F.col("catch_price") * F.col("n_landings_per_boat") * F.col("n_boats"),
    )


def national_rollup(municipal: DataFrame) -> DataFrame:
    """Explicit two-level rollup (A13): national = re-aggregation of
    municipal estimates — mean of means, sum of sums, median of medians,
    exactly as the reference does (NOT a grouping-sets shortcut, to
    preserve its semantics)."""
    return municipal.groupBy("landing_period").agg(
        F.sum("catch").alias("catch"),
        F.sum("revenue").alias("revenue"),
        F.avg("n_landings_per_boat").alias("n_landings_per_boat"),
        F.median("catch_price").alias("catch_price"),
        F.count(F.lit(1)).alias("n_regions"),
    )
