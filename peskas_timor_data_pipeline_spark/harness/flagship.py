"""Flagship query (SURVEY.md §7.1): trip-level CPUE aggregation.

Mirrors the reference's CPUE pipeline (R/format-public-data.R:861-900):
nested catch rows are exploded, summed per trip, first(dim) attached, cpue
computed with null/zero guards, then median(cpue) per (municipality, gear)
group.

On the driver's star schema: lineitem rows are re-nested per order into the
engine's array<struct> model (exercising nest), exploded back (unnest),
summed per order (trip), joined to orders (landing dims), and aggregated to
median CPUE per order priority (gear analogue).

Scale shape: one shuffle to nest (by l_orderkey), the explode is narrow, the
per-order agg reuses the same key partitioning, orders join is
shuffle-on-key, final groupBy is on a low-cardinality dim -> partial
aggregation map-side. At 100 TB nothing here materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.harness.tables import (
    exact_avg, exact_avg_sql, load,
)
from peskas_timor_data_pipeline_spark.operators.restructure import nest, unnest


def flagship_cpue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")

    # Nest to the reference's data model (species_group analogue), then
    # unnest — exercises the array<struct> round-trip the pipeline lives on.
    nested = nest(
        lineitem,
        keys=["l_orderkey"],
        nested_col="catch_group",
        value_cols=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    flat = unnest(nested, "catch_group", keep_empty=True)

    per_trip = flat.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("trip_catch"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("trip_value"),
        F.count("l_partkey").alias("n_species"),
    )

    trips = per_trip.join(
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        per_trip.l_orderkey == orders.o_orderkey,
        "inner",
    )
    # cpue = catch per unit effort; effort analogue = o_totalprice/1000,
    # guarded against zero/null effort like the reference's trip_length.
    cpue = trips.withColumn(
        "cpue",
        F.when(
            F.col("o_totalprice") > 0,
            F.col("trip_catch") / (F.col("o_totalprice") / 1000.0),
        ),
    )
    return (
        cpue.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.round(F.median("cpue"), 6).alias("median_cpue"),
            exact_avg("trip_catch", 100).alias("avg_catch"),
            F.round(F.sum("trip_catch"), 2).alias("sum_catch"),
            F.max("n_species").alias("max_species"),
        )
        .orderBy("o_orderpriority")
    )


FLAGSHIP_ORACLE = f"""
WITH per_trip AS (
    SELECT l_orderkey,
           sum(l_quantity) AS trip_catch,
           sum(l_extendedprice * (1 - l_discount)) AS trip_value,
           count(l_partkey) AS n_species
    FROM lineitem GROUP BY l_orderkey
), trips AS (
    SELECT t.*, o.o_orderpriority, o.o_totalprice,
           CASE WHEN o.o_totalprice > 0
                THEN t.trip_catch / (o.o_totalprice / 1000.0) END AS cpue
    FROM per_trip t JOIN orders o ON t.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       count(*) AS n_trips,
       round(median(cpue), 6) AS median_cpue,
       {exact_avg_sql('trip_catch', 100)} AS avg_catch,
       round(sum(trip_catch), 2) AS sum_catch,
       CAST(max(n_species) AS BIGINT) AS max_species
FROM trips
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

QUERIES = {
    "flagship_cpue": (flagship_cpue, FLAGSHIP_ORACLE),
}
