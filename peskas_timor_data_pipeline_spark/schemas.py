"""Fixed StructType schemas per logical table (SURVEY.md §1.2-§1.4).

The reference discovers schemas dynamically by column-name pattern; here
every source has a declared schema (pushdown + early failure) plus a
declarative cross-version coalesce spec reproducing `coalist`
(R/clean-raw-data.R:237-253) and `merge_versions`
(R/merge-landings.R:124-163).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Two-level nested landings model (R/pt_nest_species.R:36-119 + weights
# R/calculate-weights.R:376-394): species_group -> length_individuals.
LENGTH_INDIVIDUAL = StructType(
    [
        StructField("mean_length", DoubleType()),
        StructField("n_individuals", DoubleType()),
        StructField("weight", DoubleType()),
        StructField("Selenium_mu", DoubleType()),
        StructField("Zinc_mu", DoubleType()),
        StructField("Protein_mu", DoubleType()),
        StructField("Omega_3_mu", DoubleType()),
        StructField("Calcium_mu", DoubleType()),
        StructField("Iron_mu", DoubleType()),
        StructField("Vitamin_A_mu", DoubleType()),
    ]
)

SPECIES_GROUP = StructType(
    [
        StructField("n", StringType()),
        StructField("species", StringType()),
        StructField("food_or_sale", StringType()),
        StructField("length_type", StringType()),
        StructField("length_individuals", ArrayType(LENGTH_INDIVIDUAL)),
    ]
)

ATTACHMENT = StructType(
    [StructField("download_url", StringType()), StructField("id", StringType())]
)

# PDS tracker trips, typed CSV "iTTicccdddccc" (R/preprocess-pds-trips.R:50-62)
PDS_TRIPS = StructType(
    [
        StructField("Trip", IntegerType()),
        StructField("Started", TimestampType()),
        StructField("Ended", TimestampType()),
        StructField("Boat", IntegerType()),
        StructField("Boat Name", StringType()),
        StructField("Boat Gear", StringType()),
        StructField("Community", StringType()),
        StructField("Duration (Seconds)", DoubleType()),
        StructField("Range (Meters)", DoubleType()),
        StructField("Distance (Meters)", DoubleType()),
        StructField("IMEI", StringType()),
        StructField("Device Id", StringType()),
        StructField("Last Seen", StringType()),
    ]
)

# GPS track points, 1 Hz (R/merge-trips.R:137-151)
PDS_TRACKS = StructType(
    [
        StructField("Time", TimestampType()),
        StructField("Boat", IntegerType()),
        StructField("Trip", IntegerType()),
        StructField("Lat", DoubleType()),
        StructField("Lng", DoubleType()),
        StructField("Speed (M/S)", DoubleType()),
        StructField("Range (Meters)", DoubleType()),
        StructField("Heading", DoubleType()),
    ]
)

NUTRIENT_COLS = [
    "Selenium_mu",
    "Zinc_mu",
    "Protein_mu",
    "Omega_3_mu",
    "Calcium_mu",
    "Iron_mu",
    "Vitamin_A_mu",
]

# Cross-survey-version coalesce spec (target <- source priority), replacing
# the reference's pattern-matched `coalist` calls (R/merge-landings.R:124-163,
# R/clean-raw-data.R:336-359) with a declarative, reviewable table.
MERGE_VERSIONS_SPEC: dict[str, list[str]] = {
    "fuel_L": ["fuel_L", "trip_group/fuel_L", "fuel"],
    "habitat": ["habitat", "trip_group/habitat"],
    "reason_no_activity": ["reason_no_activity", "trip_group/reason_no_activity"],
    "mesh_size": ["trip_group/mesh_size", "mesh_size"],
    "gear_type": ["trip_group/gear_type", "gear_type", "gear"],
}
