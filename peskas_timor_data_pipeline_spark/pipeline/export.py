"""Portal export formatting (SURVEY.md §3.3 step 3, R/export.R:250-436).

Ontology renames to portal field names, month labels ("%B %Y"),
fish-group rollups (the taxa -> fish_group case_when at
R/export.R:287-352, implemented as a broadcast mapping table per P7's
scale guidance), and JSON-shaped outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# taxa -> portal fish group (subset of the ~60-branch case_when,
# R/export.R:287-352; extend by adding rows, not code)
FISH_GROUPS = [
    ("CLP", "Sardines and herrings"),
    ("SDX", "Sardines and herrings"),
    ("TUN", "Tunas and bonitos"),
    ("KAW", "Tunas and bonitos"),
    ("CGX", "Jacks and trevallies"),
    ("SNA", "Snappers and seaperches"),
    ("EMP", "Emperors"),
    ("GZP", "Garfishes and halfbeaks"),
    ("FLY", "Flying fishes"),
    ("MZZ", "Other"),
    ("0", "No catch"),
]

# portal field ontology (R/export.R:202-209 + format-public-data renames)
PORTAL_ONTOLOGY = {
    "landing_period": "period",
    "n_landings_per_boat": "landings_per_boat",
    "landing_catch": "catch_kg",
    "catch_price": "price_usd",
    "grouped_taxa": "fish_group",
}


def fish_group_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(FISH_GROUPS, "catch_taxon string, fish_group string")


def to_portal(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Rename to portal ontology, attach fish groups (broadcast), format
    the month label the way the portal renders it."""
    out = df
    if "catch_taxon" in out.columns:
        out = out.join(F.broadcast(fish_group_dim(spark)), "catch_taxon", "left")
        out = out.withColumn("fish_group", F.coalesce("fish_group", F.lit("Other")))
    renames = {k: v for k, v in PORTAL_ONTOLOGY.items() if k in out.columns}
    out = out.withColumnsRenamed(renames)
    if "period" in out.columns:
        out = out.withColumn("period_label", F.date_format("period", "MMMM yyyy"))
    return out


def json_records(df: DataFrame) -> DataFrame:
    """One JSON document per row (write with sources.io.write_public_json;
    matches the portal's unboxed record shape, R/export.R:386-404)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))
