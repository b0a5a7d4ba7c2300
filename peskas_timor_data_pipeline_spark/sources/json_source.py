"""Nested JSON source (S2) — the flatten-free alternative.

The reference recursively flattens Kobo's nested submissions into
hundreds of ``parent.N.child`` columns (R/retrieve-survey-data.R:236-282)
because R dataframes can't hold nested data. Spark can: declare the
nested schema and read repeat groups directly as array<struct>, skipping
both the flatten AND the later re-nesting (pt_nest_*). The wide->nested
projection in pipeline.landings exists only for compatibility with
already-flattened exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

# Kobo submission with repeat groups kept native.
KOBO_SUBMISSION_SCHEMA = StructType(
    [
        StructField("_id", StringType()),
        StructField("_submission_time", StringType()),
        StructField("date", StringType()),
        StructField("total_catch_value", StringType()),
        StructField(
            "species_group",
            ArrayType(
                StructType(
                    [
                        StructField("species", StringType()),
                        StructField("food_or_sale", StringType()),
                        StructField(
                            "length_individuals",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("mean_length", StringType()),
                                        StructField("n_individuals", StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        StructField(
            "_attachments",
            ArrayType(
                StructType(
                    [
                        StructField("download_url", StringType()),
                        StructField("id", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_kobo_submissions(
    spark: SparkSession, path: str, schema: StructType = KOBO_SUBMISSION_SCHEMA
) -> DataFrame:
    """Read landed submission JSONL with the nested schema — repeat groups
    arrive as array<struct> directly; no flatten, no re-nest, no shuffle."""
    return spark.read.schema(schema).json(path)


def typed_catches(submissions: DataFrame) -> DataFrame:
    """Cast the all-string nested payload to the typed nested model in
    place with ``transform`` — still zero shuffles."""
    return submissions.withColumn(
        "species_group",
        F.expr(
            """
            transform(species_group, sp -> struct(
                sp.species AS species,
                sp.food_or_sale AS food_or_sale,
                transform(sp.length_individuals, li -> struct(
                    CAST(li.mean_length AS DOUBLE) AS mean_length,
                    CAST(li.n_individuals AS DOUBLE) AS n_individuals
                )) AS length_individuals
            ))
            """
        ),
    )
