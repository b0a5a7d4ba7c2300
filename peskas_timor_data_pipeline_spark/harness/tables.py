"""Test-table loaders for the correctness harness.

The driver provides a TPC-H-ish star schema (TESTDATA.md); FIXTURES.md §7
maps it onto the reference's domain: lineitem ~ per-length catch rows,
orders ~ landings/submissions, events ~ GPS-tracker stream, part ~
catch_types, customer/supplier ~ boats/devices, documents/embeddings for the
training-data operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from peskas_timor_data_pipeline_spark.session import prep_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; normalizes the session TZ first so
    timestamp->date derivations agree with the naive-timestamp oracle.

    ``events.ts`` varies by testdata generation: TIMESTAMP(NANOS) parquet
    (no native Spark type — read as long nanos via legacy conf, then
    floor-convert with integer division because nanos exceed double's 2^53
    exact range) or TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ).
    Either way the column is normalized to a session-TZ TimestampType so
    date derivations agree with the naive-timestamp DuckDB oracle."""
    prep_session(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
