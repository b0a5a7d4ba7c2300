from pyspark.sql import functions as F

from peskas_timor_data_pipeline_spark.functions.deterministic import (
    mgsub,
    ordered_first,
    ordered_last,
    rename_columns,
)


def test_ordered_first_last_partition_stable(spark):
    df = spark.createDataFrame(
        [("a", 3, "z"), ("a", 1, "x"), ("a", 2, "y"), ("b", 9, "q")],
        ["g", "ord", "v"],
    )
    for d in (df, df.repartition(7)):
        out = d.groupBy("g").agg(
            ordered_first(F.col("v"), F.col("ord")).alias("first_v"),
            ordered_last(F.col("v"), F.col("ord")).alias("last_v"),
        )
        rows = {r.g: r for r in out.collect()}
        assert rows["a"].first_v == "x" and rows["a"].last_v == "z"
        assert rows["b"].first_v == "q"


def test_mgsub_and_rename(spark):
    df = spark.createDataFrame(
        [("species_group/no_fish 10-15",)], ["trip_group/gear_type"]
    )
    out = df.select(mgsub(F.col("`trip_group/gear_type`"), {"_group/": "_", "-": "_"}).alias("x"))
    assert out.collect()[0].x == "species_no_fish 10_15"
    renamed = rename_columns(df, {r"^trip_group/": "", "_type$": ""})
    assert renamed.columns == ["gear"]
