"""The native Python DataSource for Kobo submissions: executor-parallel
id-range partitions and predicate pushdown into the REST query."""

from __future__ import annotations

from pyspark.sql import functions as F


def _read(spark, **opts):
    from peskas_timor_data_pipeline_spark.sources.kobo_source import register

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    reader = spark.read.format("kobo")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_kobo_source_reads_partitioned(spark):
    df = _read(spark, transport="fake:100", maxId="100", numPartitions="4")
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 4
    row = df.filter(F.col("_id") == 7).collect()[0]
    assert row._submission_time.startswith("2024-01-08")
    assert '"gear": "g1"' in row.payload  # 7 % 3 == 1

def test_kobo_source_pushes_id_range_into_rest_query(spark):
    df = _read(spark, transport="fake:100", maxId="100", numPartitions="4")
    inc = df.filter(F.col("_id") > 90)
    assert inc.count() == 10
    # pushdown proof: the GreaterThan reached the source, so no post-scan
    # Filter node remains in the plan
    import re

    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Filter \(", plan)  # no Filter NODE post-scan
    # unpushable filters still work (evaluated by Spark post-scan)
    assert df.filter(F.col("payload").contains('"catch": 3')).count() > 0
