"""Bucketed co-located join: the plan must contain no shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    from peskas_timor_data_pipeline_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "okey"), "li_b", "okey", 8, sort_by="okey"
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"), "ord_b", "okey", 8, sort_by="okey"
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_b", "ord_b", ["okey"])
        jmode = joined._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        plan = joined._jdf.queryExecution().explainString(jmode)
        assert "Exchange" not in plan  # co-located: bucket i joins bucket i
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        n = joined.groupBy().agg(F.countDistinct("okey").alias("n")).collect()[0].n
        assert n == orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            "o_orderkey"
        ).distinct().count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
