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


def test_clustered_stage_files_own_disjoint_ranges(spark, sf_dir, tmp_path):
    import glob
    import os

    from peskas_timor_data_pipeline_spark.sources.io import write_stage_clustered

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    path = write_stage_clustered(
        li, str(tmp_path), "li_by_date", ["l_shipdate"], n_files=8
    )
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert len(files) > 1
    # every file owns a disjoint l_shipdate range -> min/max stats prune
    ranges = []
    for f in files:
        mm = (
            spark.read.parquet(f)
            .selectExpr("min(l_shipdate) AS lo", "max(l_shipdate) AS hi")
            .first()
        )
        if mm.lo is not None:
            ranges.append((mm.lo, mm.hi))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b  # boundary value may repeat, ranges never interleave
    # the full roundtrip preserves the data
    assert spark.read.parquet(path).count() == li.count()


def test_morton_clustered_files_bound_both_dimensions(spark, tmp_path):
    """Z-order vs plain range clustering: with the Morton key, every file's
    extent shrinks in BOTH dimensions; range-clustering on x alone leaves
    y's per-file extent at the full domain."""
    import glob
    import os

    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.operators.bucketing import morton_key
    from peskas_timor_data_pipeline_spark.sources.io import write_stage_clustered

    n = 64  # 4096 points on a 64x64 grid
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            F.floor(F.col("id") / n).alias("y"),
        )
    )
    pts = grid.withColumn("z", morton_key(F.col("x"), F.col("y"), bits=6))

    def max_extent(path, col):
        exts = []
        for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
            mm = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).first()
            if mm.lo is not None:
                exts.append(mm.hi - mm.lo)
        return max(exts)

    zpath = write_stage_clustered(pts, str(tmp_path), "zorder", ["z"], n_files=16)
    xpath = write_stage_clustered(pts, str(tmp_path), "xrange", ["x"], n_files=16)
    # plain x-clustering: y extent per file is the whole domain
    assert max_extent(xpath, "y") == n - 1
    # z-order: BOTH dimensions bounded well below the domain (16 files on a
    # 64x64 grid -> each file covers a 16x16 quadrant, extent 15)
    assert max_extent(zpath, "x") <= n // 2
    assert max_extent(zpath, "y") <= n // 2
