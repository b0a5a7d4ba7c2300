"""Streaming mergeability of the log-histogram quantile sketch: each
micro-batch sketches independently into (group, bucket, count) rows; the
accumulated buckets sum to exactly the one-pass batch histogram, so the
quantile picks agree. This is the property that lets 100 TB shard into
arbitrary micro-batches without a global pass."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

SCHEMA = StructType(
    [StructField("g", StringType()), StructField("v", DoubleType())]
)


def _write_batch(landing, name, rows):
    with open(landing / name, "w") as f:
        for g, v in rows:
            f.write(json.dumps({"g": g, "v": v}) + "\n")


def _bucketize(df):
    cents = F.round(F.col("v") * 100).cast("long")
    return (
        df.select("g", (F.length(F.bin(cents)) - 1).cast("int").alias("b"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def test_streaming_histogram_merges_to_batch_answer(spark, tmp_path):
    batch1 = [("g", 1.0)] * 5 + [("g", 7.0)] * 2
    batch2 = [("g", 7.0)] * 2 + [("g", 50.0)]

    landing = tmp_path / "landing"
    landing.mkdir()
    _write_batch(landing, "b1.jsonl", batch1)
    sink = str(tmp_path / "buckets")

    def sketch_batch(df, _epoch):
        _bucketize(df).write.mode("append").parquet(sink)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    q = (
        stream.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    _write_batch(landing, "b2.jsonl", batch2)
    q = (
        stream.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = (
        spark.read.parquet(sink)
        .groupBy("g", "b")
        .agg(F.sum("c").alias("c"))
    )
    batch = _bucketize(
        spark.createDataFrame(batch1 + batch2, SCHEMA)
    )
    got = {(r.g, r.b): r.c for r in merged.collect()}
    want = {(r.g, r.b): r.c for r in batch.collect()}
    assert got == want
    # and the quantile read off the merged sketch matches the batch pick:
    # 10 values, p50 target 5 -> cents-100 bucket (b=6, est 0.96)
    cum = sorted(got.items())
    run, p50 = 0, None
    for (_, b), c in cum:
        run += c
        if p50 is None and run >= 5:
            p50 = round(3.0 * (1 << b) / 200.0, 6)
    assert p50 == 0.96
