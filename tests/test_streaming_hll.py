"""Streaming mergeability of the HLL sketch: each micro-batch writes its
(group, bucket, rho-max) registers independently; the element-wise max of
accumulated registers equals the one-pass batch registers EXACTLY — so a
100 TB corpus can sketch shard-by-shard (or day-by-day) and the union
costs a register-wide max, never a rescan."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [StructField("g", StringType()), StructField("u", LongType())]
)


def _write_batch(landing, name, rows):
    with open(landing / name, "w") as f:
        for g, u in rows:
            f.write(json.dumps({"g": g, "u": u}) + "\n")


def test_streaming_hll_registers_merge_to_batch(spark, tmp_path):
    from peskas_timor_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    batch1 = [("g", i) for i in range(0, 800)]
    batch2 = [("g", i) for i in range(400, 1200)]  # overlapping users

    landing = tmp_path / "landing"
    landing.mkdir()
    _write_batch(landing, "b1.jsonl", batch1)
    sink = str(tmp_path / "regs")

    def sketch_batch(df, _epoch):
        hll_sketch(df, ["g"], "u", b=10).write.mode("append").parquet(sink)

    def run_stream():
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

    run_stream()
    _write_batch(landing, "b2.jsonl", batch2)
    run_stream()

    merged = (
        spark.read.parquet(sink)
        .groupBy("g", "j")
        .agg(F.max("M").alias("M"))
    )
    batch = hll_sketch(
        spark.createDataFrame(batch1 + batch2, SCHEMA), ["g"], "u", b=10
    )
    got = sorted((r.j, r.M) for r in merged.collect())
    want = sorted((r.j, r.M) for r in batch.collect())
    assert got == want

    # the estimate off the merged registers equals the batch estimate and
    # sits in the 1.04/sqrt(1024) ~ 3.3% error band around the true 1200
    est_m = hll_estimate(merged, ["g"], b=10).collect()[0].est_distinct
    est_b = hll_estimate(batch, ["g"], b=10).collect()[0].est_distinct
    assert est_m == est_b
    assert abs(est_m - 1200) < 0.12 * 1200


def test_streaming_fingerprint_combines_across_batches(spark, tmp_path):
    """dataset_fingerprint maintains INCREMENTALLY: per-micro-batch
    fingerprints combine by (sum, sum, xor) to exactly the one-pass batch
    fingerprint — so a 100 TB table's content manifest updates per
    ingest batch without rescans."""
    import json as _json

    from pyspark.sql import functions as F

    from peskas_timor_data_pipeline_spark.operators.restructure import (
        dataset_fingerprint,
    )

    batch1 = [("a", 1), ("b", 2)]
    batch2 = [("c", 3), ("a", 1)]

    landing = tmp_path / "landing"
    landing.mkdir()
    for name, rows in (("b1.jsonl", batch1), ("b2.jsonl", batch2)):
        with open(landing / name, "w") as f:
            for k, v in rows:
                f.write(_json.dumps({"k": k, "v": v}) + "\n")
    sink = str(tmp_path / "fps")

    def fp_batch(df, _epoch):
        dataset_fingerprint(df).write.mode("append").parquet(sink)

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    q = (
        stream.writeStream.foreachBatch(fp_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    combined = (
        spark.read.parquet(sink)
        .groupBy("column_name")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_null").alias("n_null"),
            F.expr("bit_xor(xor48)").alias("xor48"),
            F.sum("sum_hi").alias("sum_hi"),
            F.sum("sum_lo").alias("sum_lo"),
        )
    )
    batch = dataset_fingerprint(
        spark.createDataFrame(batch1 + batch2, "k string, v long")
    )
    got = sorted(map(tuple, combined.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
