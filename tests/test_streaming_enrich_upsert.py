"""Stream-static enrichment join and the foreachBatch MERGE upsert sink."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


SCHEMA = StructType(
    [
        StructField("_id", StringType()),
        StructField("_submission_time", TimestampType()),
        StructField("boat_code", StringType()),
        StructField("catch", IntegerType()),
    ]
)


def _write_batch(landing, name, rows):
    with open(landing / name, "w") as f:
        for s in rows:
            f.write(json.dumps(s) + "\n")


def test_enrich_stream_broadcast_dim(spark, tmp_path):
    from peskas_timor_data_pipeline_spark.streaming.ingest import (
        enrich_stream,
        stream_landed_files,
        write_append_sink,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    _write_batch(
        landing,
        "b1.jsonl",
        [
            {"_id": "1", "_submission_time": "2023-05-01T10:00:00", "boat_code": "B1", "catch": 5},
            {"_id": "2", "_submission_time": "2023-05-01T11:00:00", "boat_code": "B9", "catch": 7},
        ],
    )
    dim = spark.createDataFrame(
        [("B1", "canoe"), ("B2", "motor")], ["boat_code", "vessel_type"]
    )
    stream = stream_landed_files(spark, str(landing), SCHEMA)
    enriched = enrich_stream(stream, dim, on=["boat_code"])
    sink = str(tmp_path / "sink")
    q = write_append_sink(enriched, sink, str(tmp_path / "ckpt")).start()
    q.awaitTermination(60)
    rows = {r._id: r.vessel_type for r in spark.read.parquet(sink).collect()}
    # left join: known dim enriched, unknown code survives with null
    assert rows == {"1": "canoe", "2": None}


def test_upsert_sink_merges_across_batches(spark, tmp_path):
    from peskas_timor_data_pipeline_spark.sources.io import read_stage
    from peskas_timor_data_pipeline_spark.streaming.ingest import (
        stream_landed_files,
        upsert_sink,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        landing,
        "b1.jsonl",
        [
            {"_id": "1", "_submission_time": "2023-05-01T10:00:00", "boat_code": "B1", "catch": 5},
            {"_id": "2", "_submission_time": "2023-05-01T11:00:00", "boat_code": "B2", "catch": 7},
        ],
    )
    stream = stream_landed_files(spark, str(landing), SCHEMA)
    q = upsert_sink(stream, stage, "validated", ["_id"], ckpt).start()
    q.awaitTermination(60)

    # second batch: _id=2 corrected, _id=3 new — restart drains only new files
    _write_batch(
        landing,
        "b2.jsonl",
        [
            {"_id": "2", "_submission_time": "2023-05-01T11:00:00", "boat_code": "B2", "catch": 99},
            {"_id": "3", "_submission_time": "2023-05-02T09:00:00", "boat_code": "B3", "catch": 1},
        ],
    )
    stream2 = stream_landed_files(spark, str(landing), SCHEMA)
    q2 = upsert_sink(stream2, stage, "validated", ["_id"], ckpt).start()
    q2.awaitTermination(60)

    out = {r._id: r.catch for r in read_stage(spark, stage, "validated").collect()}
    assert out == {"1": 5, "2": 99, "3": 1}


def test_join_streams_windowed_matches_band_and_keys(spark, tmp_path):
    from peskas_timor_data_pipeline_spark.streaming.ingest import (
        join_streams_windowed,
        stream_landed_files,
        write_append_sink,
    )
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    l_schema = StructType(
        [
            StructField("imei", StringType()),
            StructField("l_ts", TimestampType()),
            StructField("landing_id", StringType()),
        ]
    )
    r_schema = StructType(
        [
            StructField("imei", StringType()),
            StructField("r_ts", TimestampType()),
            StructField("track_id", StringType()),
        ]
    )
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()
    _write_batch(
        ldir,
        "l1.jsonl",
        [
            {"imei": "A", "l_ts": "2023-05-01T10:00:00", "landing_id": "L1"},
            {"imei": "B", "l_ts": "2023-05-01T10:00:00", "landing_id": "L2"},
        ],
    )
    _write_batch(
        rdir,
        "r1.jsonl",
        [
            # in band for L1: within the hour before
            {"imei": "A", "r_ts": "2023-05-01T09:30:00", "track_id": "T1"},
            # out of band: after the landing
            {"imei": "A", "r_ts": "2023-05-01T10:30:00", "track_id": "T2"},
            # out of band: more than max_lag before
            {"imei": "A", "r_ts": "2023-05-01T08:30:00", "track_id": "T3"},
            # right key with no left partner
            {"imei": "C", "r_ts": "2023-05-01T09:45:00", "track_id": "T4"},
        ],
    )
    joined = join_streams_windowed(
        stream_landed_files(spark, str(ldir), l_schema),
        stream_landed_files(spark, str(rdir), r_schema),
        keys=["imei"],
        left_ts="l_ts",
        right_ts="r_ts",
        watermark="10 minutes",
        max_lag="1 hour",
    ).select("l.landing_id", "r.track_id")
    sink = str(tmp_path / "sink")
    q = write_append_sink(joined, sink, str(tmp_path / "ckpt")).start()
    q.awaitTermination(90)
    got = {(r.landing_id, r.track_id) for r in spark.read.parquet(sink).collect()}
    assert got == {("L1", "T1")}
