"""Multimodal plumbing: Arrow batch shapes, schemas, and the explode plan
(decode itself is stubbed — no codec libs in this environment)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def media(spark):
    from peskas_timor_data_pipeline_spark.llm.multimodal import attach_binary

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.col("doc_id").alias("media_id"), "text")
        .limit(20)
    )
    return attach_binary(docs, "text", "content").withColumn(
        "meta_duration_s", (F.col("media_id") % 5).cast("double")
    )


def test_decode_stub_fails_loudly():
    from peskas_timor_data_pipeline_spark.llm.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_resize_images_schema_and_cap(spark, media):
    from peskas_timor_data_pipeline_spark.llm.multimodal import resize_images

    out = resize_images(media, "media_id", target_w=8, target_h=4)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "content", "meta_width", "meta_height",
    ]
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r.content) <= 32 for r in rows)  # 8*4 fake-resize cap
    assert all((r.meta_width, r.meta_height) == (8, 4) for r in rows)


def test_frame_sample_explodes_per_second(spark, media):
    from peskas_timor_data_pipeline_spark.llm.multimodal import frame_sample_plan

    frames = frame_sample_plan(media, "media_id", every_n_seconds=1.0)
    counts = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # duration d seconds -> floor(d)+1 sampled timestamps (t=0..d)
    for media_id, n in counts.items():
        assert n == (media_id % 5) + 1
