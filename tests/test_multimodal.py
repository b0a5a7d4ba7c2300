"""Multimodal plumbing: Arrow batch shapes, schemas, the explode plan, and
the pure-Python PPM/BMP codec (real bytes -> real pixels, no codec libs)."""

from __future__ import annotations

import struct

import numpy as np
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


def test_decode_unsupported_fails_loudly():
    from peskas_timor_data_pipeline_spark.llm.multimodal import decode_image

    with pytest.raises(ValueError, match="unsupported image magic"):
        decode_image(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated PPM"):
        decode_image(b"P6\n4 4\n255\n\x00\x01")


def test_ppm_p6_roundtrip_with_comments():
    from peskas_timor_data_pipeline_spark.llm.multimodal import (
        decode_image,
        encode_ppm,
    )

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    d = decode_image(encode_ppm(px))
    assert (d["width"], d["height"], d["channels"]) == (3, 2, 3)
    assert np.array_equal(d["pixels"], px)
    # header comments anywhere in the netpbm grammar
    commented = b"P6\n# a comment\n3 # inline\n2\n255\n" + px.tobytes()
    assert np.array_equal(decode_image(commented)["pixels"], px)


def test_pgm_p5_and_ascii_p3():
    from peskas_timor_data_pipeline_spark.llm.multimodal import (
        decode_image,
        encode_ppm,
    )

    gray = np.array([[[0], [128]], [[255], [7]]], dtype=np.uint8)
    d = decode_image(encode_ppm(gray))
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 1)
    assert np.array_equal(d["pixels"], gray)
    ascii_ppm = b"P3\n2 1\n255\n1 2 3  4 5 6\n"
    d3 = decode_image(ascii_ppm)
    assert np.array_equal(
        d3["pixels"], np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    )


def _bmp24(px_rgb: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-rolled 24-bit BI_RGB BMP with 4-byte row padding."""
    h, w, _ = px_rgb.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b""
    rows = px_rgb if top_down else px_rgb[::-1]
    for y in range(h):
        bgr = rows[y][:, ::-1].tobytes()
        body += bgr + b"\x00" * pad
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return head + dib + body


def test_bmp_24bit_bottom_up_and_top_down():
    from peskas_timor_data_pipeline_spark.llm.multimodal import decode_image

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    for top_down in (False, True):
        d = decode_image(_bmp24(px, top_down=top_down))
        assert (d["width"], d["height"], d["channels"]) == (3, 2, 3)
        assert np.array_equal(d["pixels"], px), f"top_down={top_down}"


def test_bmp_rejects_compressed():
    from peskas_timor_data_pipeline_spark.llm.multimodal import decode_image

    px = np.zeros((1, 1, 3), dtype=np.uint8)
    raw = bytearray(_bmp24(px))
    struct.pack_into("<I", raw, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compressed BMP"):
        decode_image(bytes(raw))


def test_decode_image_meta_distributed(spark):
    from peskas_timor_data_pipeline_spark.llm.multimodal import (
        decode_image_meta,
        encode_ppm,
    )

    rows = []
    for i in range(1, 9):
        px = np.full((i, 2 * i, 3), i, dtype=np.uint8)
        rows.append((i, bytearray(encode_ppm(px))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in decode_image_meta(df, "media_id").collect()}
    for i in range(1, 9):
        r = got[i]
        assert (r.width, r.height, r.channels) == (2 * i, i, 3)
        assert r.mean_pixel == float(i)


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
