"""Optional Pillow-backed decode path (VERDICT r09 ask #4): JPEG/PNG
through the SAME decode_image API and the same distributed plumbing as
the pure-Python PPM path. Skipped wholesale where Pillow is absent (this
container); the oracle/registry path never depends on it, so driver
hashes are identical with or without the library."""

from __future__ import annotations

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _pixels(h=12, w=16):
    """Deterministic RGB gradient."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 16) % 256, (y * 21) % 256, ((x + y) * 9) % 256], axis=-1
    ).astype(np.uint8)


def _encode(pixels: np.ndarray, fmt: str, **save_kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(pixels).save(buf, format=fmt, **save_kw)
    return buf.getvalue()


def test_png_lossless_matches_ppm_baseline():
    from peskas_timor_data_pipeline_spark.llm.multimodal import (
        decode_image,
        encode_ppm,
    )

    px = _pixels()
    baseline = decode_image(encode_ppm(px))  # pure-Python oracle path
    out = decode_image(_encode(px, "PNG"))
    assert (out["width"], out["height"], out["channels"]) == (16, 12, 3)
    assert np.array_equal(out["pixels"], baseline["pixels"])


def test_jpeg_q100_close_to_baseline():
    from peskas_timor_data_pipeline_spark.llm.multimodal import decode_image

    px = _pixels()
    out = decode_image(_encode(px, "JPEG", quality=100, subsampling=0))
    assert (out["width"], out["height"], out["channels"]) == (16, 12, 3)
    # quality-100 4:4:4 JPEG is near-lossless, not lossless
    diff = np.abs(
        out["pixels"].astype(int) - px.astype(int)
    )
    assert diff.mean() < 3 and diff.max() <= 25


def test_grayscale_png_single_channel():
    from peskas_timor_data_pipeline_spark.llm.multimodal import decode_image

    g = (_pixels()[:, :, 0]).astype(np.uint8)
    out = decode_image(_encode(g, "PNG"))
    assert out["channels"] == 1
    assert np.array_equal(out["pixels"][:, :, 0], g)


def test_distributed_jpeg_meta(spark):
    """The Spark-side plumbing (decode_image_meta over mapInPandas) runs
    unchanged on JPEG bytes — schema, batch shape, per-row errors."""
    from peskas_timor_data_pipeline_spark.llm.multimodal import (
        decode_image_meta,
    )

    px = _pixels()
    rows = [
        (1, _encode(px, "JPEG", quality=95)),
        (2, _encode(px, "PNG")),
        (3, b"\x00\x01bogus"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r.media_id: r
        for r in decode_image_meta(
            df, "media_id", "content", on_error="quarantine"
        ).collect()
    }
    assert got[1].width == 16 and got[1].height == 12
    assert got[2].width == 16 and got[2].channels == 3
    assert got[3].width is None
