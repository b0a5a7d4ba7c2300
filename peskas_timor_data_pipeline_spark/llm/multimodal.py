"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

The container has no codec libraries, so the actual decode is STUBBED
(clearly marked); everything Spark-side — schema, batch iteration,
partitioning, UDF signatures — is real and tested. The reference's
`_attachments` model (R/pt_nest_attachments.R:40-72: per-row array of
{download_url, id}) generalizes to this column layout directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, content binary, "
    "meta_width int, meta_height int, meta_duration_s double"
)


def attach_binary(df: DataFrame, text_col: str, out_col: str = "content") -> DataFrame:
    """Pack a column into binary (here: utf-8 text; in production: image
    bytes read from object storage by the source)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def decode_image(content: bytes) -> dict:
    """STUB: real implementation would decode with PIL/libvips.

    Raises NotImplementedError so callers fail loudly rather than silently
    producing fake pixels; `extract_binary_meta` below is the deterministic
    fake used for plumbing tests."""
    raise NotImplementedError("image codecs not available in this environment")


def extract_binary_meta(
    df: DataFrame, id_col: str, content_col: str = "content"
) -> DataFrame:
    """mapInPandas feature extraction over binary content — the real Arrow
    batch path a decoder would use. Deterministic fake features: byte
    length, first-4-bytes magic, content digest.

    Scale shape: mapInPandas streams Arrow batches per partition; no
    per-row Python calls, no driver collection; binary columns stay
    columnar end to end."""
    import hashlib

    out_schema = f"{id_col} long, n_bytes long, magic string, digest string"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf[content_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": content.map(len),
                    "magic": content.map(lambda b: b[:4].decode("utf-8", "replace")),
                    "digest": content.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return df.select(id_col, content_col).mapInPandas(extract, schema=out_schema)


def resize_images(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Image-resize plumbing via mapInPandas: binary in, binary out, new
    dims in typed metadata — the exact batch shape a PIL/libvips resize
    would use (decode/re-encode STUBBED: the deterministic fake clamps the
    payload to target_w*target_h bytes so output size tracks target dims).

    Scale shape: binary columns ride Arrow batches partition-locally; the
    output schema is declared up front so downstream stages plan against
    typed columns, not a Python object blob."""
    out_schema = (
        f"{id_col} long, content binary, meta_width int, meta_height int"
    )
    cap = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    # STUB for PIL Image.resize((target_w, target_h))
                    "content": pdf[content_col].map(lambda b: b[:cap]),
                    "meta_width": target_w,
                    "meta_height": target_h,
                }
            )

    return df.select(id_col, content_col).mapInPandas(resize, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, id_col: str, every_n_seconds: float = 1.0
) -> DataFrame:
    """Video frame-sampling plumbing: expand each media row into frame
    timestamps (decode stubbed). Demonstrates the explode-shaped plan a
    frame sampler needs — rows stay distributed, one narrow explode."""
    return df.withColumn(
        "frame_ts",
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST(floor(coalesce(meta_duration_s, 0) / {every_n_seconds}) AS INT)),"
                f" i -> i * {every_n_seconds})"
            )
        ),
    )
