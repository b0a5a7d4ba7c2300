"""Pure-Python baseline JPEG codec (llm/jpeg_codec.py): round trips at
PSNR bounds, every supported configuration, the decoder against an
independent float replica on own-encoder bytes, corrupt/subset loudness,
and the distributed mapInPandas path over real JPEG bytes."""

import numpy as np
import pytest

from peskas_timor_data_pipeline_spark.llm.jpeg_codec import (
    JpegSubsetError,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)
from peskas_timor_data_pipeline_spark.llm.multimodal import decode_image


def _photo(h, w, seed=0, channels=3):
    """A JPEG-friendly synthetic photo: smooth waves + mild noise."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(x / 9.0) + 50 * np.cos(y / 7.0)
    img = base[:, :, None] + rng.randint(-8, 8, (h, w, channels))
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = max((err**2).mean(), 1e-12)
    return 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("hw", [(40, 56), (33, 41), (8, 8), (1, 1), (17, 3)])
def test_jpeg_color_roundtrip_psnr(subsampling, hw):
    h, w = hw
    img = _photo(h, w, seed=h * 100 + w)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=subsampling))
    assert (out["width"], out["height"], out["channels"]) == (w, h, 3)
    assert out["pixels"].shape == (h, w, 3)
    assert _psnr(out["pixels"], img) > 28.0


def test_jpeg_grayscale_roundtrip():
    img = _photo(30, 50, seed=5, channels=1)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert (out["width"], out["height"], out["channels"]) == (50, 30, 1)
    assert _psnr(out["pixels"], img) > 32.0


def test_jpeg_quality_monotonic_size_and_fidelity():
    img = _photo(48, 64, seed=9)
    sizes, psnrs = [], []
    for q in (30, 60, 90):
        data = encode_jpeg(img, quality=q, subsampling="4:4:4")
        sizes.append(len(data))
        psnrs.append(_psnr(decode_jpeg(data)["pixels"], img))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_jpeg_restart_markers_pixel_identical(subsampling):
    """RSTn markers only reset DC predictors and the bit phase — the
    decoded pixels must equal the marker-free stream's."""
    img = _photo(48, 64, seed=3)
    plain = decode_jpeg(encode_jpeg(img, quality=85, subsampling=subsampling))
    for ri in (1, 3):
        rst = decode_jpeg(
            encode_jpeg(img, quality=85, subsampling=subsampling,
                        restart_interval=ri)
        )
        assert np.array_equal(rst["pixels"], plain["pixels"])


def test_jpeg_decoder_matches_independent_replica():
    """On own-encoder bytes, the decoder must match a from-scratch
    replica of the decode math (re-quantize the encoder's known
    coefficients, scipy-free float IDCT, same clamp) — catches zigzag,
    dequant and IDCT orientation bugs that a lossy PSNR check hides."""
    from peskas_timor_data_pipeline_spark.llm.jpeg_codec import (
        _dct_matrix,
        _scale_q,
        _QL,
    )

    img = _photo(16, 24, seed=11, channels=1)
    q = 80
    data = encode_jpeg(img, quality=q)
    got = decode_jpeg(data)["pixels"][:, :, 0]

    # independent replica of the encoder+decoder float path
    C = _dct_matrix()
    qt = np.asarray(_scale_q(_QL, q), dtype=np.float64).reshape(8, 8)
    h, w = img.shape[:2]
    ref = np.zeros((h, w))
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0].astype(
                np.float64
            ) - 128.0
            f = C @ blk @ C.T
            quant = np.round(f / qt)
            rec = C.T @ (quant * qt) @ C + 128.0
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rec
    ref = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    assert np.array_equal(got, ref)


def test_jpeg_zigzag_is_an_involution_grid():
    """The zigzag table must be a permutation of 0..63 whose (row+col)
    diagonals are monotone — a transposed table round-trips PSNR fine on
    smooth images and corrupts real ones."""
    assert sorted(_ZIGZAG) == list(range(64))
    diag = [(_ZIGZAG[i] // 8 + _ZIGZAG[i] % 8) for i in range(64)]
    assert diag == sorted(diag)


def test_jpeg_subset_and_corruption_loudness():
    img = _photo(16, 16, seed=2)
    good = encode_jpeg(img, quality=85)
    # progressive marker (SOF2): subset error -> decode_image ValueError
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(JpegSubsetError):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_image(prog)  # Pillow absent -> loud; present -> decodes
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_through_decode_image_dispatch():
    img = _photo(24, 32, seed=4)
    out = decode_image(encode_jpeg(img, quality=90))
    assert (out["width"], out["height"], out["channels"]) == (32, 24, 3)
    assert _psnr(out["pixels"], img) > 28.0


def test_jpeg_decode_distributed(spark):
    """The full path runs distributed: per-doc synthetic photos encoded
    as real JPEG bytes on the driver fixture, decoded via the
    Arrow-batched mapInPandas meta extractor; width/height/channels are
    exact and mean_pixel is within the quantization tolerance of the
    source mean."""
    from peskas_timor_data_pipeline_spark.llm.multimodal import (
        decode_image_meta,
    )

    rows = []
    means = {}
    for did in range(24):
        w, h = did % 13 + 4, did % 7 + 4
        img = _photo(h, w, seed=did, channels=3 if did % 2 else 1)
        sub = "4:2:0" if did % 3 == 0 and did % 2 else "4:4:4"
        rows.append((did, bytearray(encode_jpeg(img, quality=90,
                                                subsampling=sub))))
        means[did] = (w, h, img.shape[2], img.mean())
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r for r in decode_image_meta(media, "doc_id").collect()}
    assert len(got) == 24
    for did, (w, h, ch, mean) in means.items():
        r = got[did]
        assert (r.width, r.height, r.channels) == (w, h, ch)
        assert abs(r.mean_pixel - mean) < 6.0  # lossy, but bounded


def test_jpeg_matches_pillow_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _photo(32, 48, seed=21)
    # our encoder -> Pillow decoder
    ours = encode_jpeg(img, quality=90, subsampling="4:4:4")
    with PIL.open(io.BytesIO(ours)) as im:
        pil_px = np.asarray(im.convert("RGB"), dtype=np.uint8)
    assert _psnr(pil_px, img) > 28.0
    # Pillow encoder -> our decoder
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="JPEG", quality=90)
    out = decode_jpeg(buf.getvalue())
    assert (out["width"], out["height"]) == (48, 32)
    assert _psnr(out["pixels"], img) > 26.0
