"""Pure-Python PNG codec (VERDICT r10 ask #2): stdlib zlib + the public
PNG spec's scanline filters, no Pillow — round-trips, every filter type,
every supported color type, corrupt-input loudness, and the distributed
mapInPandas path over real PNG bytes."""

import struct
import zlib

import numpy as np
import pytest

from peskas_timor_data_pipeline_spark.llm.multimodal import (
    _decode_png,
    decode_image,
    encode_png,
)


def _rand(h, w, c, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "cycle"])
def test_png_roundtrip_all_filters_and_color_types(channels, filter_type):
    px = _rand(11, 7, channels, seed=channels * 10 + hash(filter_type) % 5)
    out = decode_image(encode_png(px, filter_type=filter_type))
    assert (out["width"], out["height"], out["channels"]) == (7, 11, channels)
    assert np.array_equal(out["pixels"], px)


def test_png_single_pixel_and_single_row():
    one = np.array([[[200]]], dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(one, 4))["pixels"], one)
    row = _rand(1, 64, 3, seed=3)
    assert np.array_equal(decode_image(encode_png(row, "cycle"))["pixels"], row)


def test_png_filter_math_against_spec_reference():
    """Unfilter agrees with a literal per-byte transcription of the spec's
    Recon() equations (the numpy lane vectorization must not drift)."""
    px = _rand(9, 13, 3, seed=42)
    content = encode_png(px, filter_type="cycle")
    got = _decode_png(content)["pixels"]

    # literal spec replay
    ihdr_at = content.index(b"IHDR") - 4
    (w,) = struct.unpack_from(">I", content, ihdr_at + 8)
    (h,) = struct.unpack_from(">I", content, ihdr_at + 12)
    idat_at = content.index(b"IDAT") - 4
    (idat_len,) = struct.unpack_from(">I", content, idat_at)
    raw = zlib.decompress(content[idat_at + 8 : idat_at + 8 + idat_len])
    bpp, stride = 3, w * 3
    recon = []
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = list(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        rec = [0] * stride
        for x in range(stride):
            a = rec[x - bpp] if x >= bpp else 0
            b = recon[y - 1][x] if y > 0 else 0
            c = recon[y - 1][x - bpp] if (y > 0 and x >= bpp) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            rec[x] = (line[x] + pred) & 0xFF
        recon.append(rec)
    ref = np.array(recon, dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, ref)


def test_png_palette_decodes_to_rgb():
    plte = _rand(5, 1, 3, seed=7).reshape(-1, 3)
    idx = np.array([[0, 4, 2], [3, 1, 0]], dtype=np.uint8)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    content = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = decode_image(content)
    assert out["channels"] == 3
    assert np.array_equal(out["pixels"], plte[idx])


def test_png_corruption_fails_loudly():
    px = _rand(4, 4, 3, seed=1)
    good = encode_png(px)
    # flip one IDAT payload byte -> CRC mismatch
    idat_at = good.index(b"IDAT") - 4
    bad = bytearray(good)
    bad[idat_at + 9] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_image(bytes(bad))
    # truncated pixel data: IDAT deflates fewer scanlines than h claims
    short = zlib.compress(b"\x00" + b"\x01" * 12)  # 1 row of the 4 claimed

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    trunc = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", short)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated"):
        decode_image(trunc)


def test_png_subset_boundaries():
    """16-bit PNGs leave the pure subset (Pillow fallback, which raises
    loudly when absent); interlace decodes natively now (r11 Adam7);
    unknown filter types and interlace methods are corrupt."""

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def mk(bit_depth=8, color_type=2, interlace=0, scan=None):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR",
                    struct.pack(">IIBBBBB", 1, 1, bit_depth, color_type, 0, 0,
                                interlace))
            + chunk(b"IDAT", zlib.compress(scan or b"\x00\x01\x02\x03"))
            + chunk(b"IEND", b"")
        )

    with pytest.raises(ValueError):
        decode_image(mk(bit_depth=16))  # subset or Pillow-absent: loud
    # a 1x1 Adam7 image decodes natively (only pass 1 is non-empty)
    assert decode_image(mk(interlace=1))["pixels"].tolist() == [[[1, 2, 3]]]
    with pytest.raises(ValueError, match="interlace"):
        _decode_png(mk(interlace=2))
    with pytest.raises(ValueError, match="filter"):
        _decode_png(mk(scan=b"\x07\x01\x02\x03"))


def test_png_decode_distributed(spark):
    """The whole path runs distributed: synthesize deterministic pixels per
    doc, encode_png with cycling filters on the driver fixture, decode via
    the Arrow-batched mapInPandas meta extractor, and check every row
    against the generating formula."""
    from peskas_timor_data_pipeline_spark.llm.multimodal import (
        decode_image_meta,
    )

    rows = []
    for did in range(40):
        w, h = did % 13 + 1, did % 7 + 1
        y, x, c = np.indices((h, w, 3))
        px = ((did + x + y + c) % 256).astype(np.uint8)
        rows.append((did, bytearray(encode_png(px, filter_type="cycle"))))
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r for r in decode_image_meta(media, "doc_id").collect()}
    assert len(got) == 40
    for did in range(40):
        w, h = did % 13 + 1, did % 7 + 1
        y, x, c = np.indices((h, w, 3))
        px = (did + x + y + c) % 256
        r = got[did]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert r.mean_pixel == pytest.approx(px.mean(), abs=1e-9)


def test_png_matches_pillow_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    px = _rand(16, 16, 3, seed=99)
    buf = io.BytesIO()
    PIL.fromarray(px).save(buf, format="PNG")
    out = _decode_png(buf.getvalue())
    assert np.array_equal(out["pixels"], px)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("hw", [(16, 16), (13, 9), (7, 3), (1, 1), (2, 10)])
def test_png_adam7_interlace_roundtrip(channels, hw):
    """Adam7 (r11): seven independently-filtered sub-images reassemble
    byte-exactly, including dimensions where some passes are empty."""
    h, w = hw
    px = _rand(h, w, channels, seed=h * 31 + w + channels)
    data = encode_png(px, filter_type="cycle", interlace=True)
    # IHDR interlace byte set
    ihdr_at = data.index(b"IHDR") - 4
    assert data[ihdr_at + 8 + 12] == 1
    out = decode_image(data)
    assert (out["width"], out["height"]) == (w, h)
    assert np.array_equal(out["pixels"], px)


def test_png_adam7_matches_pillow_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    px = _rand(20, 24, 3, seed=77)
    buf = io.BytesIO()
    PIL.fromarray(px).save(buf, format="PNG", interlace=True)
    out = _decode_png(buf.getvalue())
    assert np.array_equal(out["pixels"], px)
