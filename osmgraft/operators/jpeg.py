"""Pure-numpy baseline JPEG (ITU-T T.81) grayscale codec — the
vendored decoder that lets the multimodal pipeline exercise REAL
lossy-image decode without Pillow (round-4 VERDICT "Next round" #5;
the BMP/WAV pattern of multimodal.py extended to an entropy-coded
format).

Scope (documented, enforced with loud errors):
  - baseline sequential DCT (SOF0), 8-bit, ONE component (gray),
    1x1 sampling, no restart intervals, no progressive/arithmetic;
  - encoder emits spec-conformant JFIF files (SOI, APP0, DQT,
    SOF0, DHT, SOS, entropy-coded data with 0xFF byte stuffing,
    EOI) that any standard viewer opens;
  - decoder does the full inverse: segment walk, DQT/DHT/SOF0/SOS
    parse, canonical Huffman decode (DC predictive + AC
    run-length/EOB/ZRL), dezigzag, dequantize, float IDCT, level
    shift, clamp.

All tables are the PUBLIC spec constants (T.81 Annex K: the
luminance quantization matrix and the typical DC/AC luminance
Huffman tables) — inlined the same way geo/bboxtags.py inlines the
reference's published cosr tables.

Determinism contract for the oracle (q235): the quantizer is
floor(c / Q + 0.5 + 1e-9) — round-half-up with a bias epsilon that
absorbs float-DCT noise at exact-half boundaries — so for an 8x8
CONSTANT block of level l the only nonzero coefficient is
DC = 8*(l-128), quantized against Q[0]=16 to floor((l-127)/2), and
the decoded block is exactly constant at

    clamp(2*floor((l-127)/2) + 128)  ==  min(l + l % 2, 255)

an integer closed form a SQL oracle can recompute without touching
a payload, while the bytes in between went through genuine Huffman
entropy coding.
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Annex K, Table K.1 — luminance quantization (quality 50)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# T.81 Annex K — typical luminance Huffman tables
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: coeffs = C @ b @ C.T."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c / 2.0
    m[0, :] *= 1 / np.sqrt(2)
    return m


_C = _dct_matrix()


def _build_huffman(bits: list[int], vals: list[int]):
    """Canonical codes: (value -> (code, length), and the decode
    map (length, code) -> value)."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            v = vals[i]
            enc[v] = (code, length)
            dec[(length, code)] = v
            code += 1
            i += 1
        code <<= 1
    return enc, dec


_DC_ENC, _DC_DEC = _build_huffman(DC_BITS, DC_VALS)
_AC_ENC, _AC_DEC = _build_huffman(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC value (T.81
    F.1.2.1: negatives store value - 1 in `size` bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_quantized_blocks(
    qblocks: np.ndarray, blocks_w: int, blocks_h: int
) -> bytes:
    """Entropy-code pre-quantized coefficient blocks
    (n_blocks, 8, 8 int) in row-major block order into a complete
    JFIF byte string (the test seam for planting AC values; the
    public encoder quantizes then calls this)."""
    w, h = 8 * blocks_w, 8 * blocks_h
    bw = _BitWriter()
    pred = 0
    for blk in qblocks:
        zz = [int(blk[r][c]) for r, c in _ZZ]
        diff = zz[0] - pred
        pred = zz[0]
        size, bits = _magnitude(diff)
        code, length = _DC_ENC[size]
        bw.put(code, length)
        if size:
            bw.put(bits, size)
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k]:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = _AC_ENC[0xF0]  # ZRL
                bw.put(zc, zl)
                run -= 16
            size, bits = _magnitude(v)
            code, length = _AC_ENC[(run << 4) | size]
            bw.put(code, length)
            bw.put(bits, size)
            run = 0
        if last_nz < 63:
            ec, el = _AC_ENC[0x00]  # EOB
            bw.put(ec, el)
    data = bw.flush()

    dqt = b"\x00" + bytes(
        int(QUANT_LUMA[r][c]) for r, c in _ZZ
    )
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht_dc = b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    sos = b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00"
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    return (
        b"\xff\xd8"
        + _seg(0xE0, app0)
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + data
        + b"\xff\xd9"
    )


def encode_jpeg_gray(img: np.ndarray) -> bytes:
    """8-bit grayscale (h, w) -> baseline JFIF bytes. Dimensions
    must be multiples of 8 (no partial-MCU edge replication in
    this vendored codec — loud error instead of silent padding)."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError(
            "encode_jpeg_gray: dimensions must be multiples of 8"
        )
    blocks_h, blocks_w = h // 8, w // 8
    qblocks = []
    q = QUANT_LUMA.astype(np.float64)
    for by in range(blocks_h):
        for bx in range(blocks_w):
            b = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _C @ b @ _C.T
            # round-half-up with bias epsilon (see module docstring)
            qb = np.floor(coef / q + 0.5 + 1e-9).astype(np.int64)
            qblocks.append(qb)
    return encode_quantized_blocks(
        np.array(qblocks), blocks_w, blocks_h
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy data exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if (
                self.pos < len(self.data)
                and self.data[self.pos] == 0x00
            ):
                self.pos += 1  # unstuff
            else:
                raise ValueError(
                    "jpeg: unexpected marker in entropy data "
                    "(restart intervals unsupported)"
                )
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


def _huff_read(br: _BitReader, dec: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        v = dec.get((length, code))
        if v is not None:
            return v
    raise ValueError("jpeg: invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Baseline JFIF grayscale bytes -> (h, w) uint8 pixels.
    Full inverse pipeline: segment walk, DQT (8-bit), DHT
    (canonical rebuild), SOF0 (1 component, 1x1 sampling), SOS,
    Huffman entropy decode with DC prediction and AC RLE/EOB/ZRL,
    dezigzag, dequantize, float IDCT, +128 level shift, clamp.
    Loud ValueError on anything outside the documented scope
    (progressive SOF2, multi-component, restart intervals,
    16-bit quant tables)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    i = 2
    qtables: dict[int, np.ndarray] = {}
    hdec: dict[tuple[int, int], dict] = {}
    dims = None
    data_start = None
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", payload, i + 2)
        seg = payload[i + 4 : i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit DQT unsupported")
                tbl = np.zeros((8, 8), np.int64)
                for k, (r, c) in enumerate(_ZZ):
                    tbl[r, c] = seg[j + 1 + k]
                qtables[tq] = tbl
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                _enc, dec = _build_huffman(bits, vals)
                hdec[(tc, th)] = dec
                j += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or nc != 1:
                raise ValueError(
                    "jpeg: only 8-bit single-component baseline"
                )
            # per-component: id, sampling, quant-table id
            if seg[7] != 0x11:
                raise ValueError("jpeg: only 1x1 sampling")
            dims = (h, w, seg[8])
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: SOF{marker - 0xC0} unsupported "
                "(baseline SOF0 only)"
            )
        elif marker == 0xDD:
            raise ValueError("jpeg: restart intervals unsupported")
        elif marker == 0xDA:
            ns = seg[0]
            if ns != 1:
                raise ValueError("jpeg: one scan component only")
            td, ta = seg[2] >> 4, seg[2] & 0xF
            data_start = i
            break
    if dims is None or data_start is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    h, w, tq = dims
    q = qtables[tq]
    dcd, acd = hdec[(0, td)], hdec[(1, ta)]
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("jpeg: missing EOI")
    br = _BitReader(payload[data_start:end])
    blocks_h = (h + 7) // 8
    blocks_w = (w + 7) // 8
    out = np.zeros((blocks_h * 8, blocks_w * 8), np.float64)
    pred = 0
    for by in range(blocks_h):
        for bx in range(blocks_w):
            zz = np.zeros(64, np.int64)
            size = _huff_read(br, dcd)
            pred += _extend(br.bits(size), size)
            zz[0] = pred
            k = 1
            while k < 64:
                rs = _huff_read(br, acd)
                run, size = rs >> 4, rs & 0xF
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("jpeg: AC index overflow")
                zz[k] = _extend(br.bits(size), size)
                k += 1
            coef = np.zeros((8, 8), np.float64)
            for k2, (r, c) in enumerate(_ZZ):
                coef[r, c] = zz[k2] * q[r, c]
            blk = _C.T @ coef @ _C + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    return (
        np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
    )
