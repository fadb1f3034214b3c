"""Vendored pure-numpy baseline JPEG codec (operators/jpeg.py):
encoder emits spec-conformant JFIF, decoder runs the full inverse
pipeline, and the two are validated against an INDEPENDENT
per-definition IDCT (double loop over the T.81 formula), not
against each other's vectorized math. Plus the closed-form contract
q235's oracle relies on, and the documented loud-error scope."""

import math
import struct

import numpy as np
import pytest

from osmgraft.operators.jpeg import (
    QUANT_LUMA,
    decode_jpeg_gray,
    encode_jpeg_gray,
    encode_quantized_blocks,
)


def _brute_idct_block(qblk: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 inverse DCT, straight from the spec formula —
    deliberately loop-based and independent of the codec's matrix
    path."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * qblk[u][v] * QUANT_LUMA[u][v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = s / 4 + 128
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _const_image(d: int):
    bw = 2 + d % 5
    bh = 2 + (d * 3) % 4
    img = np.zeros((bh * 8, bw * 8), np.uint8)
    exp = np.zeros_like(img)
    for by in range(bh):
        for bx in range(bw):
            lvl = (bx * 31 + by * 53 + d * 11) % 256
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = lvl
            exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = min(
                lvl + lvl % 2, 255
            )
    return img, exp


def test_constant_block_closed_form():
    """The q235 oracle contract: decoded pixels of an 8x8-constant
    image equal min(l + l % 2, 255) exactly, for many shapes and
    the full level range (incl. the 255 clamp and odd levels)."""
    for d in range(40):
        img, exp = _const_image(d)
        got = decode_jpeg_gray(encode_jpeg_gray(img))
        assert got.shape == img.shape
        assert (got == exp).all(), f"doc {d}"


def test_planted_ac_against_brute_force_idct():
    """Entropy pipeline (DC prediction, AC run-length, EOB, ZRL,
    dezigzag, dequantize, IDCT) vs the per-definition double-loop
    IDCT on hand-planted coefficient blocks, including a forced
    >16 zero run that requires a ZRL symbol."""
    rng = np.random.RandomState(11)
    blocks = []
    for i in range(8):
        b = np.zeros((8, 8), np.int64)
        b[0, 0] = int(rng.randint(-200, 200))
        for _ in range(5):
            b[rng.randint(0, 8), rng.randint(0, 8)] = int(
                rng.randint(-30, 30)
            )
        blocks.append(b)
    zrl = np.zeros((8, 8), np.int64)
    zrl[0, 0] = 40
    zrl[7, 7] = 3  # 62 zeros between DC and the last AC -> 3x ZRL
    blocks.append(zrl)
    blocks.append(np.zeros((8, 8), np.int64))  # pure-EOB block
    payload = encode_quantized_blocks(np.array(blocks), 5, 2)
    dec = decode_jpeg_gray(payload)
    for i, b in enumerate(blocks):
        by, bx = divmod(i, 5)
        got = dec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        assert (got == _brute_idct_block(b)).all(), f"block {i}"


def test_file_structure_is_spec_conformant():
    img, _ = _const_image(3)
    p = encode_jpeg_gray(img)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    # marker walk: APP0(JFIF), DQT, SOF0, DHT x2, SOS
    markers = []
    i = 2
    while i < len(p):
        assert p[i] == 0xFF
        m = p[i + 1]
        markers.append(m)
        if m == 0xDA:
            break
        (ln,) = struct.unpack_from(">H", p, i + 2)
        i += 2 + ln
    assert markers == [0xE0, 0xDB, 0xC0, 0xC4, 0xC4, 0xDA]
    assert p[6:11] == b"JFIF\x00"
    # entropy data carries stuffed 0xFF bytes only
    end = p.rfind(b"\xff\xd9")
    (ln,) = struct.unpack_from(">H", p, i + 2)
    scan = p[i + 2 + ln : end]
    j = 0
    while j < len(scan):
        if scan[j] == 0xFF:
            assert scan[j + 1] == 0x00
            j += 2
        else:
            j += 1


def test_loud_errors_on_unsupported():
    img, _ = _const_image(5)
    p = bytearray(encode_jpeg_gray(img))
    # flip SOF0 -> SOF2 (progressive)
    k = bytes(p).find(b"\xff\xc0")
    p2 = bytes(p[:k + 1]) + b"\xc2" + bytes(p[k + 2:])
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg_gray(p2)
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\xff\xd8\xff\xd9")  # no SOF/SOS
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"BM123456")  # not a JPEG
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((10, 16)))  # not multiple of 8
    # truncated entropy data
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(p[:-20]) + b"\xff\xd9")


def test_decode_image_real_routes_jpeg():
    from osmgraft.operators.multimodal import decode_image_real

    img, exp = _const_image(7)
    got = decode_image_real(encode_jpeg_gray(img))
    assert (np.asarray(got) == exp).all()


def test_jpeg_stats_operator(spark):
    """Distributed synth + decode: stats match the closed form for
    every synthesized id."""
    from osmgraft.operators.multimodal import (
        jpeg_gray_stats,
        synth_jpeg,
    )

    rows = {
        r["doc_id"]: r
        for r in jpeg_gray_stats(synth_jpeg(spark, 40)).collect()
    }
    assert set(rows) == {i for i in range(40) if i % 3 == 0}
    for d, r in rows.items():
        img, exp = _const_image(d)
        assert r["width"] == img.shape[1]
        assert r["height"] == img.shape[0]
        assert r["sum_px"] == int(exp.astype(np.int64).sum())
        assert r["min_px"] == int(exp.min())
        assert r["max_px"] == int(exp.max())
