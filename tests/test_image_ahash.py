"""image_ahash / ahash_neardup_pairs: bit-level agreement with a
direct per-image recomputation, sign-safety of the packed halves,
Hamming verify correctness, and the banded-candidate contract."""

from __future__ import annotations

from osmgraft.operators.multimodal import (
    ahash_neardup_pairs,
    image_ahash,
    synth_media,
)


def _expected_hash(doc_id: int, grid: int = 8):
    w = 16 + (doc_id * 7) % 240
    h = 16 + (doc_id * 13) % 240
    v = {}
    for y in range(grid):
        for x in range(grid):
            sx, sy = x * w // grid, y * h // grid
            v[y * grid + x] = (sx * 31 + sy * 17 + sx * sy) % 256
    mean = sum(v.values()) // (grid * grid)
    hi = lo = 0
    for idx, val in v.items():
        if val > mean:
            if idx < 32:
                lo |= 1 << idx
            else:
                hi |= 1 << (idx - 32)
    return hi, lo


def test_ahash_bits(spark):
    media = synth_media(spark, 60)
    got = {
        r.doc_id: (r.ahash_hi, r.ahash_lo)
        for r in image_ahash(media).collect()
    }
    # images are even doc_ids only
    assert set(got) == {i for i in range(60) if i % 2 == 0}
    for did, (hi, lo) in got.items():
        assert (hi, lo) == _expected_hash(did), did
        # sign-safe packing: both halves fit in 32 unsigned bits
        assert 0 <= hi < 1 << 32 and 0 <= lo < 1 << 32


def test_neardup_contract(spark):
    media = synth_media(spark, 400)
    hashes = image_ahash(media)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in ahash_neardup_pairs(hashes, max_hamming=8).collect()
    }
    hs = {
        r.doc_id: (r.ahash_hi, r.ahash_lo)
        for r in hashes.collect()
    }

    def bands(hi, lo):
        return [lo % 65536, lo >> 16, hi % 65536, hi >> 16]

    def ham(a, b):
        return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")

    # reported set == {share >= 1 band AND hamming <= 8}, exactly
    want = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            share = any(
                x == y
                for x, y in zip(bands(*hs[a]), bands(*hs[b]))
            )
            d = ham(hs[a], hs[b])
            if share and d <= 8:
                want[(a, b)] = d
    assert pairs == want
    # pigeonhole: every pair within Hamming 3 MUST be reported
    for (a, b), d in want.items():
        if d <= 3:
            assert (a, b) in pairs
