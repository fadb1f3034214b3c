"""Spatial cell keys: engine tile cells + reference parity key.

The reference's coarse geo key (osmgeobase.c:2547-2560, data__coco_calc):

    yx = ((uint64)(900000000 + lat) & ~0x3fff) << 32
         + (uint64)(1800000000 + lon)

i.e. the latitude band (16384 x 1e-7 deg ~ 182 m tall) in the high
word and the raw shifted longitude in the low word — prefix-sortable
so that near points sort near each other within a latitude band.
(The in-source comment at osmgeobase.c:2484 says `<<16`; the
implementation shifts by 32 — the implementation wins.)

Our engine cell (`cell_encode`) quantizes BOTH axes so a cell is a
bounded ~182m x ~182m(equator) box usable as a join/partition key:

    cell = lat_band << 18 | lon_band
    lat_band = (lat + 900000000)  >> shift   (shift=14 default)
    lon_band = (lon + 1800000000) >> shift

With shift=14: lon_band < 3.6e9/16384 = 219727 < 2^18, so the packed
key is unambiguous and fits easily in int64. Neighboring cells are
(lat_band +-1, lon_band +-1) — adjacency arithmetic is trivial,
which is what the kNN sort-merge join needs.
"""

from __future__ import annotations

import numpy as np

LAT_OFFSET = 900_000_000
LON_OFFSET = 1_800_000_000
DEFAULT_SHIFT = 14
LON_BITS = 18


def cell_encode(lat_i, lon_i, shift: int = DEFAULT_SHIFT) -> np.ndarray:
    """Engine tile-cell id from fixed-point coords. Vectorized."""
    lat_i = np.asarray(lat_i, dtype=np.int64)
    lon_i = np.asarray(lon_i, dtype=np.int64)
    lon_bits = _lon_bits(shift)
    lat_band = (lat_i + LAT_OFFSET) >> shift
    lon_band = (lon_i + LON_OFFSET) >> shift
    return (lat_band << lon_bits) | lon_band


def cell_decode(cell, shift: int = DEFAULT_SHIFT):
    """Inverse of cell_encode -> (lat_band, lon_band)."""
    cell = np.asarray(cell, dtype=np.int64)
    lon_bits = _lon_bits(shift)
    return cell >> lon_bits, cell & ((1 << lon_bits) - 1)


def cell_pack(lat_band, lon_band, shift: int = DEFAULT_SHIFT):
    lat_band = np.asarray(lat_band, dtype=np.int64)
    lon_band = np.asarray(lon_band, dtype=np.int64)
    return (lat_band << _lon_bits(shift)) | lon_band


def _lon_bits(shift: int) -> int:
    span = (2 * LON_OFFSET) >> shift
    return max(int(span).bit_length(), 1)


def coco_key(lat_i, lon_i) -> np.ndarray:
    """Bit-exact data__coco_calc (osmgeobase.c:2547-2560) parity key."""
    lat_i = np.asarray(lat_i, dtype=np.int64)
    lon_i = np.asarray(lon_i, dtype=np.int64)
    ii = (LAT_OFFSET + lat_i).astype(np.uint64)
    ii &= np.uint64(0xFFFFFFFFFFFFC000)
    ii <<= np.uint64(32)
    ii += (LON_OFFSET + lon_i).astype(np.uint64)
    return ii.astype(np.int64)  # < 2^63 for valid coords; safe
