"""Geohash cell-bounds decode (with_geohash_bounds): exact
integer inverse of the encoder — round-trip containment,
tightness at both half-open edges, and a pure-Python replay."""

from __future__ import annotations

import random

from osmgraft.operators.spatial import (
    _GEOHASH32,
    with_geohash,
    with_geohash_bounds,
)


def _py_bounds(code: str, chars: int):
    bits = 5 * chars
    lb = (bits + 1) // 2
    tb = bits // 2
    ub = vb = 0
    ui, vi = lb, tb
    for c in range(chars):
        v = _GEOHASH32.index(code[c])
        for i in range(5):
            b = 5 * c + i
            bit = (v >> (4 - i)) & 1
            if b % 2 == 0:
                ui -= 1
                ub += bit << ui
            else:
                vi -= 1
                vb += bit << vi

    def cd(x, length, bc):
        return (x * length + (1 << bc) - 1) // (1 << bc)

    return (
        cd(ub, 3600000000, lb) - 1800000000,
        cd(ub + 1, 3600000000, lb) - 1800000000,
        cd(vb, 1800000000, tb) - 900000000,
        cd(vb + 1, 1800000000, tb) - 900000000,
    )


def _py_gh(lat_i, lon_i, chars):
    bits = 5 * chars
    lb = (bits + 1) // 2
    tb = bits // 2
    ub = ((lon_i + 1800000000) * (1 << lb)) // 3600000000
    vb = ((lat_i + 900000000) * (1 << tb)) // 1800000000
    out = []
    for c in range(chars):
        v = 0
        for i in range(5):
            b = 5 * c + i
            if b % 2 == 0:
                bitv = (ub >> (lb - 1 - b // 2)) & 1
            else:
                bitv = (vb >> (tb - 1 - (b - 1) // 2)) & 1
            v = (v << 1) | bitv
        out.append(_GEOHASH32[v])
    return "".join(out)


def _pts(seed, n):
    rng = random.Random(seed)
    return [
        (
            i,
            rng.randrange(-900000000, 900000001),
            rng.randrange(-1800000000, 1799999999),
        )
        for i in range(n)
    ]


def test_spark_matches_python_replay(spark):
    pts = _pts(135, 120)
    for chars in (2, 5, 9):
        codes = sorted(
            {_py_gh(la, lo, chars) for _, la, lo in pts}
        )
        df = spark.createDataFrame(
            [(c,) for c in codes], "code string"
        )
        rows = with_geohash_bounds(df, "code", chars).collect()
        for r in rows:
            exp = _py_bounds(r["code"], chars)
            got = (
                r["lon_lo"],
                r["lon_hi"],
                r["lat_lo"],
                r["lat_hi"],
            )
            assert got == exp, (r["code"], chars, got, exp)


def test_round_trip_containment_and_tightness():
    # every point lies inside its own cell's half-open bounds;
    # both corners of the cell re-encode to the same code and the
    # hi edge (when in range) re-encodes to a different one
    for chars in (1, 3, 5, 7, 10):
        for _, lat_i, lon_i in _pts(chars, 80):
            code = _py_gh(lat_i, lon_i, chars)
            lon_lo, lon_hi, lat_lo, lat_hi = _py_bounds(
                code, chars
            )
            assert lon_lo <= lon_i < lon_hi
            assert lat_lo <= lat_i < lat_hi
            assert _py_gh(lat_lo, lon_lo, chars) == code
            assert (
                _py_gh(lat_hi - 1, lon_hi - 1, chars) == code
            )
            if lon_hi <= 1800000000 - 1:
                assert _py_gh(lat_lo, lon_hi, chars) != code
            if lat_hi <= 900000000:
                assert _py_gh(lat_hi, lon_lo, chars) != code


def test_cells_partition_the_line():
    # consecutive codes at a fixed latitude tile the lon axis with
    # no gaps/overlaps: walking lon cells, each hi == next lo
    chars = 4
    lat_i = 123456789
    lon = -1800000000
    seen = 0
    while lon < 1800000000 and seen < 200:
        code = _py_gh(lat_i, lon, chars)
        lon_lo, lon_hi, lat_lo, lat_hi = _py_bounds(code, chars)
        assert lon_lo <= lon < lon_hi
        lon = lon_hi
        seen += 1
    assert seen >= 3
