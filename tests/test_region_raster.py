"""Polygon rasterization (spatial.rasterize_polygons): the mask
must equal the numpy ray-cast kernel applied to cell centers, and
a plain rectangle rasterizes to exactly the center-inside cells."""

from __future__ import annotations

import numpy as np

from osmgraft.fixtures import fixture_polyset
from osmgraft.geo.cells import LAT_OFFSET, LON_OFFSET, _lon_bits
from osmgraft.geo.pip import build_edges, query_inside
from osmgraft.geo.polyfile import parse_multipoly
from osmgraft.operators.spatial import rasterize_polygons

SHIFT = 20


def _numpy_mask(ps, shift=SHIFT):
    lb = _lon_bits(shift)
    half = 1 << (shift - 1)
    out = set()
    for i, es in enumerate(ps.polys):
        bx1, by1, bx2, by2 = es.bbox
        vs = np.arange(
            (by1 + LAT_OFFSET) >> shift,
            ((by2 + LAT_OFFSET) >> shift) + 1,
            dtype=np.int64,
        )
        us = np.arange(
            (bx1 + LON_OFFSET) >> shift,
            ((bx2 + LON_OFFSET) >> shift) + 1,
            dtype=np.int64,
        )
        uu, vv = np.meshgrid(us, vs)
        px = (uu.ravel() << shift) + half - LON_OFFSET
        py = (vv.ravel() << shift) + half - LAT_OFFSET
        inside = query_inside(px, py, es)
        for u, v in zip(uu.ravel()[inside], vv.ravel()[inside]):
            out.add((i, int(v) * (1 << lb) + int(u)))
    return out


def test_matches_numpy_kernel(spark):
    ps = fixture_polyset()
    got = {
        (r["poly_idx"], r["cell"])
        for r in rasterize_polygons(spark, ps, shift=SHIFT).collect()
    }
    assert got == _numpy_mask(ps)
    assert got, "fixture mask should be non-empty"


def test_rectangle_exact(spark):
    # a 2x1-degree rectangle: mask == cells whose center lies
    # strictly inside the bounds (even-odd on an axis box)
    txt = (
        "box;2\n1\n  10.0 40.0\n  12.0 40.0\n  12.0 41.0\n"
        "  10.0 41.0\n  10.0 40.0\nEND\nEND\n"
    )
    ps = parse_multipoly(txt)
    got = {
        r["cell"]
        for r in rasterize_polygons(spark, ps, shift=SHIFT).collect()
    }
    lb = _lon_bits(SHIFT)
    half = 1 << (SHIFT - 1)
    exp = set()
    x1, y1 = 100000000, 400000000
    x2, y2 = 120000000, 410000000
    for v in range((y1 + LAT_OFFSET) >> SHIFT,
                   ((y2 + LAT_OFFSET) >> SHIFT) + 1):
        for u in range((x1 + LON_OFFSET) >> SHIFT,
                       ((x2 + LON_OFFSET) >> SHIFT) + 1):
            cx = (u << SHIFT) + half - LON_OFFSET
            cy = (v << SHIFT) + half - LAT_OFFSET
            if x1 <= cx < x2 and y1 <= cy < y2:
                # the ray-cast's half-open conventions on an
                # axis-aligned box: x in [x1, x2), y in [y1, y2)
                # (an edge crosses the northward ray only when it
                # lies strictly north of the point)
                exp.add(v * (1 << lb) + u)
    assert got == exp
