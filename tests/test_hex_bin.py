"""hex_center_cols: two-sublattice integer-Voronoi hex binning vs
an exhaustive nearest-center search over a wide lattice window."""

from __future__ import annotations

import random

from osmgraft.geo.cells import LAT_OFFSET, LON_OFFSET
from osmgraft.operators.spatial import hex_center_cols

A = 1 << 19
B = round(A * 3 ** 0.5)


def _brute_center(u, v):
    """argmin over EVERY center within +-3 periods: (d2, cv, cu)."""
    iu = u // (2 * A)
    jv = v // (2 * B)
    best = None
    for j in range(jv - 3, jv + 4):
        for i in range(iu - 3, iu + 4):
            for off_u, off_v in ((0, 0), (A, B)):
                cu = i * 2 * A + off_u
                cv = j * 2 * B + off_v
                d2 = (u - cu) ** 2 + (v - cv) ** 2
                key = (d2, cv, cu)
                if best is None or key < best:
                    best = key
    return best[1], best[2]


def test_randomized_vs_exhaustive(spark):
    rng = random.Random(129)
    pts = []
    for i in range(300):
        # mix uniform points with exact-boundary points (halfway
        # between centers, on rounding ties)
        if i % 3 == 0:
            u = rng.randrange(0, 20 * A) * 2 + (i % 2)
            v = rng.randrange(0, 20 * B) * 2 + (i % 2)
        else:
            u = rng.randrange(0, 40 * A)
            v = rng.randrange(0, 40 * B)
        pts.append((i, v - LAT_OFFSET, u - LON_OFFSET))
    df = spark.createDataFrame(
        pts, "doc_id long, lat_i long, lon_i long"
    )
    hv, hu = hex_center_cols()
    got = {
        r["doc_id"]: (r["hex_v"], r["hex_u"])
        for r in df.select("doc_id", hv, hu).collect()
    }
    for doc_id, lat_i, lon_i in pts:
        want = _brute_center(lon_i + LON_OFFSET, lat_i + LAT_OFFSET)
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_center_maps_to_itself(spark):
    rows = []
    for n, (cu, cv) in enumerate(
        [(0, 0), (2 * A, 0), (A, B), (3 * A, 5 * B)]
    ):
        rows.append((n, cv - LAT_OFFSET, cu - LON_OFFSET))
    df = spark.createDataFrame(
        rows, "doc_id long, lat_i long, lon_i long"
    )
    hv, hu = hex_center_cols()
    out = {
        r["doc_id"]: (r["hex_v"], r["hex_u"])
        for r in df.select("doc_id", hv, hu).collect()
    }
    assert out == {
        0: (0, 0),
        1: (0, 2 * A),
        2: (B, A),
        3: (5 * B, 3 * A),
    }
