"""way_centroids: floor(area-weighted centroid) must match the
fractions-exact formula on crafted rings — CCW, CW, negative
coordinates, and a non-convex ring whose centroid sits outside its
vertex mean."""

from __future__ import annotations

from fractions import Fraction

from osmgraft.operators.linecover import way_centroids


def _exact(ring):
    two_a = 0
    nx = ny = 0
    x0, y0 = ring[0]
    pts = [(x - x0, y - y0) for x, y in ring]
    for (x, y), (x2, y2) in zip(pts, pts[1:]):
        c = x * y2 - x2 * y
        two_a += c
        nx += (x + x2) * c
        ny += (y + y2) * c
    den = 3 * abs(two_a)
    s = -1 if two_a < 0 else 1
    cx = x0 + (s * nx) // den  # python // floors, like the engine
    cy = y0 + (s * ny) // den
    return two_a, cx, cy


def _run(spark, rings):
    way_rows = [
        (wid, [wid * 100 + i for i in range(len(r))] + [wid * 100])
        for wid, r in rings.items()
    ]
    node_rows = [
        (wid * 100 + i, y, x)
        for wid, r in rings.items()
        for i, (x, y) in enumerate(r)
    ]
    ways = spark.createDataFrame(
        way_rows, "way_id long, refs array<long>"
    )
    nodes = spark.createDataFrame(
        node_rows, "doc_id long, lat_i long, lon_i long"
    )
    return {
        r.way_id: (r.two_a, r.cx_fix, r.cy_fix)
        for r in way_centroids(ways, nodes).collect()
    }


def test_way_centroids_exact(spark):
    rings = {
        1: [(0, 0), (40, 0), (40, 20), (0, 20)],  # CCW rect
        2: [(0, 0), (0, 20), (40, 20), (40, 0)],  # CW rect
        3: [(-100, -50), (-40, -50), (-40, -10), (-100, -10)],
        # non-convex L-shape
        4: [(0, 0), (30, 0), (30, 10), (10, 10), (10, 30), (0, 30)],
        # large coords near the fix7 scale
        5: [
            (1_700_000_000, 800_000_000),
            (1_799_999_999, 800_000_000),
            (1_799_999_999, 899_999_999),
            (1_700_000_000, 899_999_999),
        ],
    }
    got = _run(spark, {k: r + [r[0]] for k, r in rings.items()})
    for wid, ring in rings.items():
        closed = ring + [ring[0]]
        assert got[wid] == _exact(closed), wid
    assert got[1][0] > 0 and got[2][0] < 0  # winding signs
    # rect centroid = exact center (floor)
    assert got[1][1:] == (20, 10)
    # fractions cross-check on the L-shape
    two_a, cx, cy = got[4]
    area = Fraction(abs(two_a), 2)
    assert area == 500  # 30x10 + 10x20
