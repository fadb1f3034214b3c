"""snap_to_ways: nearest-segment map matching vs an independent
brute-force reference (pure-Python all-pairs with the same IEEE
double op order), plus threshold / tie-break / degenerate-segment
edge cases and plan shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.linecover import snap_to_ways

S20 = 1 << 20


def _dist2(px, py, ax, ay, bx, by):
    """Reference scorer: the operator's exact double op sequence."""
    apx = float(px - ax)
    apy = float(py - ay)
    abx = float(bx - ax)
    aby = float(by - ay)
    bpx = float(px - bx)
    bpy = float(py - by)
    dot = apx * abx + apy * aby
    len2 = abx * abx + aby * aby
    if dot <= 0 or len2 == 0:
        return apx * apx + apy * apy
    if dot >= len2:
        return bpx * bpx + bpy * bpy
    return (apx * apx + apy * apy) - (dot / len2) * dot


def _brute(points, ways_refs, coords, shift=20):
    """All-pairs argmin with threshold — the oracle semantics."""
    s2 = float(1 << shift) ** 2
    out = {}
    for doc_id, px, py in points:
        best = None
        for way_id, refs in ways_refs:
            for j in range(len(refs) - 1):
                ax, ay = coords[refs[j]]
                bx, by = coords[refs[j + 1]]
                d2 = _dist2(px, py, ax, ay, bx, by)
                if d2 <= s2:
                    key = (d2, way_id, j + 1)
                    if best is None or key < best:
                        best = key
        if best is not None:
            out[doc_id] = (best[1], best[2], best[0])
    return out


def _frames(spark, points, ways_refs, coords):
    nodes = spark.createDataFrame(
        [(nid, int(xy[1]), int(xy[0])) for nid, xy in coords.items()],
        "doc_id long, lat_i long, lon_i long",
    )
    pts = spark.createDataFrame(
        [(d, int(py), int(px)) for d, px, py in points],
        "doc_id long, lat_i long, lon_i long",
    )
    ways = spark.createDataFrame(
        [(w, list(map(int, r))) for w, r in ways_refs],
        "way_id long, refs array<long>",
    )
    return pts, ways, nodes


def _run(spark, points, ways_refs, coords, shift=20):
    pts, ways, nodes = _frames(spark, points, ways_refs, coords)
    rows = snap_to_ways(pts, ways, nodes, shift=shift).collect()
    return {
        r["doc_id"]: (r["way_id"], r["seg_idx"], r["dist2"])
        for r in rows
    }


def test_randomized_vs_brute_force(spark):
    rng = random.Random(128)
    coords = {
        i: (rng.randrange(-4 * S20, 4 * S20),
            rng.randrange(-4 * S20, 4 * S20))
        for i in range(40)
    }
    ways_refs = [
        (w, [rng.randrange(40) for _ in range(rng.randrange(2, 6))])
        for w in range(0, 40, 4)
    ]
    points = [
        (1000 + i,
         rng.randrange(-5 * S20, 5 * S20),
         rng.randrange(-5 * S20, 5 * S20))
        for i in range(120)
    ]
    got = _run(spark, points, ways_refs, coords)
    want = _brute(points, ways_refs, coords)
    assert got == want
    assert len(got) > 10  # the fixture actually exercises matches


def test_threshold_boundary_inclusive(spark):
    # vertical segment at x=0; point exactly S to the right -> kept
    # (dist2 == S*S); one unit farther -> dropped
    coords = {0: (0, 0), 1: (0, 3 * S20)}
    ways_refs = [(0, [0, 1])]
    pts_in = [(1, S20, S20)]
    pts_out = [(2, S20 + 1, S20)]
    got = _run(spark, pts_in + pts_out, ways_refs, coords)
    assert got == {1: (0, 1, float(S20) * float(S20))}


def test_tie_breaks_lowest_way_then_seg(spark):
    # two identical-distance segments from different ways, and two
    # consecutive collinear segments of one way meeting at the
    # projection point: expect (way 0, seg 1)
    coords = {0: (-10, 100), 1: (0, 100), 2: (10, 100),
              3: (-10, -100), 4: (10, -100)}
    ways_refs = [(0, [0, 1, 2]), (4, [3, 4])]
    got = _run(spark, [(7, 0, 0)], ways_refs, coords)
    assert got == {7: (0, 1, 10000.0)}


def test_zero_length_segment(spark):
    # consecutive duplicate refs: falls back to point distance,
    # no division by zero
    coords = {0: (5, 5)}
    ways_refs = [(0, [0, 0])]
    got = _run(spark, [(9, 0, 0)], ways_refs, coords)
    assert got == {9: (0, 1, 50.0)}


def test_endpoint_region_uses_vertex_distance(spark):
    # point beyond B along the segment axis: distance to B, not to
    # the infinite line
    coords = {0: (0, 0), 1: (100, 0)}
    ways_refs = [(0, [0, 1])]
    got = _run(spark, [(3, 130, 40)], ways_refs, coords)
    assert got == {3: (0, 1, float(30 * 30 + 40 * 40))}


def test_plan_has_no_cartesian_product(spark):
    coords = {0: (0, 0), 1: (100, 0)}
    pts, ways, nodes = _frames(
        spark, [(3, 130, 40)], [(0, [0, 1])], coords
    )
    plan = (
        snap_to_ways(pts, ways, nodes)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_geodesic_randomized_vs_brute_force(spark):
    """cosr-scaled snap vs an all-pairs replay of the same fp order,
    at mid-latitudes (~47-56 deg) where the scaling bites and the
    radius-2 completeness rule is exercised."""
    from osmgraft.geo.bboxtags import cosr_table

    from osmgraft.operators.linecover import snap_to_ways_geodesic

    tab = cosr_table()
    rng = random.Random(133)
    base_lat = 500_000_000  # 50 deg
    coords = {
        i: (rng.randrange(-4 * S20, 4 * S20),
            base_lat + rng.randrange(-4 * S20, 4 * S20))
        for i in range(40)
    }
    ways_refs = [
        (w, [rng.randrange(40) for _ in range(rng.randrange(2, 6))])
        for w in range(0, 40, 4)
    ]
    points = [
        (1000 + i,
         rng.randrange(-5 * S20, 5 * S20),
         base_lat + rng.randrange(-5 * S20, 5 * S20))
        for i in range(120)
    ]

    def d2g(px, py, ax, ay, bx, by):
        c = float(tab[min(abs(ay + by) // 2 // 1_000_000, 900)])
        apx = c * float(px - ax) / 4294967296.0
        apy = float(py - ay)
        abx = c * float(bx - ax) / 4294967296.0
        aby = float(by - ay)
        bpx = c * float(px - bx) / 4294967296.0
        bpy = float(py - by)
        dot = apx * abx + apy * aby
        len2 = abx * abx + aby * aby
        if dot <= 0 or len2 == 0:
            return apx * apx + apy * apy
        if dot >= len2:
            return bpx * bpx + bpy * bpy
        return (apx * apx + apy * apy) - (dot / len2) * dot

    s2 = float(S20) * float(S20)
    want = {}
    for doc_id, px, py in points:
        best = None
        for way_id, refs in ways_refs:
            for j in range(len(refs) - 1):
                d2v = d2g(px, py, *coords[refs[j]], *coords[refs[j + 1]])
                if d2v <= s2:
                    key = (d2v, way_id, j + 1)
                    if best is None or key < best:
                        best = key
        if best is not None:
            want[doc_id] = (best[1], best[2], best[0])

    pts, ways, nodes = _frames(spark, points, ways_refs, coords)
    rows = snap_to_ways_geodesic(pts, ways, nodes, shift=20).collect()
    got = {
        r["doc_id"]: (r["way_id"], r["seg_idx"], r["dist2"])
        for r in rows
    }
    assert got == want
    assert len(got) > 10
