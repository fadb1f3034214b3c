"""Signed border distance (spatial.border_distance): brute-force
Python replay of the pinned-order double arithmetic, sign
semantics, and vertical-edge coverage."""

from __future__ import annotations

import random

from osmgraft.fixtures import fixture_polyset
from osmgraft.operators.spatial import (
    border_distance,
    border_edge_list,
)


def _py_d2(px, py, ax, ay, bx, by):
    apx = float(px - ax)
    apy = float(py - ay)
    bpx = float(px - bx)
    bpy = float(py - by)
    abx = float(bx - ax)
    aby = float(by - ay)
    len2 = float((bx - ax) ** 2 + (by - ay) ** 2)
    dot = apx * abx + apy * aby
    ap2 = apx * apx + apy * apy
    bp2 = bpx * bpx + bpy * bpy
    if dot <= 0:
        return ap2
    if dot >= len2:
        return bp2
    return ap2 - (dot / len2) * dot


def _nearest(px, py, edges):
    return min(
        (_py_d2(px, py, ax, ay, bx, by), pi, eid, nm)
        for pi, eid, nm, ax, ay, bx, by in edges
    )


def test_matches_bruteforce_replay(spark):
    ps = fixture_polyset()
    edges = border_edge_list(ps)
    rng = random.Random(137)
    pts = [
        (
            i,
            470000000 + rng.randrange(0, 40000000),
            100000000 + rng.randrange(0, 40000000),
        )
        for i in range(150)
    ]
    df = spark.createDataFrame(
        pts, "doc_id long, lat_i long, lon_i long"
    )
    rows = {
        r["doc_id"]: r
        for r in border_distance(df, ps).collect()
    }
    for i, la, lo in pts:
        d2, pi, eid, nm = _nearest(lo, la, edges)
        r = rows[i]
        assert r["dist2"] == d2, (i, r["dist2"], d2)
        assert r["nearest"] == nm
        # sign: negative iff a region was assigned
        if r["region"] is not None:
            assert r["signed_d2"] == -d2
        else:
            assert r["signed_d2"] == d2


def test_vertical_edge_is_real_boundary(spark):
    # a point due east of Vertland's exactly-vertical edge must
    # measure distance to THAT edge, not to the nearest slanted one
    ps = fixture_polyset()
    edges = border_edge_list(ps)
    vert = [
        (pi, eid, nm, ax, ay, bx, by)
        for pi, eid, nm, ax, ay, bx, by in edges
        if ax == bx
    ]
    assert vert, "fixture should contain a vertical border edge"
    pi, eid, nm, ax, ay, bx, by = vert[0]
    mid_y = (ay + by) // 2
    px = ax + 50000  # 5e-3 deg east of the vertical line
    df = spark.createDataFrame(
        [(1, mid_y, px)], "doc_id long, lat_i long, lon_i long"
    )
    r = border_distance(df, ps).collect()[0]
    d2, _, _, nm_best = _nearest(px, mid_y, edges)
    assert r["dist2"] == d2
    # if the vertical edge is the true nearest, dist2 is exactly
    # the horizontal offset squared
    if nm_best == nm and d2 == float(50000**2):
        assert r["nearest"] == nm
