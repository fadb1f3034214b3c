"""interpolate_housenumbers vs a pure-Python replay of the same
pinned double op sequence, including zero-length segments,
endpoint housenumbers, and the single-owner segment-pick rule."""

from __future__ import annotations

import math
import random

from osmgraft.operators.linecover import interpolate_housenumbers


def _brute(ways, coords, step=2):
    out = {}
    for way_id, refs, h0, h1 in ways:
        pts = [coords[r] for r in refs]
        segs = []
        cum = 0.0
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            dxd = float(bx - ax)
            dyd = float(by - ay)
            sl = math.sqrt(dxd * dxd + dyd * dyd)
            prev = cum
            cum = cum + sl
            segs.append((prev, cum, sl, ax, ay, bx, by))
        total = cum
        for h in range(h0, h1 + 1, step):
            t = total * (float(h - h0) / float(h1 - h0))
            owners = [
                s
                for k, s in enumerate(segs)
                if s[0] <= t and (t < s[1] or k == len(segs) - 1)
            ]
            assert len(owners) == 1, (way_id, h, owners)
            prev, _, sl, ax, ay, bx, by = owners[0]
            if sl == 0.0:
                out[(way_id, h)] = (float(ax), float(ay))
            else:
                u = (t - prev) / sl
                out[(way_id, h)] = (
                    float(ax) + u * float(bx - ax),
                    float(ay) + u * float(by - ay),
                )
    return out


def _run(spark, ways, coords):
    nodes = spark.createDataFrame(
        [(n, int(xy[1]), int(xy[0])) for n, xy in coords.items()],
        "doc_id long, lat_i long, lon_i long",
    )
    wdf = spark.createDataFrame(
        [(w, list(map(int, r)), h0, h1) for w, r, h0, h1 in ways],
        "way_id long, refs array<long>, h_first long, h_last long",
    )
    rows = interpolate_housenumbers(wdf, nodes).collect()
    return {
        (r["way_id"], r["housenumber"]): (r["lon_d"], r["lat_d"])
        for r in rows
    }


def test_randomized_bit_exact(spark):
    rng = random.Random(130)
    coords = {
        i: (rng.randrange(-10**7, 10**7), rng.randrange(-10**7, 10**7))
        for i in range(30)
    }
    ways = []
    for w in range(0, 48, 4):
        n = rng.randrange(2, 6)
        refs = [rng.randrange(30) for _ in range(n)]
        if w % 3 == 0:
            refs.append(refs[0])
        ways.append((w, refs, 2, 2 + 2 * rng.randrange(3, 9)))
    got = _run(spark, ways, coords)
    want = _brute(ways, coords)
    assert got == want
    assert len(got) > 40


def test_zero_length_segments_and_endpoints(spark):
    # way with a duplicated middle node and matching endpoints:
    # h0 sits at the way start, h1 at the way end, the middle
    # housenumber resolves through the zero-length segment rule
    coords = {0: (0, 0), 1: (100, 0), 2: (200, 0)}
    ways = [(0, [0, 1, 1, 2], 2, 6)]
    got = _run(spark, ways, coords)
    assert got == {
        (0, 2): (0.0, 0.0),
        (0, 4): (100.0, 0.0),
        (0, 6): (200.0, 0.0),
    }


def test_all_zero_length_way(spark):
    # all nodes identical: every housenumber lands on the point
    coords = {0: (7, 9)}
    ways = [(0, [0, 0, 0], 2, 4)]
    got = _run(spark, ways, coords)
    assert got == {(0, 2): (7.0, 9.0), (0, 4): (7.0, 9.0)}
