"""way_crossings: exact segment-segment intersection detection.

Crafted geometry cases (proper X, endpoint touch, collinear
overlap, shared-junction exclusion, disjoint) plus a randomized
brute-force differential against a pure-Python classifier that
never sees the supercover candidate stage.
"""

import random

import pytest

from osmgraft.operators.crossings import way_crossings


def _frames(spark, nodes, ways):
    ndf = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in nodes.items()],
        "doc_id long, lon_i long, lat_i long",
    )
    wdf = spark.createDataFrame(
        [(wid, refs) for wid, refs in ways.items()],
        "way_id long, refs array<long>",
    )
    return wdf, ndf


def _run(spark, nodes, ways, shift=24):
    wdf, ndf = _frames(spark, nodes, ways)
    rows = way_crossings(wdf, ndf, shift=shift).collect()
    return {
        (r.way_a, r.seg_a, r.way_b, r.seg_b): r.kind for r in rows
    }


M = 10_000_000  # spread crafted points far enough to span cells


def test_crafted_cases(spark):
    nodes = {
        # X cross: (0,0)-(M,M) vs (0,M)-(M,0)
        1: (0, 0),
        2: (M, M),
        3: (0, M),
        4: (M, 0),
        # T touch: (2M,0)-(3M,0), endpoint (2.5M, 0) of the other
        5: (2 * M, 0),
        6: (3 * M, 0),
        7: (2 * M + M // 2, 0),
        8: (2 * M + M // 2, M),
        # collinear overlap on y = -M
        9: (0, -M),
        10: (M, -M),
        11: (M // 2, -M),
        12: (2 * M, -M),
        # disjoint pair
        13: (5 * M, 5 * M),
        14: (5 * M + 10, 5 * M),
        15: (6 * M, 6 * M),
        16: (6 * M + 10, 6 * M),
        # shared junction: V at node 17
        17: (-2 * M, 0),
        18: (-3 * M, M),
        19: (-M, M),
    }
    ways = {
        10: [1, 2],
        11: [3, 4],
        20: [5, 6],
        21: [7, 8],
        30: [9, 10],
        31: [11, 12],
        40: [13, 14],
        41: [15, 16],
        50: [18, 17],
        51: [17, 19],
    }
    got = _run(spark, nodes, ways)
    assert got[(10, 1, 11, 1)] == "proper"
    assert got[(20, 1, 21, 1)] == "touch"
    assert got[(30, 1, 31, 1)] == "touch"
    assert (40, 1, 41, 1) not in got
    assert not any(k[0] == 50 or k[2] == 51 for k in got)
    assert len(got) == 3


def test_endpoint_meeting_without_shared_ref_is_touch(spark):
    # two distinct node ids at the SAME coordinates: geometric
    # junction without a shared ref -> reported as touch
    nodes = {1: (0, 0), 2: (M, 0), 3: (M, 0), 4: (M, M)}
    ways = {10: [1, 2], 11: [3, 4]}
    got = _run(spark, nodes, ways)
    assert got == {(10, 1, 11, 1): "touch"}


def test_self_intersection_detected(spark):
    # one way whose 3rd segment crosses its 1st (figure-four);
    # adjacent segments share refs and are excluded
    nodes = {
        1: (0, 0),
        2: (2 * M, 0),
        3: (2 * M, M),
        4: (M, -M),
    }
    ways = {10: [1, 2, 3, 4]}
    got = _run(spark, nodes, ways)
    assert got == {(10, 1, 10, 3): "proper"}


def _sgn(x):
    return (x > 0) - (x < 0)


def _brute(nodes, ways):
    segs = []
    for wid in sorted(ways):
        refs = ways[wid]
        for j in range(len(refs) - 1):
            a, b = nodes[refs[j]], nodes[refs[j + 1]]
            segs.append(
                (wid, j + 1, refs[j], refs[j + 1], a, b)
            )
    out = {}
    for i in range(len(segs)):
        for k in range(i + 1, len(segs)):
            wa, sa, ra1, rb1, p1, p2 = segs[i]
            wb, sb, ra2, rb2, q1, q2 = segs[k]
            if (wa, sa) > (wb, sb):
                (wa, sa, ra1, rb1, p1, p2), (
                    wb,
                    sb,
                    ra2,
                    rb2,
                    q1,
                    q2,
                ) = (segs[k], segs[i])
            if {ra1, rb1} & {ra2, rb2}:
                continue

            def cross(o, p, q):
                return (p[0] - o[0]) * (q[1] - o[1]) - (
                    p[1] - o[1]
                ) * (q[0] - o[0])

            s1 = _sgn(cross(p1, p2, q1))
            s2 = _sgn(cross(p1, p2, q2))
            s3 = _sgn(cross(q1, q2, p1))
            s4 = _sgn(cross(q1, q2, p2))
            proper = s1 * s2 == -1 and s3 * s4 == -1

            def on(s, pt, a, b):
                return (
                    s == 0
                    and min(a[0], b[0]) <= pt[0] <= max(a[0], b[0])
                    and min(a[1], b[1]) <= pt[1] <= max(a[1], b[1])
                )

            touch = (
                on(s1, q1, p1, p2)
                or on(s2, q2, p1, p2)
                or on(s3, p1, q1, q2)
                or on(s4, p2, q1, q2)
            )
            if proper or touch:
                out[(wa, sa, wb, sb)] = (
                    "proper" if proper else "touch"
                )
    return out


@pytest.mark.parametrize("seed", [7, 42])
def test_random_brute_force_differential(spark, seed):
    rng = random.Random(seed)
    nodes = {
        i: (
            rng.randrange(-1_800_000_000, 1_800_000_001),
            rng.randrange(-900_000_000, 900_000_001),
        )
        for i in range(1, 81)
    }
    ways = {}
    ids = list(nodes)
    for w in range(40):
        k = rng.choice([2, 3])
        ways[w] = [rng.choice(ids) for _ in range(k)]
    got = _run(spark, nodes, ways, shift=26)
    assert got == _brute(nodes, ways)
