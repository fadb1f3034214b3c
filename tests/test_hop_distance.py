"""hop_distance vs a pure-Python hop-bounded Bellman-Ford with the
same integer weights (floor of IEEE sqrt)."""

from __future__ import annotations

import math
import random

from osmgraft.operators.linecover import hop_distance


def _brute(ways_refs, coords, seeds, n_hops):
    edges = {}
    for _, refs in ways_refs:
        for i in range(len(refs) - 1):
            u, v = refs[i], refs[i + 1]
            (ax, ay), (bx, by) = coords[u], coords[v]
            dxd = float(bx - ax)
            dyd = float(by - ay)
            w = int(math.floor(math.sqrt(dxd * dxd + dyd * dyd)))
            edges.setdefault(u, []).append((v, w))
            edges.setdefault(v, []).append((u, w))
    dist = {s: 0 for s in seeds}
    for _ in range(n_hops):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in edges.get(u, []):
                if v not in nxt or d + w < nxt[v]:
                    nxt[v] = d + w
        dist = nxt
    return dist


def _run(spark, ways_refs, coords, seeds, n_hops):
    nodes = spark.createDataFrame(
        [(n, int(xy[1]), int(xy[0])) for n, xy in coords.items()],
        "doc_id long, lat_i long, lon_i long",
    )
    ways = spark.createDataFrame(
        [(w, list(map(int, r))) for w, r in ways_refs],
        "way_id long, refs array<long>",
    )
    sdf = spark.createDataFrame(
        [(s,) for s in seeds], "doc_id long"
    )
    rows = hop_distance(ways, nodes, sdf, n_hops=n_hops).collect()
    return {r["doc_id"]: r["dist"] for r in rows}


def test_randomized_vs_bellman_ford(spark):
    rng = random.Random(132)
    coords = {
        i: (rng.randrange(-10**6, 10**6), rng.randrange(-10**6, 10**6))
        for i in range(40)
    }
    ways_refs = [
        (w, [rng.randrange(40) for _ in range(rng.randrange(2, 6))])
        for w in range(0, 60, 4)
    ]
    seeds = [0, 7, 13]
    for hops in (1, 3):
        got = _run(spark, ways_refs, coords, seeds, hops)
        want = _brute(ways_refs, coords, seeds, hops)
        assert got == want
    assert len(_run(spark, ways_refs, coords, seeds, 3)) > 3


def test_min_over_multiple_paths(spark):
    # triangle: direct hop 0->2 is longer than 0->1->2, but only
    # visible once 2 hops are allowed
    coords = {0: (0, 0), 1: (30, 40), 2: (60, 0)}
    ways_refs = [(0, [0, 1, 2]), (4, [0, 2])]
    got1 = _run(spark, ways_refs, coords, [0], 1)
    assert got1 == {0: 0, 1: 50, 2: 60}
    got2 = _run(spark, ways_refs, coords, [0], 2)
    assert got2 == {0: 0, 1: 50, 2: 60}  # 50+50=100 > 60 direct
