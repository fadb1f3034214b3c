"""viterbi_map_match vs exhaustive path enumeration with the same
pinned double op order (tiny fixtures, all combinations scored)."""

from __future__ import annotations

import random

from osmgraft.operators.linecover import viterbi_map_match

S20 = 1 << 20
PEN = float(1 << 38)


def _dist2(px, py, ax, ay, bx, by):
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


def _brute(traces, ways_refs, coords, n_steps, k=3):
    s2 = float(S20) * float(S20)
    segs = []
    for way_id, refs in ways_refs:
        for j in range(len(refs) - 1):
            ax, ay = coords[refs[j]]
            bx, by = coords[refs[j + 1]]
            segs.append((way_id, j + 1, ax, ay, bx, by))
    out = {}
    for trace_id, pts in traces.items():
        cands = []
        for px, py in pts:
            c = sorted(
                (
                    (_dist2(px, py, *s[2:]), s[0], s[1])
                    for s in segs
                    if _dist2(px, py, *s[2:]) <= s2
                )
            )[:k]
            cands.append(c)
        if any(not c for c in cands):
            continue
        best = None

        def walk(step, way, cost, path):
            nonlocal best
            if step == n_steps:
                key = (cost, path)
                if best is None or key < best:
                    best = key
                return
            for d2, w, s in cands[step]:
                trans = 0.0 if step > 0 and w == way else (
                    0.0 if step == 0 else PEN
                )
                ncost = d2 if step == 0 else (cost + trans) + d2
                npath = (
                    f"{w}-{s}" if step == 0 else f"{path}>{w}-{s}"
                )
                walk(step + 1, w, ncost, npath)

        walk(0, None, 0.0, "")
        out[trace_id] = (best[0], best[1])
    return out


def _run(spark, traces, ways_refs, coords, n_steps, k=3):
    rows = []
    for tid, pts in traces.items():
        for step, (px, py) in enumerate(pts):
            rows.append((tid, step, int(py), int(px)))
    tp = spark.createDataFrame(
        rows, "trace_id long, step long, lat_i long, lon_i long"
    )
    nodes = spark.createDataFrame(
        [(n, int(xy[1]), int(xy[0])) for n, xy in coords.items()],
        "doc_id long, lat_i long, lon_i long",
    )
    ways = spark.createDataFrame(
        [(w, list(map(int, r))) for w, r in ways_refs],
        "way_id long, refs array<long>",
    )
    res = viterbi_map_match(
        tp, ways, nodes, n_steps=n_steps, k=k
    ).collect()
    return {
        r["trace_id"]: (r["total_cost"], r["path"]) for r in res
    }


def test_randomized_vs_enumeration(spark):
    rng = random.Random(131)
    coords = {
        i: (rng.randrange(-3 * S20, 3 * S20),
            rng.randrange(-3 * S20, 3 * S20))
        for i in range(25)
    }
    ways_refs = [
        (w, [rng.randrange(25) for _ in range(rng.randrange(2, 5))])
        for w in range(0, 32, 4)
    ]
    traces = {}
    for t in range(20):
        base = (
            rng.randrange(-3 * S20, 3 * S20),
            rng.randrange(-3 * S20, 3 * S20),
        )
        traces[t] = [
            (
                base[0] + s * rng.randrange(-S20 // 4, S20 // 4),
                base[1] + s * rng.randrange(-S20 // 4, S20 // 4),
            )
            for s in range(3)
        ]
    got = _run(spark, traces, ways_refs, coords, n_steps=3)
    want = _brute(traces, ways_refs, coords, n_steps=3)
    assert got == want
    assert len(got) >= 5


def test_switch_penalty_keeps_same_way(spark):
    # way 0 passes near both steps; way 4's segment is closer at
    # step 1 but switching costs 2^38 >> the distance gain
    coords = {0: (0, 0), 1: (4000, 0), 2: (1000, 90), 3: (3000, 90)}
    ways_refs = [(0, [0, 1]), (4, [2, 3])]
    traces = {1: [(500, 100), (2000, 100)]}
    got = _run(spark, traces, ways_refs, coords, n_steps=2, k=2)
    assert got[1][1] == "0-1>0-1"
    want = _brute(traces, ways_refs, coords, n_steps=2, k=2)
    assert got == want


def test_dead_step_kills_trace(spark):
    # step 1 is farther than one cell side from every segment
    coords = {0: (0, 0), 1: (100, 0)}
    ways_refs = [(0, [0, 1])]
    traces = {7: [(50, 10), (50, 3 * S20)]}
    got = _run(spark, traces, ways_refs, coords, n_steps=2)
    assert got == {}
