"""Trace Hausdorff pairs (linecover.trace_hausdorff_pairs):
reported h2 equals brute force for every candidate pair, and the
`within` set is COMPLETE — every all-pairs pair with H <= S is
reported (the dilated-cell candidate argument)."""

from __future__ import annotations

import random

from osmgraft.operators.linecover import trace_hausdorff_pairs

SHIFT = 22
S2 = 1 << (2 * SHIFT)


def _h2(pa, pb):
    def one_sided(xs, ys):
        return max(
            min(
                (ax - bx) ** 2 + (ay - by) ** 2 for bx, by in ys
            )
            for ax, ay in xs
        )

    return max(one_sided(pa, pb), one_sided(pb, pa))


def _mk_traces(rng, n, spread):
    traces = {}
    for t in range(n):
        ax = rng.randrange(-spread, spread)
        ay = rng.randrange(-spread, spread)
        pts = []
        for s in range(5):
            pts.append(
                (
                    ax + s * rng.randrange(-200000, 200000),
                    ay + s * rng.randrange(-200000, 200000),
                )
            )
        traces[t] = pts
    return traces


def test_h2_exact_and_within_complete(spark):
    rng = random.Random(141)
    # spread ~ 3 cells so plenty of pairs fall under S and some
    # candidates exceed it
    traces = _mk_traces(rng, 30, 6_000_000)
    rows = [
        (t, s, y, x)
        for t, pts in traces.items()
        for s, (x, y) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "trace_id long, step long, lat_i long, lon_i long"
    )
    got = {
        (r["trace_a"], r["trace_b"]): (r["h2"], r["within"])
        for r in trace_hausdorff_pairs(df, shift=SHIFT).collect()
    }

    # exactness on every reported pair
    for (a, b), (h2, within) in got.items():
        exp = _h2(traces[a], traces[b])
        assert h2 == exp, (a, b, h2, exp)
        assert within == (h2 <= S2)

    # completeness: all-pairs ground truth <= S must be present
    close = {
        (a, b)
        for a in traces
        for b in traces
        if a < b and _h2(traces[a], traces[b]) <= S2
    }
    assert close, "fixture should produce at least one close pair"
    for pair in close:
        assert pair in got and got[pair][1] is True, pair
