"""skyline_2d: exact agreement with a brute-force dominance scan on
randomized inputs (including negative coordinates and duplicate
points), bucket pre-filter transparency, and row counting."""

from __future__ import annotations

import numpy as np

from osmgraft.operators.skyline import skyline_2d


def _brute(pts):
    out = {}
    distinct = set(pts)
    for p in distinct:
        dominated = any(
            q[0] >= p[0]
            and q[1] >= p[1]
            and (q[0] > p[0] or q[1] > p[1])
            for q in distinct
        )
        if not dominated:
            out[p] = sum(1 for r in pts if r == p)
    return out


def _run(spark, pts, **kw):
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in pts], "x long, y long"
    )
    return {
        (r.x, r.y): r.n_rows
        for r in skyline_2d(df, "x", "y", **kw).collect()
    }


def test_skyline_matches_brute(spark):
    rng = np.random.default_rng(3)
    for trial, (lo, hi) in enumerate(
        [(-50, 50), (0, 1000), (-100000, -10)]
    ):
        pts = [tuple(p) for p in rng.integers(lo, hi, (300, 2))]
        pts += pts[:17]  # duplicates must count, not break
        got = _run(spark, pts)
        assert got == _brute(pts), trial


def test_skyline_bucket_shift_transparent(spark):
    rng = np.random.default_rng(9)
    pts = [tuple(p) for p in rng.integers(-1000, 1000, (400, 2))]
    want = _brute(pts)
    for shift in (0, 2, 8, 20):
        assert _run(spark, pts, bucket_shift=shift) == want, shift


def test_skyline_degenerate(spark):
    assert _run(spark, [(5, 5)]) == {(5, 5): 1}
    # identical points: one frontier entry counting all rows
    assert _run(spark, [(3, 7)] * 4) == {(3, 7): 4}
    # a strict chain: only the max survives
    assert _run(spark, [(i, i) for i in range(10)]) == {(9, 9): 1}
    # an anti-chain: everything survives
    pts = [(i, 10 - i) for i in range(10)]
    assert _run(spark, pts) == {p: 1 for p in pts}
