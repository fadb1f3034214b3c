"""STR-packed polygon R-tree: packing invariants, candidate
equivalence with the linear bbox sweep, end-to-end assignment
equality with assign_regions, and the zero-shuffle plan shape."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraft.geo.pip import PolygonSet, assign_polygons, build_edges
from osmgraft.geo.rtree import (
    STRtree,
    assign_polygons_rtree,
    build_polyset_rtree,
)


def _rand_polyset(rng, n_polys):
    polys, names, levels = [], [], []
    for i in range(n_polys):
        cx, cy = rng.integers(-1_000_000, 1_000_000, 2)
        r = int(rng.integers(1_000, 300_000))
        k = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        xs = (cx + r * np.cos(ang)).astype(np.int64)
        ys = (cy + r * np.sin(ang)).astype(np.int64)
        polys.append(build_edges([(xs, ys)]))
        names.append(f"p{i}")
        levels.append(int(rng.integers(2, 11)))
    return PolygonSet(names, np.array(levels), polys)


def test_str_packing_invariants():
    rng = np.random.default_rng(3)
    for n in (1, 2, 5, 16, 17, 100, 333):
        x1 = rng.integers(-10**6, 10**6, n)
        y1 = rng.integers(-10**6, 10**6, n)
        x2 = x1 + rng.integers(1, 10**5, n)
        y2 = y1 + rng.integers(1, 10**5, n)
        t = STRtree.build(x1, y1, x2, y2, cap=4)
        # every entry appears exactly once across leaves
        leaf_entries = np.concatenate(
            [
                t.order[t.child_lo[k] : t.child_hi[k]]
                for k in range(len(t.is_leaf))
                if t.is_leaf[k]
            ]
        )
        assert sorted(leaf_entries.tolist()) == list(range(n))
        # node MBRs contain their children
        for k in range(len(t.is_leaf)):
            kids = t.order[t.child_lo[k] : t.child_hi[k]]
            if t.is_leaf[k]:
                assert t.nx1[k] == x1[kids].min()
                assert t.ny1[k] == y1[kids].min()
                assert t.nx2[k] == x2[kids].max()
                assert t.ny2[k] == y2[kids].max()
            else:
                assert t.nx1[k] == t.nx1[kids].min()
                assert t.ny2[k] == t.ny2[kids].max()
        # root MBR is the global bbox
        r = t.root
        assert t.nx1[r] == x1.min() and t.nx2[r] == x2.max()
        assert t.ny1[r] == y1.min() and t.ny2[r] == y2.max()


def test_candidates_match_linear_bbox_sweep():
    rng = np.random.default_rng(11)
    for _ in range(10):
        ps = _rand_polyset(rng, int(rng.integers(1, 80)))
        t = build_polyset_rtree(ps, cap=4)
        n = 500
        px = rng.integers(-1_200_000, 1_200_000, n)
        py = rng.integers(-1_200_000, 1_200_000, n)
        cands = t.query_candidates(
            px, py, ps.bbx1, ps.bby1, ps.bbx2, ps.bby2
        )
        for i in range(len(ps)):
            want = np.nonzero(
                (px >= ps.bbx1[i])
                & (px <= ps.bbx2[i])
                & (py >= ps.bby1[i])
                & (py <= ps.bby2[i])
            )[0]
            got = cands.get(i, np.zeros(0, dtype=np.int64))
            assert sorted(got.tolist()) == want.tolist()


def test_assignment_equals_linear_scan():
    rng = np.random.default_rng(7)
    for trial in range(20):
        ps = _rand_polyset(rng, int(rng.integers(1, 120)))
        t = build_polyset_rtree(ps, cap=4)
        n = int(rng.integers(0, 3000))
        px = rng.integers(-1_200_000, 1_200_000, n)
        py = rng.integers(-1_200_000, 1_200_000, n)
        r1, s1 = assign_polygons(px, py, ps)
        r2, s2 = assign_polygons_rtree(px, py, ps, t)
        assert (r1 == r2).all(), trial
        assert (s1 == s2).all(), trial


def test_empty_tree_and_empty_batch():
    ps = PolygonSet([], np.zeros(0), [])
    t = build_polyset_rtree(ps)
    r, s = assign_polygons_rtree(
        np.zeros(0), np.zeros(0), ps, t
    )
    assert len(r) == 0 and len(s) == 0
    rng = np.random.default_rng(0)
    ps2 = _rand_polyset(rng, 5)
    t2 = build_polyset_rtree(ps2)
    r2, s2 = assign_polygons_rtree(np.zeros(0), np.zeros(0), ps2, t2)
    assert len(r2) == 0


def test_assign_regions_rtree_matches_assign_regions(spark):
    from osmgraft.fixtures import fixture_polyset
    from osmgraft.operators.spatial import (
        assign_regions,
        assign_regions_rtree,
    )
    from osmgraft.suite import doc_points

    pts = doc_points(spark, "/root/testdata/sf0.001")
    ps = fixture_polyset()
    a = assign_regions(pts, ps).select(
        "doc_id", "region", "subregion"
    )
    b = assign_regions_rtree(pts, ps, cap=4).select(
        "doc_id", "region", "subregion"
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


def test_assign_regions_rtree_plan_shape(spark):
    """Broadcast tree, partition-local points: one Arrow stage,
    zero Exchange — same shape contract as assign_regions."""
    from osmgraft.fixtures import fixture_polyset
    from osmgraft.operators.spatial import assign_regions_rtree
    from osmgraft.suite import doc_points

    out = assign_regions_rtree(
        doc_points(spark, "/root/testdata/sf0.001"), fixture_polyset()
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_rtree_prunes_scattered_polygons():
    """Scale evidence: on a large scattered polygon set the tree
    touches a small fraction of the N*P bbox tests the linear
    sweep performs (candidate sets are identical — only the work
    to FIND them differs)."""
    rng = np.random.default_rng(123)
    P, N = 2000, 5000
    # scattered small polygons over a world-sized extent
    cx = rng.integers(-1_700_000_000, 1_700_000_000, P)
    cy = rng.integers(-850_000_000, 850_000_000, P)
    r = rng.integers(100_000, 2_000_000, P)
    bx1, bx2 = cx - r, cx + r
    by1, by2 = cy - r, cy + r
    t = STRtree.build(bx1, by1, bx2, by2, cap=16)
    px = rng.integers(-1_800_000_000, 1_800_000_000, N)
    py = rng.integers(-900_000_000, 900_000_000, N)

    # instrument: count point-MBR comparisons the traversal makes
    comparisons = 0
    base = np.arange(N, dtype=np.int64)
    stack = [(t.root, base)]
    cands = {}
    while stack:
        node, idx = stack.pop()
        comparisons += len(idx)
        m = (
            (px[idx] >= t.nx1[node])
            & (px[idx] <= t.nx2[node])
            & (py[idx] >= t.ny1[node])
            & (py[idx] <= t.ny2[node])
        )
        if not m.any():
            continue
        idx = idx[m]
        kids = t.order[t.child_lo[node] : t.child_hi[node]]
        if t.is_leaf[node]:
            for e in kids:
                comparisons += len(idx)
                em = (
                    (px[idx] >= bx1[e])
                    & (px[idx] <= bx2[e])
                    & (py[idx] >= by1[e])
                    & (py[idx] <= by2[e])
                )
                if em.any():
                    cands[int(e)] = idx[em]
        else:
            for k in kids:
                stack.append((int(k), idx))

    linear_comparisons = N * P
    assert comparisons < 0.15 * linear_comparisons
    # and the candidates are still exactly the bbox hits
    got = t.query_candidates(px, py, bx1, by1, bx2, by2)
    assert set(got) == set(cands)
    for e in got:
        assert (np.sort(got[e]) == np.sort(cands[e])).all()
