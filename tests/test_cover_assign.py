"""Decided-cell cover (geo/cover.py): exactness vs the plain
assignment, boundary-superset property, and resolution scaling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.fixtures import fixture_polyset
from osmgraft.geo.cells import LAT_OFFSET, LON_OFFSET
from osmgraft.geo.cover import build_cell_cover
from osmgraft.geo.pip import assign_polygons
from osmgraft.operators import spatial


def _apply_cover(cov, px, py):
    r, s, needs = cov.classify(px, py)
    r, s = np.array(r), np.array(s)
    if needs.any():
        re_, se_ = assign_polygons(px[needs], py[needs], cov.polyset)
        r[needs] = re_
        s[needs] = se_
    return r, s, needs


def test_cover_matches_exact_kernel_random():
    ps = fixture_polyset()
    cov = build_cell_cover(ps)
    rng = np.random.default_rng(42)
    gx1, gy1, gx2, gy2 = ps.global_bbox
    pad = (gx2 - gx1) // 8
    px = rng.integers(gx1 - pad, gx2 + pad, 300_000)
    py = rng.integers(gy1 - pad, gy2 + pad, 300_000)
    r0, s0 = assign_polygons(px, py, ps)
    r1, s1, needs = _apply_cover(cov, px, py)
    assert (r0 == r1).all() and (s0 == s1).all()
    # the cover must actually elide work: most points are decided
    assert needs.mean() < 0.5


def test_cover_boundary_points_take_exact_kernel():
    """Every point ON or within 2 units of any boundary segment
    (including the vertical segments dropped from the crossing
    arrays) must be classified boundary -> exact kernel, so the
    reference's half-open tie rules apply bit-exactly."""
    ps = fixture_polyset()
    cov = build_cell_cover(ps)
    ex = np.concatenate(
        [np.concatenate([p.x1, p.x2, (p.x1 + p.x2) // 2, p.vx])
         for p in ps.polys]
    )
    ey = np.concatenate(
        [np.concatenate([p.y1, p.y2, (p.y1 + p.y2) // 2, p.vy1])
         for p in ps.polys]
    )
    for dx in (-2, 0, 2):
        for dy in (-2, 0, 2):
            r0, s0 = assign_polygons(ex + dx, ey + dy, ps)
            r1, s1, _ = _apply_cover(cov, ex + dx, ey + dy)
            assert (r0 == r1).all() and (s0 == s1).all()
    # exactly-on-segment midpoints sit in boundary cells
    _, _, needs = cov.classify(ex, ey)
    assert needs.all()


def test_cover_resolution_shrinks_boundary():
    """Boundary-cell fraction ~ perimeter * cellsize / area: a 16x
    cell budget (4x finer in each axis) must cut the undecided
    fraction — the 100-TB knob actually works."""
    ps = fixture_polyset()
    coarse = build_cell_cover(ps, max_cells=1 << 12)
    fine = build_cell_cover(ps, max_cells=1 << 20)
    assert fine.decided_frac > coarse.decided_frac
    assert fine.decided_frac > 0.9


def test_cover_vertical_segments_marked():
    """The fixture polyset has >= 1 exactly-vertical segment; its
    cells must be boundary (the round-2 dropped-edge trap)."""
    ps = fixture_polyset()
    n_vert = sum(len(p.vx) for p in ps.polys)
    assert n_vert >= 1
    cov = build_cell_cover(ps)
    for p in ps.polys:
        for i in range(len(p.vx)):
            mid = (p.vy1[i] + p.vy2[i]) // 2
            _, _, needs = cov.classify(
                np.array([p.vx[i]]), np.array([mid])
            )
            assert needs.all()


def test_assign_regions_cover_equals_assign_regions(spark):
    pts = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        (F.lit(470000000) + (F.col("id") * 2246822519) % 40000000)
        .cast("long")
        .alias("lat_i"),
        (F.lit(100000000) + (F.col("id") * 2654435761) % 40000000)
        .cast("long")
        .alias("lon_i"),
    )
    base = {
        r.doc_id: (r.region, r.subregion, r.region_admin)
        for r in spatial.assign_regions(pts, fixture_polyset()).collect()
    }
    cov = {
        r.doc_id: (r.region, r.subregion, r.region_admin)
        for r in spatial.assign_regions_cover(
            pts, fixture_polyset()
        ).collect()
    }
    assert cov == base


def test_assign_regions_cover_plan_shape(spark):
    """Single scan, single Arrow stage, zero Exchange — the cover
    changes the kernel's work, not the plan."""
    pts = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.lit(480000000).cast("long").alias("lat_i"),
        F.lit(120000000).cast("long").alias("lon_i"),
    )
    out = spatial.assign_regions_cover(pts, fixture_polyset())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
