"""Differential tests: numpy PIP kernel vs compiled reference
binaries (osmconvert -B / -b, osmassignpoly --use-admin-levels) on
randomized polygons with adversarial point sweeps.

This is the correctness oracle demanded by BASELINE.json ("exact
PIP/tile match vs osmconvert .poly fixtures").
"""

import numpy as np
import pytest

from osmgraft.geo.fixedpoint import format_fix7
from osmgraft.geo.pip import assign_polygons, query_inside
from osmgraft.geo.polyfile import parse_border, parse_multipoly

from .refdiff import (
    build_refbin,
    have_refbin,
    ref_assignpoly,
    ref_bbox_filter,
    ref_border_filter,
)

pytestmark = pytest.mark.skipif(
    not (have_refbin() or build_refbin()),
    reason="reference binaries unavailable (no gcc or no /root/reference)",
)

SC = 10_000_000
RNG = np.random.default_rng(42)


def random_ring(cx, cy, r_base, n, rng):
    """Star polygon around (cx,cy), fixed-point output, 7-dec safe."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    radii = rng.uniform(0.3, 1.0, n) * r_base
    xs = (cx + radii * np.cos(angles) * SC).astype(np.int64)
    ys = (cy + radii * np.sin(angles) * SC).astype(np.int64)
    return xs, ys


def poly_text_from_rings(name_admin_rings):
    out = []
    for name, admin, rings in name_admin_rings:
        out.append(f"{name};{admin}")
        for i, (xs, ys) in enumerate(rings, 1):
            out.append(str(i) if i == 1 else f"!{i}")
            for x, y in zip(xs, ys):
                out.append(f"   {format_fix7(x)}   {format_fix7(y)}")
            out.append("END")
        out.append("END")
    return "\n".join(out) + "\n"


def adversarial_points(rings, rng, n_random=300):
    """vertices, +-1 perturbations, edge midpoints, random box fill"""
    vx = np.concatenate([np.asarray(xs) for xs, _ in rings])
    vy = np.concatenate([np.asarray(ys) for _, ys in rings])
    pts_x = [vx]
    pts_y = [vy]
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx or dy:
                pts_x.append(vx + dx)
                pts_y.append(vy + dy)
    # edge midpoints (integer truncation like any fixed-point point)
    for xs, ys in rings:
        xs = np.asarray(xs)
        ys = np.asarray(ys)
        pts_x.append((xs[:-1] + xs[1:]) // 2)
        pts_y.append((ys[:-1] + ys[1:]) // 2)
    x1, x2 = vx.min() - SC, vx.max() + SC
    y1, y2 = vy.min() - SC, vy.max() + SC
    pts_x.append(rng.integers(x1, x2, n_random))
    pts_y.append(rng.integers(y1, y2, n_random))
    px = np.concatenate(pts_x)
    py = np.concatenate(pts_y)
    keep = (np.abs(px) < 1_800_000_000) & (np.abs(py) < 900_000_000)
    return px[keep], py[keep]


def as_nodes(px, py):
    return [(i + 1, int(x), int(y), {}) for i, (x, y) in
            enumerate(zip(px, py))]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_border_filter_matches_reference(tmp_path, seed):
    rng = np.random.default_rng(seed)
    rings = [
        random_ring(11.0, 49.0, 0.8, rng.integers(5, 14), rng),
        random_ring(11.0, 49.0, 0.25, rng.integers(4, 9), rng),  # hole
    ]
    px, py = adversarial_points(rings, rng)
    text = poly_text_from_rings([("t", 2, rings)])
    ref_ids = ref_border_filter(tmp_path, as_nodes(px, py), text)
    es = parse_border(text)
    ours = query_inside(px, py, es)
    our_ids = {i + 1 for i in np.nonzero(ours)[0]}
    assert our_ids == ref_ids


def test_bbox_filter_matches_reference(tmp_path):
    rng = np.random.default_rng(7)
    px = rng.integers(100_000_000, 130_000_000, 400)
    py = rng.integers(480_000_000, 510_000_000, 400)
    # include exact corners
    px = np.concatenate([px, [110_000_000, 120_000_000]])
    py = np.concatenate([py, [490_000_000, 500_000_000]])
    ref_ids = ref_bbox_filter(
        tmp_path, as_nodes(px, py), "11,49,12,50"
    )
    # -b= corners truncate (osmconvert.c:1832-1836)
    inside = (
        (px >= 110_000_000) & (px <= 120_000_000)
        & (py >= 490_000_000) & (py <= 500_000_000)
    )
    our_ids = {i + 1 for i in np.nonzero(inside)[0]}
    assert our_ids == ref_ids


@pytest.mark.parametrize("seed", [11, 12])
def test_assignpoly_matches_reference(tmp_path, seed):
    rng = np.random.default_rng(seed)
    spec = []
    admins = [2, 6, 4, 6, 2]
    for k in range(5):
        cx = 11.0 + rng.uniform(-0.5, 0.5)
        cy = 49.0 + rng.uniform(-0.5, 0.5)
        rings = [random_ring(cx, cy, 0.6, rng.integers(5, 12), rng)]
        if k == 0:  # one polygon with a hole
            rings.append(
                random_ring(cx, cy, 0.15, rng.integers(4, 8), rng)
            )
        spec.append((f"P{k}", admins[k], rings))
    all_rings = [r for _, _, rs in spec for r in rs]
    px, py = adversarial_points(all_rings, rng, n_random=500)
    text = poly_text_from_rings(spec)

    ref = ref_assignpoly(tmp_path, as_nodes(px, py), text)

    ps = parse_multipoly(text)
    r_idx, s_idx = assign_polygons(px, py, ps)
    for i in range(len(px)):
        nid = i + 1
        want_r, want_s = ref[nid]
        got_r = ps.names[r_idx[i]] if r_idx[i] >= 0 else None
        got_s = ps.names[s_idx[i]] if s_idx[i] >= 0 else None
        assert (got_r, got_s) == (want_r, want_s), (
            f"node {nid} at ({px[i]},{py[i]}): "
            f"ours=({got_r},{got_s}) ref=({want_r},{want_s})"
        )
