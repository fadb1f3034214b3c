"""Grid density clustering (density.grid_density_clusters): two
separated blobs -> two clusters, noise -> null, border cells
attach to the adjacent core cluster."""

from __future__ import annotations

from osmgraft.geo.cells import LAT_OFFSET, LON_OFFSET
from osmgraft.operators.density import grid_density_clusters

SHIFT = 22
SIDE = 1 << SHIFT


def _cell_pt(v, u, k=0):
    # k spreads points inside the cell (stays within the cell)
    return (v * SIDE + 1000 + k * 7 - LAT_OFFSET,
            u * SIDE + 1000 + k * 11 - LON_OFFSET)


def test_two_blobs_noise_and_border(spark):
    pts = []
    # blob 1: 40 points in cell (100, 100)
    for k in range(40):
        pts.append(_cell_pt(100, 100, k))
    # blob 2: 40 points in cell (100, 110) — far from blob 1
    for k in range(40):
        pts.append(_cell_pt(100, 110, k))
    # border cell: 2 points right next to blob 1
    for k in range(2):
        pts.append(_cell_pt(100, 101, k))
    # noise: 3 isolated single points far away
    pts.append(_cell_pt(200, 200))
    pts.append(_cell_pt(210, 250))
    pts.append(_cell_pt(220, 300))

    df = spark.createDataFrame(pts, "lat_i long, lon_i long")
    rows = {
        r["cell"]: r
        for r in grid_density_clusters(
            df, shift=SHIFT, density_denom=10
        ).collect()
    }
    pack = 1024
    c1 = 100 * pack + 100
    c2 = 100 * pack + 110
    cb = 100 * pack + 101

    # total 85 points; 1/10 = 8.5 -> blob neighborhoods (42, 40)
    # are core, noise neighborhoods (1) are not
    assert rows[c1]["is_core"] and rows[c2]["is_core"]
    assert rows[c1]["cluster"] != rows[c2]["cluster"]
    assert rows[c1]["cluster"] is not None
    # border cell: not core (its nb9 includes blob 1 -> 42 >= 8.5
    # ... so with this threshold it IS core and joins blob 1)
    assert rows[cb]["cluster"] == rows[c1]["cluster"]
    # noise cells: no cluster
    noise = [
        r for c, r in rows.items() if c not in (c1, c2, cb)
    ]
    assert len(noise) == 3
    assert all(r["cluster"] is None for r in noise)
    assert all(not r["is_core"] for r in noise)


def test_border_attach_without_core_status(spark):
    pts = []
    # one dense cell of 50, a neighbor cell with a single point,
    # and 60 scattered singles far away to push the total up so
    # the single-point neighbor is NOT core
    for k in range(50):
        pts.append(_cell_pt(100, 100, k))
    pts.append(_cell_pt(100, 102, 0))  # 2 cells away: sparse
    for j in range(60):
        pts.append(_cell_pt(400 + 3 * j, 600, 0))

    df = spark.createDataFrame(pts, "lat_i long, lon_i long")
    rows = {
        r["cell"]: r
        for r in grid_density_clusters(
            df, shift=SHIFT, density_denom=10
        ).collect()
    }
    pack = 1024
    c1 = 100 * pack + 100
    cs = 100 * pack + 102
    # total 111 -> threshold 11.1; dense cell nb9 = 50 core;
    # sparse at distance 2: nb9 = 1 -> not core, not adjacent ->
    # noise
    assert rows[c1]["is_core"]
    assert rows[c1]["cluster"] == c1  # isolated core: own label
    assert not rows[cs]["is_core"]
    assert rows[cs]["cluster"] is None
