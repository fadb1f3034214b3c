"""q155 region-overlap matrix: containment and sanity invariants
on the fixture polygon set."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def overlap(spark):
    from osmgraft.suite import q155_region_overlap

    rows = q155_region_overlap(spark, "/root/testdata/sf0.001")
    return {(r.name_a, r.name_b): r for r in rows.collect()}


def test_overia_containment(overlap):
    # Overia6 sits inside Overia2 by fixture construction: every
    # cell of the inner mask is shared
    key = ("Overia2", "Overia6")
    assert key in overlap
    r = overlap[key]
    assert r.n_shared == r.n_b
    assert r.n_a > r.n_b


def test_shared_bounded_by_sides(overlap):
    assert overlap  # fixture polygons do overlap
    for r in overlap.values():
        assert 0 < r.n_shared <= min(r.n_a, r.n_b)
        assert r.name_a < r.name_b


def test_counts_match_raster(spark, overlap):
    from osmgraft.fixtures import fixture_polyset
    from osmgraft.operators.spatial import rasterize_polygons

    cnt = {
        r.name: r.n
        for r in rasterize_polygons(
            spark, fixture_polyset(), shift=20
        )
        .groupBy("name")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for (a, b), r in overlap.items():
        assert r.n_a == cnt[a] and r.n_b == cnt[b]
