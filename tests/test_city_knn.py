"""city_knn_cells: certified cell-prefix reverse kNN (q104).

Exactness must hold at EVERY shift — the certificate routes
uncertified cities to brute force, so shift only moves work
between branches, never changes the answer.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.knn import city_knn_cells


@pytest.fixture(scope="module")
def pts(spark):
    return spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        (F.lit(470000000) + (F.col("id") * 2246822519) % 40000000)
        .cast("long")
        .alias("lat_i"),
        (F.lit(100000000) + (F.col("id") * 2654435761) % 40000000)
        .cast("long")
        .alias("lon_i"),
    )


def _brute(pts_rows, cities, k):
    px = np.array([r.lon_i for r in pts_rows], dtype=np.int64)
    py = np.array([r.lat_i for r in pts_rows], dtype=np.int64)
    ids = np.array([r.doc_id for r in pts_rows], dtype=np.int64)
    want = set()
    for name, clat, clon in cities:
        d2 = (py - clat) ** 2 + (px - clon) ** 2
        order = np.lexsort((ids, d2))[:k]
        for rank, j in enumerate(order, start=1):
            want.add((name, rank, int(ids[j]), int(d2[j])))
    return want


# sparse desert city (far corner) forces the fallback branch at
# small shifts; megacity-adjacent ones certify
CITIES = [
    ("alpha", 485_000_000, 115_000_000),
    ("beta", 472_500_000, 101_000_000),
    ("desert", 600_000_000, 137_900_000),  # outside the point cloud
]


@pytest.mark.parametrize("shift", [16, 20, 23])
def test_exact_at_every_shift(spark, pts, shift):
    rows = pts.collect()
    want = _brute(rows, CITIES, k=3)
    out = city_knn_cells(
        pts,
        [c[0] for c in CITIES],
        np.array([c[1] for c in CITIES]),
        np.array([c[2] for c in CITIES]),
        k=3,
        shift=shift,
    )
    got = {
        (r.neighbor, r.rank, r.doc_id, r.dist2) for r in out.collect()
    }
    assert got == want


def test_certificate_splits_branches(spark, pts):
    """At a mid shift some cities certify and some don't — both
    branches must be live (otherwise the test proves nothing)."""
    shift = 20
    out = city_knn_cells(
        pts,
        [c[0] for c in CITIES],
        np.array([c[1] for c in CITIES]),
        np.array([c[2] for c in CITIES]),
        k=3,
        shift=shift,
    )
    side = 1 << shift
    per_city = (
        out.groupBy("neighbor")
        .agg(F.max("dist2").alias("kd"), F.count("*").alias("n"))
        .collect()
    )
    certified = {
        r.neighbor for r in per_city if r.n == 3 and r.kd <= side * side
    }
    assert 0 < len(certified) < len(CITIES)


def test_plan_broadcast_no_global_cartesian(spark, pts):
    """Candidate join must be a broadcast hash join on the cell key;
    the only nested-loop is the fallback against the (usually
    empty) uncertified-city dim — never a shuffle of the big side
    against all cities."""
    out = city_knn_cells(
        pts,
        [c[0] for c in CITIES],
        np.array([c[1] for c in CITIES]),
        np.array([c[2] for c in CITIES]),
        k=3,
        shift=20,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
