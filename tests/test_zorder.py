"""Morton z-order index: encode parity, cover properties, filter
equivalence, and the stored-column pushdown that is the point of
the curve at scale."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.geo.cells import LAT_OFFSET, LON_OFFSET
from osmgraft.geo.zorder import (
    bbox_zcells,
    bbox_zranges,
    morton_bands_np,
    morton_np,
)
from osmgraft.operators.spatial import (
    bbox_contains,
    with_zorder,
    zorder_bbox_filter,
)

rng = np.random.default_rng(20260818)


def _interleave_py(y: int, x: int) -> int:
    z = 0
    for b in range(32):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def _rand_coords(n):
    lat = rng.integers(-900_000_000, 900_000_001, n, dtype=np.int64)
    lon = rng.integers(-1_800_000_000, 1_800_000_001, n, dtype=np.int64)
    return lat, lon


def test_morton_np_matches_bitwise_reference():
    lat, lon = _rand_coords(500)
    got = morton_np(lat, lon)
    latb = (lat + LAT_OFFSET) >> 14
    lonb = (lon + LON_OFFSET) >> 14
    want = [_interleave_py(int(y), int(x)) for y, x in zip(latb, lonb)]
    assert got.tolist() == want


def test_morton_is_band_interleave_prefix_compatible():
    # z >> 2k == morton of the k-coarsened bands — the property the
    # cover planner and the IN-set membership rely on
    lat, lon = _rand_coords(300)
    z = morton_np(lat, lon)
    for k in (1, 3, 7):
        latb = (lat + LAT_OFFSET) >> 14
        lonb = (lon + LON_OFFSET) >> 14
        coarse = morton_bands_np(latb >> k, lonb >> k)
        assert (z >> (2 * k) == coarse).all()


def test_spark_expression_matches_numpy(spark):
    lat, lon = _rand_coords(200)
    df = spark.createDataFrame(
        [(int(a), int(o)) for a, o in zip(lat, lon)],
        "lat_i long, lon_i long",
    )
    got = {
        (r["lat_i"], r["lon_i"]): r["zkey"]
        for r in with_zorder(df).collect()
    }
    want = morton_np(lat, lon)
    for a, o, w in zip(lat, lon, want):
        assert got[(int(a), int(o))] == int(w)


def _rand_bbox():
    y1, y2 = np.sort(rng.integers(-900_000_000, 900_000_001, 2))
    x1, x2 = np.sort(rng.integers(-1_800_000_000, 1_800_000_001, 2))
    return int(x1), int(y1), int(x2), int(y2)


def test_cover_is_superset_and_bounded():
    for _ in range(25):
        bbox = _rand_bbox()
        k, cells = bbox_zcells(bbox, max_cells=64)
        assert 0 < len(cells) <= 64
        assert cells == sorted(cells)
        x1, y1, x2, y2 = bbox
        # every point in the bbox must fall in a cover cell
        lat = rng.integers(y1, y2 + 1, 200, dtype=np.int64)
        lon = rng.integers(x1, x2 + 1, 200, dtype=np.int64)
        z = morton_np(lat, lon)
        cs = set(cells)
        assert all(int(v) in cs for v in z >> (2 * k))


def test_ranges_merge_sorted_disjoint():
    for _ in range(10):
        ranges = bbox_zranges(_rand_bbox(), max_ranges=64)
        assert ranges
        for (lo, hi), (lo2, _) in zip(ranges, ranges[1:]):
            assert lo <= hi
            assert lo2 > hi + 1  # merged: no adjacency survives


def test_empty_bbox():
    assert bbox_zcells((5, 5, 4, 4)) == (0, [])
    assert bbox_zranges((5, 5, 4, 4)) == []


@pytest.fixture(scope="module")
def pts(spark):
    lat, lon = _rand_coords(4000)
    return spark.createDataFrame(
        [
            (i, int(a), int(o))
            for i, (a, o) in enumerate(zip(lat, lon))
        ],
        "doc_id long, lat_i long, lon_i long",
    ).cache()


def test_zorder_filter_equals_plain_bbox(spark, pts):
    for _ in range(6):
        x1, y1, x2, y2 = _rand_bbox()
        naive = sorted(
            r["doc_id"]
            for r in pts.filter(
                bbox_contains(
                    F.col("lon_i"), F.col("lat_i"), x1, y1, x2, y2
                )
            ).collect()
        )
        routed = sorted(
            r["doc_id"]
            for r in zorder_bbox_filter(
                pts, (x1, y1, x2, y2)
            ).collect()
        )
        assert routed == naive


def test_stored_zkey_pushdown(spark, pts, tmp_path):
    """The 100-TB layout: z key stored, table sorted by it; the
    range disjunction must reach the parquet scan as PushedFilters
    (row-group min/max pruning) and the result must stay exact."""
    path = str(tmp_path / "zsorted")
    with_zorder(pts).orderBy("zkey").write.parquet(path)
    stored = spark.read.parquet(path)
    bbox = _rand_bbox()
    got = zorder_bbox_filter(stored, bbox, zcol="zkey")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "zkey" in pushed and "GreaterThanOrEqual" in pushed
    x1, y1, x2, y2 = bbox
    naive = sorted(
        r["doc_id"]
        for r in stored.filter(
            bbox_contains(
                F.col("lon_i"), F.col("lat_i"), x1, y1, x2, y2
            )
        ).collect()
    )
    assert sorted(r["doc_id"] for r in got.collect()) == naive
