"""Hilbert key: spark emitter vs the independent python reference,
bijectivity, and the locality advantage over Morton that justifies
the operator."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from osmgraft.geo.hilbert import hilbert_d, with_hilbert


def test_spark_matches_python_reference(spark):
    rng = random.Random(9)
    pts = [
        (i, rng.randrange(0, 4096), rng.randrange(0, 4096))
        for i in range(400)
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        r.id: r.hd
        for r in with_hilbert(df, "x", "y", order=12).collect()
    }
    assert got == {i: hilbert_d(x, y, 12) for i, x, y in pts}


def test_bijective_on_small_grid(spark):
    n = 32
    cells = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "id long, x long, y long")
    hd = [
        r.hd for r in with_hilbert(df, "x", "y", order=5).collect()
    ]
    assert sorted(hd) == list(range(n * n))


def test_locality_beats_morton():
    def morton(x, y):
        d = 0
        for b in range(8):
            d |= ((x >> b) & 1) << (2 * b)
            d |= ((y >> b) & 1) << (2 * b + 1)
        return d

    h = m = cnt = 0
    for x in range(128):
        for y in range(127):
            h += abs(hilbert_d(x, y, 7) - hilbert_d(x, y + 1, 7))
            m += abs(morton(x, y) - morton(x, y + 1))
            cnt += 1
    assert h < 0.8 * m  # strictly tighter neighbor packing


def test_plan_stays_codegen(spark):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") % 57).alias("y"),
    )
    out = with_hilbert(df, "x", "y", order=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only
    assert "EvalPython" not in plan


def test_prefix_property():
    rng = random.Random(5)
    for _ in range(1500):
        order = rng.randint(2, 14)
        k = rng.randint(0, order)
        x = rng.randrange(0, 1 << order)
        y = rng.randrange(0, 1 << order)
        lhs = hilbert_d(x, y, order) >> (2 * k)
        rhs = (
            hilbert_d(x >> k, y >> k, order - k) if order > k else 0
        )
        assert lhs == rhs


def test_bbox_cover_exact_and_tighter_than_morton(spark):
    from osmgraft.geo.hilbert import bbox_hcells, bbox_hranges
    from osmgraft.geo.zorder import bbox_zranges
    from osmgraft.operators.spatial import hilbert_bbox_filter

    rng = random.Random(42)
    shift, order = 20, 12
    for _ in range(30):
        # random boxes inside the synthetic coord window
        x1 = rng.randint(100_000_000, 135_000_000)
        y1 = rng.randint(470_000_000, 505_000_000)
        box = (
            x1,
            y1,
            x1 + rng.randint(0, 5_000_000),
            y1 + rng.randint(0, 5_000_000),
        )
        k, cells = bbox_hcells(box, order, shift, 64)
        assert len(cells) <= 64
        # every bbox cell's fine hd lands in some coarse prefix
        cs = set(cells)
        for cu in range(
            (box[0] + 1_800_000_000) >> shift,
            ((box[2] + 1_800_000_000) >> shift) + 1,
        ):
            for cv in range(
                (box[1] + 900_000_000) >> shift,
                ((box[3] + 900_000_000) >> shift) + 1,
            ):
                assert (
                    hilbert_d(cu, cv, order) >> (2 * k)
                ) in cs

    # merged-range economy on the benchmark box
    box = (112_000_000, 481_000_000, 131_500_000, 502_000_000)
    hr = bbox_hranges(box, order=order, shift=shift, max_ranges=64)
    zr = bbox_zranges(box, shift=shift, max_ranges=64)
    assert len(hr) <= len(zr)

    # filter equals the plain bbox filter
    from osmgraft.suite import doc_points

    pts = doc_points(spark, "/root/testdata/sf0.001")
    got = {
        r.doc_id
        for r in hilbert_bbox_filter(pts, box).collect()
    }
    want = {
        r.doc_id
        for r in pts.filter(
            (F.col("lon_i") >= box[0])
            & (F.col("lon_i") <= box[2])
            & (F.col("lat_i") >= box[1])
            & (F.col("lat_i") <= box[3])
        ).collect()
    }
    assert got == want


def test_stored_hd_pushes_filters(spark, tmp_path):
    """Persisted hd-sorted table: the merged BETWEENs must reach
    the parquet scan as PushedFilters (row-group pruning), and the
    result stays exact."""
    from osmgraft.geo.hilbert import with_hilbert
    from osmgraft.operators.spatial import hilbert_bbox_filter
    from osmgraft.suite import doc_points

    pts = doc_points(spark, "/root/testdata/sf0.001")
    cells = pts.select(
        "doc_id",
        "lat_i",
        "lon_i",
        F.shiftright(F.col("lon_i") + 1_800_000_000, 20).alias("cu"),
        F.shiftright(F.col("lat_i") + 900_000_000, 20).alias("cv"),
    )
    path = str(tmp_path / "hsorted")
    with_hilbert(cells, "cu", "cv", order=12).orderBy(
        "hd"
    ).write.parquet(path)
    stored = spark.read.parquet(path)
    box = (112_000_000, 481_000_000, 131_500_000, 502_000_000)
    got = hilbert_bbox_filter(stored, box, hd_col="hd")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "hd" in pushed and "GreaterThanOrEqual" in pushed
    want = {
        r.doc_id
        for r in stored.filter(
            (F.col("lon_i") >= box[0])
            & (F.col("lon_i") <= box[2])
            & (F.col("lat_i") >= box[1])
            & (F.col("lat_i") <= box[3])
        ).collect()
    }
    assert {r.doc_id for r in got.collect()} == want
