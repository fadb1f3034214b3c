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
