"""idw_surface and spatial_outliers: hand-computed rational
estimates and a planted broken-sensor outlier."""

from __future__ import annotations

from fractions import Fraction

from osmgraft.operators.interp import idw_surface, spatial_outliers


def test_idw_exact_rational(spark):
    R = 100
    rows = [
        # a at origin v=10; b at (0,60) v=40; c at (80,0) v=100
        # d isolated far away
        (1, 10, 0, 0),
        (2, 40, 0, 60),
        (3, 100, 80, 0),
        (4, 7, 1_000_000, 1_000_000),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, value long, lat_i long, lon_i long"
    )
    got = {
        r.doc_id: (r.v, r.num, r.den, r.n_neighbors)
        for r in idw_surface(df, radius_fix=R).collect()
    }
    # a sees b (d2=3600, w=6400) and c (d2=6400, w=3600):
    # num = 6400*40 + 3600*100 = 616000 ; den = 10000
    assert got[1] == (10, 616000, 10000, 2)
    assert Fraction(got[1][1], got[1][2]) == Fraction(308, 5)
    # b sees only a (c is at d2 = 60^2+80^2 = 10000 = R^2 -> w=0
    # but still <= R^2 so it IS a neighbor with zero weight)
    assert got[2] == (40, 6400 * 10 + 0 * 100, 6400, 2)
    assert 4 not in got  # isolated -> absent
    

def test_spatial_outliers_broken_sensor(spark):
    R = 1000
    # cluster of 6 identical values + one wild value (identical, so
    # MAD = 0 and the zero-spread neighborhood flags ONLY true
    # deviants — an alternating 50/51 cluster would flag everything,
    # by design: any deviation from a zero-MAD neighborhood is loud)
    rows = [(i, 50, i * 10, 0) for i in range(1, 7)]
    rows.append((7, 500, 30, 5))
    df = spark.createDataFrame(
        rows, "doc_id long, value long, lat_i long, lon_i long"
    )
    out = spatial_outliers(
        df, radius_fix=R, k_mad=3, min_neighbors=3
    ).collect()
    assert [r.doc_id for r in out] == [7]
    r = out[0]
    # 7's neighborhood = six 50s: lower median 50, mad 0;
    # |500-50| > 0 flags
    assert (r.v, r.med, r.mad, r.n_neighbors) == (500, 50, 0, 6)
