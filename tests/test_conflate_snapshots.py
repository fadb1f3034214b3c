"""conflate_snapshots: matched/born/dead verdicts with exact
nearest-by-(dist2, id) tie-break and sentinel contract."""

from __future__ import annotations

from osmgraft.operators.conflate import conflate_snapshots


def test_snapshot_diff_verdicts(spark):
    R = 1_000_000
    old = spark.createDataFrame(
        [
            (2, "cafe", 0, 0),
            (4, "cafe", 0, 500_000),    # equally-good name, farther
            (6, "bar", 0, 0),           # claimed by nobody -> dead
            (8, "inn", 9_000_000, 0),   # out of range of new inn
        ],
        "place_id long, name_key string, lat_i long, lon_i long",
    )
    new = spark.createDataFrame(
        [
            (1, "cafe", 0, 100_000),   # nearest old = 2 (d2 1e10 vs 4: 4e11->4 is 400k away=1.6e11) -> 2
            (3, "cafe", 0, 400_000),   # nearest old = 4 (100k) over 2 (400k)
            (5, "pub", 0, 0),          # no old pub -> born
            (7, "inn", 0, 0),          # old inn 9e6 away > R -> born
        ],
        "place_id long, name_key string, lat_i long, lon_i long",
    )
    got = {
        r.place_id: (r.status, r.matched_id, r.dist2)
        for r in conflate_snapshots(old, new, radius_fix=R).collect()
    }
    assert got[1] == ("matched", 2, 100_000**2)
    assert got[3] == ("matched", 4, 100_000**2)
    assert got[5] == ("born", -1, -1)
    assert got[7] == ("born", -1, -1)
    assert got[6] == ("dead", -1, -1)
    assert got[8] == ("dead", -1, -1)
    # olds 2 and 4 were claimed -> not dead; all six rows accounted
    assert len(got) == 6
