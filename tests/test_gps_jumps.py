"""gps_jump_profile: jump classification on crafted tracks —
plausible moves, a teleport, a zero-dt displacement, and a
stationary duplicate fix."""

from __future__ import annotations

from osmgraft.operators.events import gps_jump_profile


def test_gps_jump_classification(spark):
    rows = [
        # user 1: steady 10 units/sec, then a teleport
        (1, 0, 0, 0),
        (1, 1_000_000, 10, 0),
        (1, 2_000_000, 20, 5),
        (1, 3_000_000, 1_000_000, 5),  # 1e6/s >> 100 -> jump
        # user 2: duplicate timestamp, displaced -> jump by definition
        (2, 0, 0, 0),
        (2, 0, 7, 0),
        # user 3: duplicate timestamp, NOT displaced -> not a jump
        (3, 5, 1, 1),
        (3, 5, 1, 1),
        # user 4: single fix -> no moves
        (4, 9, 2, 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, us long, x long, y long"
    )
    got = {
        r.user_id: (r.n_fixes, r.n_moves, r.n_jumps, r.max_speed)
        for r in gps_jump_profile(df, max_cheb_per_s=100).collect()
    }
    # user 1 speeds: 10, 10, ~999980/s -> one jump; max_speed is the
    # teleport's speed (cheb * 1e6 div dt)
    assert got[1][:3] == (4, 3, 1)
    assert got[1][3] == (1_000_000 - 20) * 1_000_000 // 1_000_000
    assert got[2] == (2, 1, 1, None)  # dt=0 move has no finite speed
    assert got[3] == (2, 1, 0, None)
    assert got[4] == (1, 0, 0, None)
