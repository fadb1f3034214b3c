"""trend_slopes: exact normal-equation arithmetic on planted
rising / flat / single-day series."""

from __future__ import annotations

from datetime import datetime, timedelta
from fractions import Fraction

from osmgraft.operators.events import trend_slopes


def test_trend_slopes_exact(spark):
    t0 = datetime(2024, 3, 1)
    rows = []
    eid = 0
    # "up": counts 1,2,3 on days 0,1,2 -> slope exactly 1
    for d, c in ((0, 1), (1, 2), (2, 3)):
        for _ in range(c):
            eid += 1
            rows.append((eid, t0 + timedelta(days=d), "up"))
    # "flat": 2,2 on days 0,5 -> slope 0
    for d in (0, 5):
        for _ in range(2):
            eid += 1
            rows.append((eid, t0 + timedelta(days=d), "flat"))
    # "single": one day only -> 0/0 sentinel
    eid += 1
    rows.append((eid, t0, "single"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = {
        r.event_type: (r.n_days, r.sy, r.slope_num, r.slope_den)
        for r in trend_slopes(df).collect()
    }
    n, sy, num, den = got["up"]
    # t=0,1,2; y=1,2,3: st=3, sy=6, sty=8, stt=5
    assert (n, sy) == (3, 6)
    assert Fraction(num, den) == 1
    assert (num, den) == (3 * 8 - 3 * 6, 3 * 5 - 9)
    n, sy, num, den = got["flat"]
    assert Fraction(num, den) == 0 and den > 0
    assert got["single"] == (1, 1, 0, 0)
