"""OD flow matrix (events.od_matrix): outside-state mapping,
first-event exclusion, per-user ordering."""

from __future__ import annotations

import datetime as dt

from osmgraft.operators.events import od_matrix


def test_od_matrix_semantics(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, minute, region):
        return (eid, uid, t0 + dt.timedelta(minutes=minute), region)

    rows = [
        # user 1: A -> B -> None(OUT) -> A  (3 trips)
        ev(1, 1, 0, "A"),
        ev(2, 1, 1, "B"),
        ev(3, 1, 2, None),
        ev(4, 1, 3, "A"),
        # user 2: single event -> no trips
        ev(5, 2, 0, "B"),
        # user 3: out-of-order insert; ts order is A -> A
        ev(7, 3, 5, "A"),
        ev(6, 3, 1, "A"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, region string"
    )
    got = {
        (r["from_region"], r["to_region"]): r["n_trips"]
        for r in od_matrix(df).collect()
    }
    assert got == {
        ("A", "B"): 1,
        ("B", "OUT"): 1,
        ("OUT", "A"): 1,
        ("A", "A"): 1,
    }
