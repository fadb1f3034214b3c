"""sequence_funnel: next-step matching must equal a literal Python
replay (earliest in-window next event per step), including bucket
boundary cases where the match sits in the anchor's NEXT bucket."""

from __future__ import annotations

from datetime import datetime, timedelta

from osmgraft.operators.events import sequence_funnel

T0 = datetime(2024, 1, 1)
W = 100  # seconds per step window


def _replay(rows, steps, win_s):
    by_user = {}
    for eid, ts, user, typ in rows:
        by_user.setdefault(user, []).append((ts, typ))
    out = {}
    for user, evs in by_user.items():
        anchors = sorted(t for t, y in evs if y == steps[0])
        conv = 0
        for a in anchors:
            cur = a
            ok = True
            for step in steps[1:]:
                nxt = [
                    t
                    for t, y in evs
                    if y == step
                    and t > cur
                    and (t - cur).total_seconds() <= win_s
                ]
                if not nxt:
                    ok = False
                    break
                cur = min(nxt)
            conv += ok
        if anchors:
            out[user] = (len(anchors), conv)
    return out


def test_sequence_funnel_replay(spark):
    def t(s):
        return T0 + timedelta(seconds=s)

    rows = [
        # user 1: clean conversion
        (1, t(0), 1, "view"),
        (2, t(10), 1, "click"),
        (3, t(20), 1, "purchase"),
        # user 2: click arrives in the NEXT time bucket (s=150,
        # bucket 1 vs the view's bucket 0) but inside the window
        (4, t(60), 2, "view"),
        (5, t(150), 2, "click"),
        (6, t(200), 2, "purchase"),
        # user 3: click too late (outside window)
        (7, t(0), 3, "view"),
        (8, t(150), 3, "click"),
        # user 4: steps out of order — no conversion
        (9, t(50), 4, "purchase"),
        (10, t(60), 4, "click"),
        (11, t(70), 4, "view"),
        # user 5: two views share the earliest click; both convert
        (12, t(0), 5, "view"),
        (13, t(5), 5, "view"),
        (14, t(30), 5, "click"),
        (15, t(40), 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    steps = ["view", "click", "purchase"]
    got = {
        r.user_id: (r.n_anchors, r.n_converted)
        for r in sequence_funnel(df, steps, step_window_s=W).collect()
    }
    assert got == _replay(rows, steps, W)
    assert got[1] == (1, 1)
    assert got[2] == (1, 1)  # cross-bucket match found
    assert got[3] == (1, 0)
    assert got[4] == (1, 0)
    assert got[5] == (2, 2)
