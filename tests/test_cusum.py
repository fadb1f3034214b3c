"""cusum_mean_shift: the windowed prefix identity must equal the
literal sequential CUSUM recurrence on randomized integer series,
including alarm flags and multi-key frames."""

from __future__ import annotations

import random

from osmgraft.operators.events import cusum_mean_shift


def _recurrence(xs, allowance, threshold):
    d = len(xs)
    total = sum(xs)
    s = 0
    out = []
    for x in xs:
        z = x * d - total - allowance * d
        s = max(0, s + z)
        out.append((s, s > threshold * d))
    return out


def test_cusum_matches_recurrence(spark):
    rng = random.Random(11)
    rows = []
    expected = {}
    for key in ["a", "b", "spiky", "flat"]:
        n = rng.randrange(5, 40)
        if key == "spiky":
            xs = [2] * n + [30] * 6  # planted upward shift
        elif key == "flat":
            xs = [7] * n
        else:
            xs = [rng.randrange(0, 20) for _ in range(n)]
        for t, (s, alarm) in enumerate(_recurrence(xs, 1, 5)):
            expected[(key, t)] = (xs[t], s, len(xs), alarm)
        rows += [(key, t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "event_type string, day long, n_events long"
    )
    got = {
        (r.event_type, r.day): (
            r.n_events,
            r.cusum_scaled,
            r.scale,
            r.is_alarm,
        )
        for r in cusum_mean_shift(df).collect()
    }
    assert got == expected
    assert any(v[3] for v in got.values())  # the planted shift fires
