"""robust_spikes: lower-median/MAD flags must match a Python
replay, and a planted outlier must be flagged where the mean-based
detector's threshold would be dragged upward."""

from __future__ import annotations

import random

from osmgraft.operators.events import robust_spikes


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def _replay(series, k=3):
    out = {}
    for key, pts in series.items():
        med = _lower_median([x for _, x in pts])
        mad = _lower_median([abs(x - med) for _, x in pts])
        for t, x in pts:
            out[(key, t)] = (x, med, mad, x - med > k * mad)
    return out


def test_robust_spikes_replay(spark):
    rng = random.Random(4)
    series = {
        "steady": [(t, 10 + rng.randrange(0, 3)) for t in range(30)]
        + [(30, 500)],  # one wild hour
        "noisy": [(t, rng.randrange(0, 50)) for t in range(25)],
    }
    rows = [
        (k, t, x) for k, pts in series.items() for t, x in pts
    ]
    df = spark.createDataFrame(rows, "event_type string, hr long, cnt long")
    got = {
        (r.event_type, r.hr): (r.cnt, r.med, r.mad, r.is_spike)
        for r in robust_spikes(df).collect()
    }
    assert got == _replay(series)
    assert got[("steady", 30)][3]  # the planted outlier is flagged
    # robustness: the outlier did not drag the baseline — the
    # median stayed in the quiet band
    assert got[("steady", 30)][1] <= 12
