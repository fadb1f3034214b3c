"""collapse_bursts and length_drift: Python replays on crafted
inputs — burst boundaries at exactly the window edge, singleton
events, and drift terms against fractions arithmetic."""

from __future__ import annotations

from datetime import datetime, timedelta
from fractions import Fraction

from osmgraft.operators.events import collapse_bursts
from osmgraft.operators.text import length_drift

T0 = datetime(2024, 1, 1)


def t(s):
    return T0 + timedelta(seconds=s)


def test_collapse_bursts_boundaries(spark):
    W = 60
    rows = [
        # user 1 click: retries at +59s (inside) and +60s (boundary:
        # gap == window is NOT a new burst; > window is)
        (1, t(0), 1, "click"),
        (2, t(59), 1, "click"),
        (3, t(119), 1, "click"),
        (4, t(180), 1, "click"),  # 61s after previous -> new burst
        # user 1 view: independent key
        (5, t(0), 1, "view"),
        # user 2: single event
        (6, t(500), 2, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.user_id, r.event_type, r.burst): (
            r.first_us,
            r.last_us,
            r.n_raw,
        )
        for r in collapse_bursts(df, window_s=W).collect()
    }
    us = lambda s: int(t(s).timestamp()) * 1_000_000
    assert got[(1, "click", 1)] == (us(0), us(119), 3)
    assert got[(1, "click", 2)] == (us(180), us(180), 1)
    assert got[(1, "view", 1)] == (us(0), us(0), 1)
    assert got[(2, "click", 1)] == (us(500), us(500), 1)


def test_length_drift_exact(spark):
    old = spark.createDataFrame(
        [(i, "x" * n) for i, n in enumerate([50, 150, 150, 250])],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, "y" * n) for i, n in enumerate([50, 50, 250])],
        "doc_id long, text string",
    )
    rows = {
        r.bucket: (r.n1, r.n2, r.tvd_num, r.tvd_den)
        for r in length_drift(old, new).collect()
    }
    # buckets: old {0:1, 1:2, 2:1} (N1=4); new {0:2, 2:1} (N2=3)
    assert rows[0] == (1, 2, abs(1 * 3 - 2 * 4), 24)
    assert rows[1] == (2, 0, 6, 24)
    assert rows[2] == (1, 1, 1, 24)
    tvd = sum(Fraction(v[2], v[3]) for v in rows.values())
    # exact TVD between {1/4,2/4,1/4} and {2/3,0,1/3}:
    # (5/12 + 6/12 + 1/12) / 2 = 1/2
    assert tvd == Fraction(1, 2)
