"""skipgram_counts, decayed_counts, sorted_neighborhood_pairs:
hand-checked pair tables, exact half-life rationals, and bucket-
join completeness at the window boundary."""

from __future__ import annotations

from datetime import datetime, timedelta
from itertools import combinations

from osmgraft.operators.conflate import sorted_neighborhood_pairs
from osmgraft.operators.events import decayed_counts
from osmgraft.operators.search import skipgram_counts


def test_skipgram_directional_window(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")],
        "doc_id long, text string",
    )
    got = {
        (r.center, r.context): r.n
        for r in skipgram_counts(
            spark.createDataFrame(
                [(1, "a b a b c"), (2, "a b x")],
                "doc_id long, text string",
            ),
            window_k=2,
            min_count=1,
        ).collect()
    }
    # doc1 pairs (k=2): (a,b)x2, (a,a), (a,c), (b,a), (b,b), (b,c)
    # doc2: (a,b), (a,x), (b,x)
    assert got[("a", "b")] == 3
    assert got[("b", "a")] == 1
    assert got[("a", "a")] == 1
    assert got[("b", "c")] == 1
    assert got[("a", "x")] == 1
    assert ("c", "a") not in got  # direction preserved
    assert ("a", "z") not in got


def test_decayed_counts_exact(spark):
    t0 = datetime(2024, 6, 1)
    rows = (
        [(i, t0, "click") for i in range(3)]           # age 0
        + [(10, t0 - timedelta(days=7), "click")]      # age 7: 1 step
        + [(11, t0 - timedelta(days=55), "click")]     # age 55: 7 steps
        + [(12, t0 - timedelta(days=56), "click")]     # beyond horizon
        + [(13, t0 - timedelta(days=3), "view")]       # age 3: 0 steps
    )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = {
        r.event_type: (r.num, r.den, r.n_events)
        for r in decayed_counts(
            df, half_life_days=7, horizon_days=56
        ).collect()
    }
    # S = 8 steps, den = 256. click: 3*2^8 + 2^7 + 2^1 = 898
    assert got["click"] == (3 * 256 + 128 + 2, 256, 5)
    assert got["view"] == (256, 256, 1)


def test_sorted_neighborhood_complete_at_boundary(spark):
    rows = [(i, f"k{i:02d}", 0) for i in range(1, 11)]
    df = spark.createDataFrame(
        rows, "place_id long, name_key string, n_chars long"
    )
    w = 4
    got = {
        (r.a, r.b)
        for r in sorted_neighborhood_pairs(
            df, order_cols=["name_key", "n_chars", "place_id"],
            window=w,
        ).collect()
    }
    want = {
        (a, b)
        for a, b in combinations(range(1, 11), 2)
        if b - a < w
    }
    assert got == want
