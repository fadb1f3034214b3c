"""seasonal_anomaly / mirror_hosts / pmi_pairs: Python replays on
crafted inputs — aligned-axis anomalies invisible to a global
median, boilerplate-capped mirror overlap, exact lift rationals."""

from __future__ import annotations

from datetime import datetime, timedelta
from fractions import Fraction

from osmgraft.operators.events import seasonal_anomaly
from osmgraft.operators.search import pmi_pairs
from osmgraft.operators.urls import mirror_hosts


def test_seasonal_anomaly_aligned_axis(spark):
    # Monday 9am (how for Monday = day-of-week 1 under Sunday=0):
    # 2024-01-01 is a Monday. 6 quiet Mondays of 2 events, one loud
    # Monday of 9. A global hourly median would also include the
    # busy Friday cells (30 each) and never flag 9.
    rows = []
    eid = 0
    base = datetime(2024, 1, 1, 9)  # Monday 9am
    for wk in range(7):
        n = 9 if wk == 3 else 2
        for i in range(n):
            eid += 1
            rows.append((eid, base + timedelta(weeks=wk), 1, "click"))
    fri = datetime(2024, 1, 5, 9)  # Friday 9am
    for wk in range(7):
        for i in range(30):
            eid += 1
            rows.append((eid, fri + timedelta(weeks=wk), 1, "click"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = seasonal_anomaly(df, k_mad=3).collect()
    assert len(out) == 1
    r = out[0]
    # Monday = dow 1 (Sunday 0), 9am -> how = 1*24+9 = 33
    assert (r.event_type, r.how, r.cnt, r.med, r.mad) == (
        "click", 33, 9, 2, 0,
    )


def test_mirror_hosts_cap_and_counts(spark):
    rows = [
        # a/b share f1,f2 (mirrors); c has f1 only; boilerplate fb
        # on ALL hosts is capped out (max_hosts_per_fp=2)
        ("a", "f1"), ("a", "f2"), ("a", "fb"), ("a", "fa"),
        ("b", "f1"), ("b", "f2"), ("b", "fb"),
        ("c", "f1"), ("c", "fb"),
    ]
    df = spark.createDataFrame(rows, "host string, fp string")
    got = {
        (r.h1, r.h2): (r.shared, r.n1, r.n2)
        for r in mirror_hosts(
            df, max_hosts_per_fp=2, min_shared=1
        ).collect()
    }
    # f1 is on 3 hosts -> capped; fb on 3 hosts -> capped; only f2
    # (2 hosts) survives the gate
    assert got == {("a", "b"): (1, 4, 3)}


def test_pmi_pairs_exact_lift(spark):
    docs = [
        (1, "x y z"),
        (2, "x y"),
        (3, "x q"),
        (4, "y q"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.t1, r.t2): (r.co, r.n1, r.n2, r.lift_num, r.lift_den)
        for r in pmi_pairs(df, vocab_k=10, min_co=2).collect()
    }
    # x in 3 docs, y in 3, q in 2, z in 1; only (x,y) co-occurs >= 2
    assert out == {("x", "y"): (2, 3, 3, 8, 9)}
    co, n1, n2, num, den = out[("x", "y")]
    assert Fraction(num, den) == Fraction(2 * 4, 3 * 3)
