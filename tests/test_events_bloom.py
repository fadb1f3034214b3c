"""Sessionization (operators/events.py) and Bloom-filter
membership (operators/bloom.py) unit tests."""

import pyspark.sql.functions as F
import pytest

from osmgraft.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_seen_report,
)
from osmgraft.operators.events import sessionize, session_stats


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (eid, ts, uid, et, 0.0, "")
            for eid, ts, uid, et in rows
        ],
        "event_id long, ts string, user_id long,"
        " event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_sessionize_splits_on_gap(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 7, "a"),
            (2, "2024-01-01 10:10:00", 7, "b"),
            # 31 min gap -> new session
            (3, "2024-01-01 10:41:01", 7, "a"),
            # exactly 30 min gap -> SAME session (strict >)
            (4, "2024-01-01 11:11:01", 7, "a"),
        ],
    )
    out = sessionize(ev, gap_s=1800).orderBy("session_idx")
    rows = out.collect()
    assert [
        (r.session_idx, r.n_events, r.n_types) for r in rows
    ] == [(1, 2, 2), (2, 2, 1)]
    assert rows[0].end_epoch - rows[0].start_epoch == 600


def test_sessionize_per_user_independent(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1, "a"),
            (2, "2024-01-01 12:00:00", 1, "a"),
            (3, "2024-01-01 10:00:00", 2, "a"),
        ],
    )
    stats = {
        r.user_id: r.n_sessions
        for r in session_stats(ev, gap_s=1800).collect()
    }
    assert stats == {1: 2, 2: 1}


def test_sessionize_single_user_keyed_shuffle(spark, sf_dir=None):
    ev = _events(spark, [(1, "2024-01-01 10:00:00", 1, "a")])
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    # window + same-key groupBy reuse one hash partitioning on
    # user_id; no global-sort Exchange SinglePartition
    assert "SinglePartition" not in plan


@pytest.fixture()
def keys(spark):
    return spark.range(200).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )


def test_bloom_no_false_negatives(spark, keys):
    bloom = bloom_build(keys, n_words=32, k=4)
    probed = bloom_probe(keys, bloom, n_words=32, k=4)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_rejects_most_unseen(spark, keys):
    bloom = bloom_build(keys, n_words=1024, k=4)
    unseen = spark.range(1000, 1400).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )
    probed = bloom_probe(unseen, bloom, n_words=1024, k=4)
    fp = probed.filter(F.col("maybe_seen")).count()
    # 200 keys in 32768 bits, k=4 -> FP rate well under 1%
    assert fp <= 4


def test_bloom_word_count_bounded(spark, keys):
    bloom = bloom_build(keys, n_words=32, k=4)
    assert bloom.count() <= 32
    mx = bloom.agg(F.max("bits")).first()[0]
    assert mx < (1 << 32)  # only low 32 bits used per word


def test_bloom_report_truth_consistent(spark, keys):
    # incoming = half seen keys + fresh keys
    seen_half = keys.limit(100)
    fresh = spark.range(5000, 5100).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )
    rep = bloom_seen_report(
        keys, seen_half.union(fresh), n_words=1024, k=4
    )
    # every truly-seen key must be flagged maybe_seen
    assert (
        rep.filter(F.col("seen") & ~F.col("maybe_seen")).count()
        == 0
    )
    assert rep.filter(F.col("seen")).count() == 100


def test_bloom_probe_broadcasts_filter(spark, keys):
    bloom = bloom_build(keys, n_words=32, k=4)
    plan = (
        bloom_probe(keys, bloom, n_words=32, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_retention_cohorts_matrix(spark):
    """Crafted events: known weekly cohort matrix incl. a gap week
    and a returning user."""
    import datetime as dt

    from osmgraft.operators.events import retention_cohorts

    def t(day):
        return dt.datetime(1970, 1, 1) + dt.timedelta(days=day)

    rows = [
        # user 1: first week 0, active weeks 0,1,3
        (1, t(0)), (1, t(1)), (1, t(8)), (1, t(22)),
        # user 2: first week 0, only week 0
        (2, t(3)),
        # user 3: first week 1, active weeks 1,2
        (3, t(7)), (3, t(14)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp"
    )
    got = {
        (r.cohort, r.offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        (0, 0): 2,
        (0, 1): 1,
        (0, 3): 1,
        (1, 0): 1,
        (1, 1): 1,
    }


def test_event_spikes_crafted(spark):
    """Crafted hours: exactly the >=2x-mean hours flag."""
    import datetime as dt

    from osmgraft.operators.events import event_spikes

    def t(hour, i):
        return dt.datetime(1970, 1, 2) + dt.timedelta(
            hours=hour, minutes=i % 60
        )

    rows = []
    # type A: hours 0..3 have counts 1,1,1,5 (total 8, 4 hours,
    # mean 2 -> only the 5-count hour flags: 5*4 >= 2*8)
    for h, c in [(0, 1), (1, 1), (2, 1), (3, 5)]:
        rows += [("A", t(h, i)) for i in range(c)]
    # type B: uniform 2,2,2 -> nothing flags (2*3 < 2*6)
    for h in range(3):
        rows += [("B", t(h, i)) for i in range(2)]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp"
    )
    got = {
        (r.event_type, r.hr % 24, r.cnt)
        for r in event_spikes(ev).collect()
    }
    assert got == {("A", 3, 5)}
