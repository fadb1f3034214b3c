"""stay_points / colocation_pairs semantics on crafted traces,
plus the single-shuffle plan contract for the gaps-and-islands
stay detector."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.events import colocation_pairs, stay_points

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _trace(spark, rows):
    """rows: (user_id, event_id, minutes_offset, cell)"""
    return spark.createDataFrame(
        [
            (u, e, T0 + dt.timedelta(minutes=m), c)
            for u, e, m, c in rows
        ],
        "user_id long, event_id long, ts timestamp, cell long",
    )


def test_stay_points_maximal_runs(spark):
    # user 1: A A A (0,30,70min) then B (80) then A again (90,100)
    df = _trace(
        spark,
        [
            (1, 10, 0, 5),
            (1, 11, 30, 5),
            (1, 12, 70, 5),
            (1, 13, 80, 9),
            (1, 14, 90, 5),
            (1, 15, 100, 5),
        ],
    )
    out = stay_points(df, min_dwell_s=0, min_points=2).collect()
    got = sorted(
        (r.cell, r.enter_event_id, r.exit_event_id, r.n_points)
        for r in out
    )
    # two separate cell-5 stays; the lone cell-9 fix fails min_points
    assert got == [(5, 10, 12, 3), (5, 14, 15, 2)]
    d = {(r.enter_event_id): r.dwell_us for r in out}
    assert d[10] == 70 * 60 * 1_000_000
    assert d[14] == 10 * 60 * 1_000_000


def test_stay_points_thresholds(spark):
    df = _trace(
        spark,
        [
            (1, 1, 0, 5),
            (1, 2, 10, 5),   # 10-min run
            (2, 3, 0, 5),
            (2, 4, 120, 5),  # 2-hour run
        ],
    )
    out = stay_points(df, min_dwell_s=3600, min_points=2).collect()
    assert [(r.user_id, r.n_points) for r in out] == [(2, 2)]


def test_stay_points_single_shuffle(spark):
    df = _trace(spark, [(1, 1, 0, 5), (1, 2, 10, 5)])
    plan = (
        stay_points(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # window partitioning is reused by the run groupBy: 1 Exchange
    assert plan.count("Exchange") == 1


def test_colocation_pairs(spark):
    # users 1,2,3 share cell 7 in hour 0; user 4 is in cell 8;
    # users 1,2 meet again in cell 9 during hour 2
    df = _trace(
        spark,
        [
            (1, 1, 5, 7),
            (2, 2, 15, 7),
            (3, 3, 25, 7),
            (4, 4, 35, 8),
            (1, 5, 40, 7),   # duplicate presence, deduped
            (1, 6, 130, 9),
            (2, 7, 140, 9),
        ],
    )
    out = colocation_pairs(df, bucket_s=3600).collect()
    got = {
        (r.user_a, r.user_b): (r.n_encounters, r.n_cells)
        for r in out
    }
    assert got == {
        (1, 2): (2, 2),
        (1, 3): (1, 1),
        (2, 3): (1, 1),
    }


def test_colocation_bucket_boundary(spark):
    # same cell but adjacent hour buckets -> no pair
    df = _trace(spark, [(1, 1, 59, 7), (2, 2, 61, 7)])
    assert colocation_pairs(df, bucket_s=3600).count() == 0
    # wider bucket joins them
    assert colocation_pairs(df, bucket_s=7200).count() == 1
