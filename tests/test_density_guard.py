"""Density guard for the fixed-radius similarity family: a single
hotspot cell (or (cell, bucket) group) holding half the corpus must
not blow up candidate-pair generation when the guard is on, the
exclusion must be reported explicitly, and pairs that never touch
the hotspot must be byte-identical to the unguarded run. Guard-off
and inert-cap runs must match the exact semantics (the oracle-twin
contract: suite caps are chosen above every oracle-SF occupancy, so
CORRECTNESS hashes are unchanged by construction)."""

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.events import (
    colocation_overflow,
    colocation_pairs,
)
from osmgraft.operators.linecover import (
    _trace_pair_matrix,
    trace_frechet_pairs,
    trace_hausdorff_pairs,
    trace_pair_overflow,
)

SHIFT = 22
SIDE = 1 << SHIFT


def _skewed_traces(spark, n_hot=20, n_cold=20):
    """n_hot 2-step traces packed inside ONE shift-22 cell (50% of
    the corpus) + n_cold traces spread one-per-cell far away, in
    cold pairs (2k, 2k+1) that land in the same cell so the guard
    must preserve their candidacy."""
    rows = []
    for t in range(n_hot):  # hotspot: all inside cell (0, 0)
        rows += [
            (t, 0, 1000 * t, 2000 * t),
            (t, 1, 1000 * t + 500, 2000 * t + 500),
        ]
    for t in range(n_cold):  # cold: pair (2k, 2k+1) shares a cell
        base_lat = (10 + 4 * (t // 2)) * SIDE
        base_lon = (10 + 4 * (t // 2)) * SIDE
        off = 1000 * (t % 2)
        rows += [
            (1000 + t, 0, base_lat + off, base_lon + off),
            (1000 + t, 1, base_lat + off + 300, base_lon + off + 300),
        ]
    return spark.createDataFrame(
        rows, "trace_id long, step long, lat_i long, lon_i long"
    )


def test_trace_guard_bounds_hotspot_and_reports(spark):
    tr = _skewed_traces(spark)
    cap = 8

    unguarded = _trace_pair_matrix(tr, SHIFT).select(
        "trace_a", "trace_b"
    ).distinct()
    guarded = _trace_pair_matrix(tr, SHIFT, max_cell_traces=cap).select(
        "trace_a", "trace_b"
    ).distinct()

    n_un = unguarded.count()
    n_g = guarded.count()
    # hotspot contributes 20*19/2 = 190 pairs unguarded; guarded
    # keeps only the 10 cold pairs -> bounded, not density^2
    assert n_un >= 190 + 10
    assert n_g == 10

    # every guarded pair is a cold pair, and every cold pair survives
    got = {
        (r["trace_a"], r["trace_b"]) for r in guarded.collect()
    }
    want = {(1000 + 2 * k, 1000 + 2 * k + 1) for k in range(10)}
    assert got == want

    # the exclusion is explicit: the hotspot's dilated cells are
    # named with their true occupancy (20 > cap)
    ov = trace_pair_overflow(tr, SHIFT, max_cell_traces=cap)
    rows = ov.collect()
    assert rows, "hot cells must be reported"
    assert all(r["n_traces"] == 20 for r in rows)
    # the 9 dilated cells around the single occupied hotspot cell
    assert len(rows) == 9


def test_trace_guard_inert_cap_is_exact(spark):
    tr = _skewed_traces(spark)
    h_off = trace_hausdorff_pairs(tr, SHIFT).orderBy(
        "trace_a", "trace_b"
    ).collect()
    h_cap = trace_hausdorff_pairs(
        tr, SHIFT, max_cell_traces=1_000_000
    ).orderBy("trace_a", "trace_b").collect()
    assert h_off == h_cap
    assert (
        trace_pair_overflow(tr, SHIFT, max_cell_traces=1_000_000).count()
        == 0
    )


def test_frechet_guard_completes_on_hotspot(spark):
    tr = _skewed_traces(spark)
    out = trace_frechet_pairs(
        tr, SHIFT, n_steps=2, max_cell_traces=8
    )
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["within"] for r in rows)


def _skewed_events(spark, n_hot=16, n_cold=16):
    """one (cell, bucket) group holds n_hot users (50%); the rest
    are isolated 2-user groups in distinct cells."""
    rows = []
    for u in range(n_hot):
        rows.append((u, "2024-01-01 10:00:00", 7))
    for u in range(n_cold):
        rows.append((1000 + u, "2024-01-01 10:00:00", 100 + u // 2))
    return spark.createDataFrame(
        rows, "user_id long, ts string, cell long"
    )


def test_colocation_guard_bounds_and_reports(spark):
    ev = _skewed_events(spark)
    cap = 8

    un = colocation_pairs(ev, bucket_s=3600).count()
    g = colocation_pairs(
        ev, bucket_s=3600, max_group_users=cap
    )
    rows = g.collect()
    assert un == 16 * 15 // 2 + 8
    assert len(rows) == 8  # only the cold 2-user groups pair up
    got = {(r["user_a"], r["user_b"]) for r in rows}
    want = {(1000 + 2 * k, 1000 + 2 * k + 1) for k in range(8)}
    assert got == want

    ov = colocation_overflow(ev, bucket_s=3600, max_group_users=cap)
    orows = ov.collect()
    assert len(orows) == 1
    assert orows[0]["cell"] == 7
    assert orows[0]["n_users"] == 16


def test_colocation_guard_inert_cap_is_exact(spark):
    ev = _skewed_events(spark)
    off = colocation_pairs(ev, bucket_s=3600).orderBy(
        "user_a", "user_b"
    ).collect()
    cap = colocation_pairs(
        ev, bucket_s=3600, max_group_users=1_000_000
    ).orderBy("user_a", "user_b").collect()
    assert off == cap
