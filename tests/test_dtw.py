"""trace_dtw_pairs: agreement with a direct numpy DP on the same
candidate pairs, the DTW >= Frechet >= Hausdorff dominance chain on
equal-length traces, and variable-length terminal handling."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F  # noqa: F401

from osmgraft.operators.linecover import (
    trace_dtw_pairs,
    trace_frechet_pairs,
)
from tests.test_frechet import _traces_df


def _dtw_dp(a: np.ndarray, b: np.ndarray) -> int:
    """Textbook O(n*m) DTW DP on squared distances, int64."""
    n, m = len(a), len(b)
    d2 = (
        (a[:, None, 0] - b[None, :, 0]) ** 2
        + (a[:, None, 1] - b[None, :, 1]) ** 2
    )
    f = np.full((n, m), -1, dtype=np.int64)
    f[0, 0] = d2[0, 0]
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                continue
            preds = []
            if i > 0 and f[i - 1, j] >= 0:
                preds.append(f[i - 1, j])
            if j > 0 and f[i, j - 1] >= 0:
                preds.append(f[i, j - 1])
            if i > 0 and j > 0 and f[i - 1, j - 1] >= 0:
                preds.append(f[i - 1, j - 1])
            f[i, j] = d2[i, j] + min(preds)
    return int(f[n - 1, m - 1])


def test_dtw_matches_dp(spark):
    rng = np.random.default_rng(7)
    traces = {}
    for t in range(8):
        steps = rng.integers(-200_000, 200_000, (5, 2))
        traces[t] = [(int(y), int(x)) for y, x in steps]
    df = _traces_df(spark, traces)
    out = trace_dtw_pairs(df, shift=22).collect()
    assert out, "co-located traces must produce candidate pairs"
    for r in out:
        a = np.array(traces[r.trace_a], dtype=np.int64)
        b = np.array(traces[r.trace_b], dtype=np.int64)
        assert r.dtw2 == _dtw_dp(a, b), (r.trace_a, r.trace_b)


def test_dtw_dominates_frechet(spark):
    # on equal-length traces every warp path visits >= n cells, so
    # DTW (sum) >= Frechet (max) on the same pair
    rng = np.random.default_rng(11)
    traces = {
        t: [
            (int(y), int(x))
            for y, x in rng.integers(-300_000, 300_000, (5, 2))
        ]
        for t in range(10)
    }
    df = _traces_df(spark, traces)
    fr = {
        (r.trace_a, r.trace_b): r.frechet2
        for r in trace_frechet_pairs(df, shift=22).collect()
    }
    dt = {
        (r.trace_a, r.trace_b): r.dtw2
        for r in trace_dtw_pairs(df, shift=22).collect()
    }
    assert set(fr) == set(dt)  # same candidate generator
    for k in dt:
        assert dt[k] >= fr[k]


def test_dtw_identical_traces_zero(spark):
    pts = [(0, i * 100_000) for i in range(5)]
    df = _traces_df(spark, {1: pts, 2: pts})
    out = trace_dtw_pairs(df, shift=22).collect()
    assert len(out) == 1 and out[0].dtw2 == 0


def test_dtw_variable_length(spark):
    rng = np.random.default_rng(17)
    traces = {
        t: [
            (int(y), int(x))
            for y, x in rng.integers(-200_000, 200_000, (n, 2))
        ]
        for t, n in ((0, 3), (1, 5), (2, 7), (3, 4))
    }
    df = _traces_df(spark, traces)
    out = trace_dtw_pairs(df, shift=22).collect()
    got = {(r.trace_a, r.trace_b): r.dtw2 for r in out}
    assert len(got) == 6
    for (ta, tb), v in got.items():
        a = np.array(traces[ta], dtype=np.int64)
        b = np.array(traces[tb], dtype=np.int64)
        assert v == _dtw_dp(a, b), (ta, tb)
