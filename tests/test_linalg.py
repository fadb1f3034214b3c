"""power_iteration_projection: bit-exact agreement with a literal
numpy integer replay of the fixed-point algorithm, and directional
agreement with the true dominant eigenvector on well-conditioned
random data."""

from __future__ import annotations

import numpy as np

from osmgraft.operators.linalg import (
    QUANT,
    S_SHIFT,
    V0,
    V_BITS,
    power_iteration_projection,
)


def _replay(x_float, iters):
    xq = np.floor(x_float.astype(np.float64) * QUANT).astype(
        np.int64
    )
    d = xq.shape[1]
    v = np.full(d, V0, dtype=np.int64)
    for _ in range(iters):
        s = xq @ v
        sp = s // S_SHIFT  # numpy // floors, like the pmod form
        y = xq.T @ sp
        mx = int(np.max(np.abs(y)))
        shift = max(0, mx.bit_length() - V_BITS)
        v = y // (1 << shift)
    return xq @ v


def _run(spark, x_float, iters):
    rows = [
        (i, [float(t) for t in row]) for i, row in enumerate(x_float)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    out = power_iteration_projection(df, iters=iters).collect()
    got = np.zeros(len(rows), dtype=np.int64)
    for r in out:
        got[r.vec_id] = r.proj
    return got


def test_power_iteration_matches_replay(spark):
    rng = np.random.default_rng(9)
    # anisotropic cloud: a dominant direction plus noise
    d, n = 16, 200
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    x = (
        np.outer(rng.normal(size=n) * 0.5, u)
        + rng.normal(size=(n, d)) * 0.05
    ).astype(np.float32)
    for iters in (1, 3):
        got = _run(spark, x, iters)
        want = _replay(x, iters)
        assert np.array_equal(got, want)
    # direction check: projections from the integer pipeline must
    # correlate almost perfectly with the exact float projections
    # onto the true top eigenvector
    xs = x.astype(np.float64)
    w, vecs = np.linalg.eigh(xs.T @ xs)
    true_proj = xs @ vecs[:, -1]
    corr = np.corrcoef(got, true_proj)[0, 1]
    assert abs(corr) > 0.99


def test_power_iteration_negative_heavy(spark):
    # all-negative data exercises every floor-division on negatives
    rng = np.random.default_rng(3)
    x = (-np.abs(rng.normal(size=(50, 8)))).astype(np.float32) * 0.4
    got = _run(spark, x, 2)
    assert np.array_equal(got, _replay(x, 2))
