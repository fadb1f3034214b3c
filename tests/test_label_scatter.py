"""label_scatter: the centroid-free identity must equal the direct
numpy within-class scatter on the quantized codes, and tight
clusters must score below loose ones."""

from __future__ import annotations

import numpy as np

from osmgraft.operators.linalg import QUANT, label_scatter


def test_label_scatter_identity(spark):
    rng = np.random.default_rng(2)
    rows = []
    mats = {0: [], 1: []}
    for i in range(60):
        label = i % 2
        center = np.full(8, 0.3 if label else -0.2)
        spread = 0.02 if label else 0.3  # label 1 is tight
        v = (center + rng.normal(size=8) * spread).astype(np.float32)
        rows.append((i, [float(x) for x in v], label))
        mats[label].append(v)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r.label: (r.n_vectors, r.sum_sq, r.norm_sum_sq, r.scatter_scaled)
        for r in label_scatter(df).collect()
    }
    for label, vecs in mats.items():
        xq = np.floor(np.array(vecs, dtype=np.float64) * QUANT).astype(
            np.int64
        )
        n = len(xq)
        sum_sq = int((xq * xq).sum())
        norm_sum_sq = int((xq.sum(axis=0) ** 2).sum())
        scatter = n * sum_sq - norm_sum_sq
        assert got[label] == (n, sum_sq, norm_sum_sq, scatter)
        # identity: equals n * sum of squared deviations from mean
        mu = xq.mean(axis=0)
        direct = n * float(((xq - mu) ** 2).sum())
        assert abs(scatter - direct) < 1e-6 * max(1.0, direct)
    assert got[1][3] < got[0][3]  # tight cluster scores lower
