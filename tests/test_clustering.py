"""Distributed integer-exact k-means (operators/clustering.py)
unit tests: hand-computed Lloyd passes, tie-breaks, partitioning
invariance, and the broadcast plan shape."""

import pyspark.sql.functions as F
import pytest

from osmgraft.operators.clustering import (
    QUANT,
    kmeans_assign,
    kmeans_summary,
    quantize,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


@pytest.fixture()
def two_blobs(spark):
    # vec 0 and 1 seed the clusters; members sit near each blob
    return _emb(
        spark,
        [
            (0, [0.0, 0.0]),
            (1, [1.0, 1.0]),
            (2, [0.1, 0.0]),
            (3, [0.0, 0.1]),
            (4, [0.9, 1.0]),
            (5, [1.0, 0.9]),
        ],
    )


def test_quantize_fixed_point(spark):
    q = quantize(_emb(spark, [(1, [0.5, -0.25])])).collect()[0].q
    assert q == [500000, -250000]


def test_two_blobs_separate(spark, two_blobs):
    out = {
        r.vec_id: r.cluster
        for r in kmeans_assign(
            two_blobs, k=2, n_iter=2, dim=2
        ).collect()
    }
    assert out[0] == out[2] == out[3]
    assert out[1] == out[4] == out[5]
    assert out[0] != out[1]


def _py_kmeans(vectors, k, n_iter):
    """Pure-Python Lloyd twin: same float32 -> double -> floor
    quantization, same min-(dist2, cid) tie-break, same
    truncating-division centroid mean."""
    import math

    import numpy as np

    def trunc_div(a, b):
        return abs(a) // abs(b) * (1 if (a >= 0) == (b >= 0) else -1)

    q = {
        vid: [
            math.floor(float(np.float32(x)) * QUANT) for x in v
        ]
        for vid, v in vectors
    }
    cents = {vid: list(q[vid]) for vid, _ in vectors if vid < k}

    def assign():
        out = {}
        for vid, qv in q.items():
            best = min(
                (
                    sum((a - b) ** 2 for a, b in zip(qv, cv)),
                    cid,
                )
                for cid, cv in cents.items()
            )
            out[vid] = (best[1], best[0])
        return out

    for _ in range(n_iter):
        a = assign()
        new = {}
        for vid, (c, _) in a.items():
            new.setdefault(c, []).append(q[vid])
        cents = {
            c: [
                trunc_div(sum(col), len(vs))
                for col in zip(*vs)
            ]
            for c, vs in new.items()
        }
    return {vid: (c, d2) for vid, (c, d2) in assign().items()}


def test_differential_vs_python_lloyd(spark):
    import random

    random.seed(7)
    rows = [
        (
            i,
            [random.uniform(-1, 1), random.uniform(-1, 1)],
        )
        for i in range(40)
    ]
    got = {
        r.vec_id: (r.cluster, r.dist2)
        for r in kmeans_assign(
            _emb(spark, rows), k=3, n_iter=2, dim=2
        ).collect()
    }
    assert got == _py_kmeans(rows, k=3, n_iter=2)


def test_tie_breaks_to_lowest_centroid(spark):
    # v2 exactly between the two seeds -> cluster 0
    e = _emb(
        spark,
        [
            (0, [0.0, 0.0]),
            (1, [2e-6, 0.0]),
            (2, [1e-6, 0.0]),
        ],
    )
    out = {
        r.vec_id: r.cluster
        for r in kmeans_assign(e, k=2, n_iter=0, dim=2).collect()
    }
    assert out[2] == 0


def test_partitioning_invariance(spark, two_blobs):
    a = sorted(
        map(
            tuple,
            kmeans_assign(
                two_blobs, k=2, n_iter=2, dim=2
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            kmeans_assign(
                two_blobs.repartition(7), k=2, n_iter=2, dim=2
            ).collect(),
        )
    )
    assert a == b


def test_summary_consistent(spark, two_blobs):
    s = {
        r.cluster: (r.n_vecs, r.inertia)
        for r in kmeans_summary(
            two_blobs, k=2, n_iter=2, dim=2
        ).collect()
    }
    assert sum(n for n, _ in s.values()) == 6
    a = kmeans_assign(two_blobs, k=2, n_iter=2, dim=2)
    inertia = a.agg(F.sum("dist2")).first()[0]
    assert sum(i for _, i in s.values()) == inertia


def test_assignment_is_broadcast_nested_loop(spark, two_blobs):
    plan = (
        kmeans_assign(two_blobs, k=2, n_iter=1, dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
