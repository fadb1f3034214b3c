"""Scalar quantization (operators/sq.py): code-range invariants,
degenerate-dimension handling, numpy replay of the encode, and
sq8_topk equivalence with a brute-force python replay of the
candidate + rescore chain."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.sq import sq8_bounds, sq8_encode, sq8_topk

DIM = 8
N = 30


def _vectors() -> np.ndarray:
    rng = np.random.RandomState(907)
    v = rng.uniform(-1.0, 1.0, size=(N, DIM)).astype("float64")
    v[:, 3] = 0.25  # degenerate dimension: constant -> span 0
    return v


@pytest.fixture(scope="module")
def emb(spark):
    v = _vectors()
    return spark.createDataFrame(
        [(i, [float(x) for x in v[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    )


def _np_quant(v: np.ndarray) -> np.ndarray:
    return np.floor(v * 1_000_000).astype("int64")


def _np_codes(v: np.ndarray) -> np.ndarray:
    q = _np_quant(v)
    mn, mx = q.min(axis=0), q.max(axis=0)
    span = mx - mn
    codes = np.zeros_like(q)
    ok = span > 0
    codes[:, ok] = (q[:, ok] - mn[ok]) * 255 // span[ok]
    return codes


def test_bounds(spark, emb):
    q = _np_quant(_vectors())
    got = {
        r["dim"]: (r["mn"], r["mx"]) for r in sq8_bounds(emb).collect()
    }
    assert got == {
        d + 1: (int(q[:, d].min()), int(q[:, d].max()))
        for d in range(DIM)
    }


def test_encode_matches_numpy(spark, emb):
    want = _np_codes(_vectors())
    rows = sq8_encode(emb).collect()
    assert len(rows) == N
    for r in rows:
        np.testing.assert_array_equal(
            np.array(r["codes"]), want[r["vec_id"]]
        )
        assert all(0 <= c <= 255 for c in r["codes"])
        # the degenerate dim codes to 0 everywhere
        assert r["codes"][3] == 0


def _np_topk(v: np.ndarray, qids, k=3, n_cand=5):
    codes = _np_codes(v)
    q = _np_quant(v)
    out = []
    for qi in qids:
        scores = sorted(
            (
                (-int(codes[j] @ codes[qi]), j)
                for j in range(N)
                if j != qi
            ),
        )[:n_cand]
        resc = []
        for s, j in scores:
            c = (
                int(q[j] @ q[qi])
                / math.sqrt(int(q[qi] @ q[qi]))
                / math.sqrt(int(q[j] @ q[j]))
            )
            resc.append((-c, j, -s))
        resc.sort()
        for rank, (negc, j, sc) in enumerate(resc[:k], start=1):
            out.append((qi, j, rank, sc, round(-negc, 6)))
    return sorted(out)


def test_topk_matches_python_replay(spark, emb):
    got = sorted(
        (
            r["query_id"],
            r["neighbor_id"],
            r["rank"],
            r["sq8_score"],
            r["cos_r"],
        )
        for r in sq8_topk(
            emb, F.col("vec_id") % 10 == 0, k=3, n_cand=5
        ).collect()
    )
    want = _np_topk(_vectors(), [0, 10, 20], k=3, n_cand=5)
    assert got == want


def test_candidate_depth_full_equals_exact_ranking(spark, emb):
    """with n_cand = N-1 the rescore IS the exact brute-force
    cosine top-k: recall is 100% by construction."""
    full = sq8_topk(
        emb, F.col("vec_id") == 7, k=3, n_cand=N - 1
    ).collect()
    v = _vectors()
    q = _np_quant(v)
    cos = [
        (
            -(
                int(q[j] @ q[7])
                / math.sqrt(int(q[7] @ q[7]))
                / math.sqrt(int(q[j] @ q[j]))
            ),
            j,
        )
        for j in range(N)
        if j != 7
    ]
    cos.sort()
    want = [j for _, j in cos[:3]]
    got = [
        r["neighbor_id"] for r in sorted(full, key=lambda r: r["rank"])
    ]
    assert got == want
