"""Product quantization (operators/pq.py): encode argmin
correctness vs a numpy replay, seed self-coding, wide-codes
round-trip, and ADC top-k equivalence with the brute-force
LUT-sum ranking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.pq import (
    pq_adc_topk,
    pq_codebook,
    pq_codes_wide,
    pq_encode,
)

DIM, M, K = 16, 4, 4
SUB = DIM // M
N = 24


def _vectors() -> np.ndarray:
    rng = np.random.RandomState(89)
    return rng.uniform(-1.0, 1.0, size=(N, DIM)).astype("float64")


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
    cb = q[:K]  # entry e, subspace s = cb[e, s*SUB:(s+1)*SUB]
    codes = np.zeros((N, M), dtype="int64")
    for i in range(N):
        for s in range(M):
            sv = q[i, s * SUB : (s + 1) * SUB]
            d2 = [
                int(((sv - cb[e, s * SUB : (s + 1) * SUB]) ** 2).sum())
                for e in range(K)
            ]
            codes[i, s] = int(np.argmin(d2))  # first min = lowest e
    return codes


def test_encode_matches_numpy(spark, emb):
    want = _np_codes(_vectors())
    got = {
        (r["vec_id"], r["s"]): r["code"]
        for r in pq_encode(emb, m=M, k=K, dim=DIM).collect()
    }
    assert len(got) == N * M
    for i in range(N):
        for s in range(M):
            assert got[(i, s)] == want[i, s], (i, s)


def test_seed_vectors_code_to_themselves(spark, emb):
    rows = (
        pq_encode(emb, m=M, k=K, dim=DIM)
        .filter(F.col("vec_id") < K)
        .collect()
    )
    for r in rows:
        assert r["code"] == r["vec_id"]


def test_codes_wide_roundtrip(spark, emb):
    codes = pq_encode(emb, m=M, k=K, dim=DIM)
    wide = {
        r["vec_id"]: r["codes"]
        for r in pq_codes_wide(codes, m=M).collect()
    }
    narrow = {
        (r["vec_id"], r["s"]): r["code"] for r in codes.collect()
    }
    for i in range(N):
        assert wide[i] == [narrow[(i, s)] for s in range(M)]


def test_codebook_shape(spark, emb):
    rows = pq_codebook(emb, m=M, k=K, dim=DIM).collect()
    assert len(rows) == M * K
    for r in rows:
        assert len(r["cv"]) == SUB


def test_adc_topk_matches_numpy(spark, emb):
    v = _vectors()
    q = _np_quant(v)
    cb = q[:K]
    codes = _np_codes(v)
    topk = 3
    want = {}
    for qi in range(0, N, 8):  # query_filter: vec_id % 8 == 0
        scores = []
        for j in range(N):
            if j == qi:
                continue
            ad = 0
            for s in range(M):
                e = codes[j, s]
                ad += int(
                    (
                        (
                            q[qi, s * SUB : (s + 1) * SUB]
                            - cb[e, s * SUB : (s + 1) * SUB]
                        )
                        ** 2
                    ).sum()
                )
            scores.append((ad, j))
        scores.sort()
        want[qi] = [
            (j, ad, r + 1)
            for r, (ad, j) in enumerate(scores[:topk])
        ]
    got = pq_adc_topk(
        emb, F.col("vec_id") % 8 == 0, m=M, k=K, dim=DIM, topk=topk
    ).collect()
    assert len(got) == len(want) * topk
    for r in got:
        assert (r["vec_id"], r["adist2"], r["rk"]) in [
            (j, ad, rk) for j, ad, rk in want[r["qid"]]
        ], r


def test_ivf_pq_full_probe_equals_brute_adc(spark, emb):
    """With n_probe = kc (probe every list) IVF-PQ must return
    exactly the brute-force ADC ranking — routing is a filter,
    never a different scorer."""
    from osmgraft.operators.pq import ivf_pq_topk

    kc = 4
    brute = {
        (r["qid"], r["vec_id"], r["adist2"], r["rk"])
        for r in pq_adc_topk(
            emb, F.col("vec_id") % 8 == 0, m=M, k=K, dim=DIM,
            topk=3,
        ).collect()
    }
    routed = {
        (r["qid"], r["vec_id"], r["adist2"], r["rk"])
        for r in ivf_pq_topk(
            emb, F.col("vec_id") % 8 == 0, kc=kc, m=M, k=K,
            dim=DIM, n_probe=kc, topk=3,
        ).collect()
    }
    assert routed == brute


def test_ivf_pq_subset_of_probed_lists(spark, emb):
    """Every returned neighbor must belong to one of its query's
    probed clusters, and scores must match the brute ADC score."""
    from osmgraft.operators.pq import ivf_pq_topk

    rows = ivf_pq_topk(
        emb, F.col("vec_id") % 8 == 0, kc=4, m=M, k=K, dim=DIM,
        n_probe=2, topk=3,
    ).collect()
    assert len(rows) > 0
    brute = {
        (r["qid"], r["vec_id"]): r["adist2"]
        for r in pq_adc_topk(
            emb, F.col("vec_id") % 8 == 0, m=M, k=K, dim=DIM,
            topk=N,
        ).collect()
    }
    for r in rows:
        assert r["adist2"] == brute[(r["qid"], r["vec_id"])]
        assert r["rk"] >= 1 and r["qid"] != r["vec_id"]


def test_ivf_pq_recall_monotone_in_n_probe(spark, emb):
    """The n_probe knob must be monotone: candidates found at
    n_probe=p are a subset of those at p+1, so recall vs brute
    ADC can only improve. (The 100-TB recall/cost dial.)"""
    from osmgraft.operators.pq import ivf_pq_topk

    brute = {
        (r["qid"], r["vec_id"])
        for r in pq_adc_topk(
            emb, F.col("vec_id") % 8 == 0, m=M, k=K, dim=DIM,
            topk=3,
        ).collect()
    }
    recalls = []
    for p in (1, 2, 4):
        routed = {
            (r["qid"], r["vec_id"])
            for r in ivf_pq_topk(
                emb, F.col("vec_id") % 8 == 0, kc=4, m=M, k=K,
                dim=DIM, n_probe=p, topk=3,
            ).collect()
        }
        recalls.append(len(routed & brute) / len(brute))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0  # n_probe = kc probes everything


def _np_trained_cb(v: np.ndarray, k: int, n_iter: int = 1):
    """numpy joint-Lloyd replay: per-subspace codebooks, first-k
    seeds, exact integer sums and trunc-div means."""
    q = _np_quant(v)
    cb = {
        (s, e): q[e, s * SUB : (s + 1) * SUB].copy()
        for s in range(M)
        for e in range(k)
    }
    for _ in range(n_iter):
        groups: dict = {}
        for i in range(N):
            for s in range(M):
                sv = q[i, s * SUB : (s + 1) * SUB]
                best = min(
                    (int(((sv - cv) ** 2).sum()), e)
                    for (s2, e), cv in cb.items()
                    if s2 == s
                )[1]
                groups.setdefault((s, best), []).append(sv)
        cb = {}
        for key, svs in groups.items():
            tot = np.sum(np.stack(svs), axis=0, dtype="int64")
            n = len(svs)
            # truncating division toward zero (Spark div, DuckDB //)
            cb[key] = np.array(
                [int(t) // n if t >= 0 else -((-int(t)) // n)
                 for t in tot],
                dtype="int64",
            )
    return cb


def test_trained_codebook_matches_numpy(spark, emb):
    from osmgraft.operators.pq import pq_trained_codebook

    want = _np_trained_cb(_vectors(), k=K, n_iter=1)
    got = {
        (r["s"], r["e"]): list(r["cv"])
        for r in pq_trained_codebook(
            emb, m=M, k=K, dim=DIM, n_iter=1
        ).collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert got[key] == [int(x) for x in want[key]], key


def test_trained_encode_composes(spark, emb):
    """pq_encode(codebook=trained) codes every (vec, s) to the
    integer-argmin entry of the trained codebook."""
    from osmgraft.operators.pq import (
        pq_encode,
        pq_trained_codebook,
    )

    cb = pq_trained_codebook(emb, m=M, k=K, dim=DIM, n_iter=1)
    codes = {
        (r["vec_id"], r["s"]): r["code"]
        for r in pq_encode(
            emb, m=M, k=K, dim=DIM, codebook=cb
        ).collect()
    }
    want_cb = _np_trained_cb(_vectors(), k=K, n_iter=1)
    q = _np_quant(_vectors())
    for i in range(N):
        for s in range(M):
            sv = q[i, s * SUB : (s + 1) * SUB]
            best = min(
                (int(((sv - cv) ** 2).sum()), e)
                for (s2, e), cv in want_cb.items()
                if s2 == s
            )[1]
            assert codes[(i, s)] == best, (i, s)


def test_residual_ivf_pq_matches_numpy(spark, emb):
    """Full numpy replay of the IVFADC chain: coarse assign,
    residual encode against residual-seeded codebooks,
    per-(query, probed list) LUT, ADC sum, top-k."""
    from osmgraft.operators.pq import residual_ivf_pq_topk

    kc, kr, n_probe, topk = 4, 4, 2, 3
    v = _vectors()
    q = _np_quant(v)
    cents = q[:kc]
    # coarse assignment: argmin dist2, ties -> lowest cid
    def d2(a, b):
        return int(((a - b) ** 2).sum())

    assign = [
        min((d2(q[i], cents[c]), c) for c in range(kc))[1]
        for i in range(N)
    ]
    resid = np.stack(
        [q[i] - cents[assign[i]] for i in range(N)]
    )
    rcb = resid[:kr]
    codes = np.zeros((N, M), dtype="int64")
    for i in range(N):
        for s in range(M):
            sv = resid[i, s * SUB : (s + 1) * SUB]
            codes[i, s] = min(
                (d2(sv, rcb[e2, s * SUB : (s + 1) * SUB]), e2)
                for e2 in range(kr)
            )[1]
    want = set()
    for qi in range(0, N, 8):
        probed = sorted(
            (d2(q[qi], cents[c]), c) for c in range(kc)
        )[:n_probe]
        scores = []
        for _, c in probed:
            qr = q[qi] - cents[c]
            for j in range(N):
                if j == qi or assign[j] != c:
                    continue
                ad = sum(
                    d2(
                        qr[s * SUB : (s + 1) * SUB],
                        rcb[
                            codes[j, s],
                            s * SUB : (s + 1) * SUB,
                        ],
                    )
                    for s in range(M)
                )
                scores.append((ad, j, c))
        scores.sort()
        for r, (ad, j, c) in enumerate(scores[:topk]):
            want.add((qi, j, c, ad, r + 1))
    got = {
        (r["qid"], r["vec_id"], r["cluster"], r["adist2"], r["rk"])
        for r in residual_ivf_pq_topk(
            emb, F.col("vec_id") % 8 == 0, kc=kc, m=M, k=kr,
            dim=DIM, n_probe=n_probe, topk=topk,
        ).collect()
    }
    assert got == want


def test_residual_of_centroid_is_zero(spark, emb):
    """A centroid-seed vector's residual is the zero vector, so
    its code in every subspace is the entry whose residual is
    nearest zero — and for vec 0 (centroid AND codebook seed 0),
    adist2 to same-coded list members is driven purely by the
    codebook, reproducibly."""
    from osmgraft.operators.pq import residual_ivf_pq_topk

    rows = residual_ivf_pq_topk(
        emb, F.col("vec_id") == 0, kc=4, m=M, k=4, dim=DIM,
        n_probe=1, topk=2,
    ).collect()
    for r in rows:
        assert r["qid"] == 0 and r["vec_id"] != 0
        assert r["adist2"] >= 0
