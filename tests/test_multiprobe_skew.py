"""embed_ann_multiprobe and key_skew_report: probe-set recall
superset proof and exact log2 bucketing with argmax tie-break."""

from __future__ import annotations

from osmgraft.operators.dedup import (
    embed_ann_banded,
    embed_ann_multiprobe,
)
from osmgraft.operators.indexing import key_skew_report


def _vecs(spark, n=40, dim=8):
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(n):
        v = [rnd.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, v))
        if i % 5 == 0:
            # planted near-neighbor: tiny perturbation
            rows.append((1000 + i, [x + 0.01 for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_multiprobe_superset_and_recall(spark):
    df = _vecs(spark)
    exact = {
        (r.a, r.b)
        for r in embed_ann_banded(
            df, band_bits=4, n_bands=2, dim=8
        ).collect()
    }
    probe = {
        (r.a, r.b): r.min_hamming
        for r in embed_ann_multiprobe(
            df, band_bits=4, n_bands=2, dim=8
        ).collect()
    }
    # multi-probe candidates strictly include the exact-bucket set,
    # and exact-bucket pairs carry min_hamming 0
    assert exact <= set(probe)
    for p in exact:
        assert probe[p] == 0
    # every extra pair is exactly one hyperplane away
    for p, h in probe.items():
        assert h in (0, 1)
        if p not in exact:
            assert h == 1


def test_key_skew_buckets(spark):
    rows = (
        [("a",)] * 8      # bucket 3
        + [("b",)] * 9    # bucket 3, hotter
        + [("c",)] * 2    # bucket 1
        + [("d",)] * 1    # bucket 0
    )
    df = spark.createDataFrame(rows, "k string")
    got = {
        r.bucket: (r.n_keys, r.n_rows, r.max_count, r.hottest_key)
        for r in key_skew_report(df, key_cols=["k"]).collect()
    }
    assert got[3] == (2, 17, 9, "b")
    assert got[1] == (1, 2, 2, "c")
    assert got[0] == (1, 1, 1, "d")
