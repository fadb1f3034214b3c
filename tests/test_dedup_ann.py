"""Unit tests for MinHash+LSH, SimHash, and embedding ANN."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.dedup import (
    embed_ann_lsh,
    embed_knn_exact,
    gram_array,
    minhash_lsh_pairs,
    simhash16_col,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far "
        "away into the green forest tonight"
    )
    rows = [
        (1, base),
        (2, "prefix " + base),  # near-dup of 1
        (3, "completely different words describing unrelated topics "
            "like databases query engines and caching layers"),
        (4, base.replace("green", "blue")),  # near-dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_dups(corpus):
    pairs = {
        (r.a, r.b): r.shared_bands
        for r in minhash_lsh_pairs(corpus).collect()
    }
    assert (1, 2) in pairs
    assert (1, 4) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_near_dups_collide(corpus):
    out = {
        r.doc_id: r.simhash
        for r in corpus.select(
            "doc_id",
            simhash16_col(gram_array(F.col("text"))).alias("simhash"),
        ).collect()
    }
    # 16-bit simhash of near-identical docs should be very close
    # (usually equal); unrelated doc should differ
    assert bin(out[1] ^ out[2]).count("1") <= 3
    assert bin(out[1] ^ out[3]).count("1") >= 4
    assert all(0 <= v < (1 << 16) for v in out.values())


def test_embed_knn_exact_self_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    out = embed_knn_exact(emb, F.col("vec_id") == 0, k=2).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2]
    assert out[0].cos_r <= 1.0


def test_embed_ann_lsh_pairs_in_same_bucket(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16)).astype("float32")
    vecs[1] = vecs[0] + rng.normal(scale=0.01, size=16).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    pairs = embed_ann_lsh(emb, n_planes=6, dim=16).collect()
    # the planted near-identical pair lands in the same bucket
    assert any(r.a == 0 and r.b == 1 for r in pairs)
    top = max(
        (r for r in pairs if r.a == 0 and r.b == 1),
        key=lambda r: r.cos_r,
    )
    assert top.cos_r > 0.99
