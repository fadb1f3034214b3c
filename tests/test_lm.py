"""N-gram LM fluency scoring and hashed linear-classifier
inference (operators/lm.py) unit tests."""

import pyspark.sql.functions as F
import pytest

from osmgraft.operators.lm import (
    classify,
    hashed_weights,
    lm_bigram_model,
    lm_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


@pytest.fixture()
def corpus(spark):
    return _docs(
        spark,
        [
            # reference slice: "a b" x3, "b c" x1 as bigrams
            (1, "a b c", "en"),     # bigrams: a b, b c
            (2, "a b", "en"),       # a b
            (3, "x a b y", "en"),   # x a, a b, b y
            # non-reference docs to score
            (4, "a b c", "de"),     # all bigrams in-model
            (5, "q r s", "de"),     # all OOV
            (6, "solo", "de"),      # < 2 tokens
        ],
    )


def test_model_counts_and_bits(spark, corpus):
    m = {
        r.g: (r.cnt, r.bits)
        for r in lm_bigram_model(
            corpus, F.col("lang") == "en"
        ).collect()
    }
    # "a b" appears 3x -> bits = len(bin(3)) = 2
    assert m["a\x1fb"] == (3, 2)
    assert m["b\x1fc"] == (1, 1)
    assert len(m) == 4


def test_lm_score_hand_computed(spark, corpus):
    out = {
        r.doc_id: r
        for r in lm_score(
            corpus, F.col("lang") == "en"
        ).collect()
    }
    # doc 4: bigrams (a b -> bits 2), (b c -> bits 1);
    # fluency = 1000 * 3 div 2 = 1500, oov = 0
    assert (
        out[4].n_grams,
        out[4].n_oov,
        out[4].bits_sum,
        out[4].fluency_milli,
        out[4].oov_milli,
    ) == (2, 0, 3, 1500, 0)
    # doc 5: everything OOV
    assert (out[5].n_oov, out[5].fluency_milli, out[5].oov_milli) == (
        2,
        0,
        1000,
    )
    # doc 6: too short -> zero row, still present
    assert (out[6].n_grams, out[6].fluency_milli) == (0, 0)
    # reference docs are scored too (self-scoring corpus gate)
    assert out[1].n_oov == 0
    assert len(out) == 6


def test_lm_score_ranks_fluent_above_noise(spark, corpus):
    out = {
        r.doc_id: r.fluency_milli
        for r in lm_score(corpus, F.col("lang") == "en").collect()
    }
    assert out[4] > out[5]


def test_lm_top_k_broadcast_prunes_tail(spark, corpus):
    # keep only the single most frequent gram ("a b"): doc 4's
    # "b c" becomes OOV under the pruned broadcast model
    out = {
        r.doc_id: r
        for r in lm_score(
            corpus, F.col("lang") == "en", n_top_broadcast=1
        ).collect()
    }
    assert (out[4].n_oov, out[4].bits_sum) == (1, 2)
    plan = (
        lm_score(corpus, F.col("lang") == "en", n_top_broadcast=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_weights_deterministic_and_bounded(spark):
    w = hashed_weights(spark, n_buckets=256).collect()
    assert len(w) == 256
    assert all(-1000 <= r.weight_milli <= 1000 for r in w)
    w2 = hashed_weights(spark, n_buckets=256).collect()
    assert sorted(map(tuple, w)) == sorted(map(tuple, w2))


def test_classify_dot_product_exact(spark):
    docs = _docs(spark, [(1, "a a b", "en")])
    w = hashed_weights(spark, n_buckets=64)
    out = classify(docs, w, n_buckets=64).collect()[0]
    wm = {r.bucket: r.weight_milli for r in w.collect()}
    import hashlib

    def bucket(t):
        return (
            int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % 64
        )

    expect = 2 * wm[bucket("a")] + wm[bucket("b")]
    assert out.n_tokens == 3
    assert out.dot_milli == expect
    assert out.keep == (expect > 0)


def test_classify_broadcasts_weights(spark):
    docs = _docs(spark, [(1, "a b c", "en")])
    plan = (
        classify(docs, hashed_weights(spark, n_buckets=64), 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
