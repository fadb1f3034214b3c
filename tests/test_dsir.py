"""dsir_lean (q76) — DSIR-style integer-exact importance signal:
target-vocabulary documents must score high, disjoint-vocabulary
documents low, and the verdict/normalizer tables must broadcast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.text import dsir_lean


@pytest.fixture(scope="module")
def corpus(spark):
    # target slice (lang=en) uses vocab tA..tF; raw-only docs use
    # a DISJOINT vocab rA..rF; two mixed docs share both.
    rows = []
    for i in range(20):
        rows.append((i, "en", "tA tB tC tD tE tF tA tB tC tD"))
    for i in range(20, 40):
        rows.append((i, "de", "rA rB rC rD rE rF rA rB rC rD"))
    rows.append((100, "fr", "tA tB tC tD rA rB rC rD"))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def test_target_vocab_leans_high_disjoint_low(spark, corpus):
    out = {
        r["doc_id"]: r
        for r in dsir_lean(
            corpus, F.col("lang") == "en"
        ).collect()
    }
    # pure-target docs: every bigram bucket is target-heavy
    assert out[0]["lean_ratio"] == 1.0
    # raw-only docs: their buckets contain zero target grams
    assert out[25]["lean_ratio"] == 0.0
    # the mixed doc sits strictly between
    assert 0.0 < out[100]["lean_ratio"] < 1.0


def test_scores_are_deterministic_across_partitionings(
    spark, corpus
):
    a = sorted(
        map(
            tuple,
            dsir_lean(corpus, F.col("lang") == "en").collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dsir_lean(
                corpus.repartition(7), F.col("lang") == "en"
            ).collect(),
        )
    )
    assert a == b


def test_bucket_tables_broadcast(spark, corpus):
    plan = (
        dsir_lean(corpus, F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
