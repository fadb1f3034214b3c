"""dup_span_stats (q73) — brute-force differential + span-merge
edge cases + plan guards, and mix_plan (q75) — budget invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.text import dup_span_stats, mix_plan

K = 5

DOCS = [
    (0, "a b c d e f g h i j"),  # shares 'a b c d e f' run w/ 1,4
    (1, "a b c d e x y z w v"),
    (2, "q r s t u q r s t u q r s t u"),  # within-doc repeat
    (3, "one two three four"),  # shorter than K -> no shingles
    (4, "a b c d e f g h i j"),  # exact copy of doc 0
    (5, "p1 p2 p3 p4 p5 z1 z2 z3 z4 z5 z6 p1 p2 p3 p4 p5"),
]


def _brute(docs, k=K):
    from collections import Counter

    toks = {d: t.split(" ") for d, t in docs}
    freq: Counter = Counter()
    occ = {}
    for d, w in toks.items():
        occ[d] = []
        for p in range(len(w) - k + 1):
            s = "\x1f".join(w[p : p + k])
            freq[s] += 1
            occ[d].append((p, s))
    out = {}
    for d, w in toks.items():
        cov: set[int] = set()
        for p, s in occ[d]:
            if freq[s] >= 2:
                cov.update(range(p, p + k))
        run, prev, spans = sorted(cov), None, 0
        for t in run:
            if prev is None or t != prev + 1:
                spans += 1
            prev = t
        out[d] = (len(w), len(cov), spans, round(len(cov) / len(w), 6))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dup_spans_match_brute_force(spark, docs_df):
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_tokens"],
            r["n_dup_spans"],
            r["dup_ratio"],
        )
        for r in dup_span_stats(docs_df, n=K).collect()
    }
    assert got == _brute(DOCS)


def test_dup_spans_counts_separated_runs(spark, docs_df):
    """doc 5 repeats a 5-gram at positions 0 and 11 with a unique
    6-token gap -> exactly TWO maximal spans of 5 tokens each."""
    row = {
        r["doc_id"]: r for r in dup_span_stats(docs_df, n=K).collect()
    }[5]
    assert row["n_dup_spans"] == 2
    assert row["dup_tokens"] == 10


def test_doc_without_shingles_gets_zeros(spark, docs_df):
    row = {
        r["doc_id"]: r for r in dup_span_stats(docs_df, n=K).collect()
    }[3]
    assert (row["dup_tokens"], row["n_dup_spans"], row["dup_ratio"]) == (
        0,
        0,
        0.0,
    )


def test_dup_spans_plan_no_window_no_python(spark, docs_df):
    """shingle frequency must be groupBy+join (AQE-skew-splittable),
    never a window over the shingle key (hot boilerplate shingle =
    one task), and the span merge is an in-row fold — no Python."""
    plan = (
        dup_span_stats(docs_df, n=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_dup_spans_randomized_batch_differential(spark):
    """200 seeded-random docs over a tiny vocabulary (so natural
    shingle collisions are common), one Spark job, exact match with
    the brute force — covers overlap, touching-span, and
    cross/within-doc duplicate interactions the fixed cases miss."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(6)]
    docs = [
        (
            i,
            " ".join(
                rng.choice(vocab)
                for _ in range(rng.randint(1, 30))
            ),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_tokens"],
            r["n_dup_spans"],
            r["dup_ratio"],
        )
        for r in dup_span_stats(df, n=K).collect()
    }
    assert got == _brute(docs)


# ---- mix_plan (q75) --------------------------------------------


def test_mix_plan_weights_sum_to_one(spark):
    docs = [
        (i, "en" if i % 3 else "de", f"s{i % 4}", "w " * (10 + i % 7))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, lang string, source string, text string"
    )
    rows = mix_plan(df, target_tokens=500).collect()
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 <= r["sample_rate"] <= 1.0
        assert r["expected_tokens"] <= r["n_tokens"]


def test_mix_plan_flattens_skew(spark):
    """sqrt weighting must give the small stratum a HIGHER sampling
    rate than the dominant one (the whole point of temperature
    mixing)."""
    docs = [(i, "en", "big", "w " * 50) for i in range(1000)] + [
        (10_000 + i, "fr", "small", "w " * 50) for i in range(10)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, lang string, source string, text string"
    )
    rows = {
        (r["lang"], r["source"]): r
        for r in mix_plan(df, target_tokens=5_000).collect()
    }
    big, small = rows[("en", "big")], rows[("fr", "small")]
    assert small["sample_rate"] > big["sample_rate"]
    # and the weight ratio is ~sqrt(1000/10), not 100x
    assert big["mix_weight"] / small["mix_weight"] < 15


def test_mix_plan_normalizer_is_broadcast(spark):
    docs = [(i, "en", "s", "w x y") for i in range(50)]
    df = spark.createDataFrame(
        docs, "doc_id long, lang string, source string, text string"
    )
    plan = (
        mix_plan(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
