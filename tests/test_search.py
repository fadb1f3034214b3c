"""Inverted index, distinctive terms, and conjunctive search
(operators/search.py) unit tests."""

import pyspark.sql.functions as F
import pytest

from osmgraft.operators.search import (
    distinctive_terms,
    inverted_index,
    search_and,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "the dog ran fast"),
            (4, "lonely"),
        ],
        "doc_id long, text string",
    )


def test_index_postings_sorted_and_counted(spark, docs):
    idx = {
        r.term: (r.doc_freq, r.postings)
        for r in inverted_index(docs).collect()
    }
    assert idx["the"] == (3, [1, 2, 3])
    assert idx["cat"] == (2, [1, 2])
    assert idx["ran"] == (2, [2, 3])
    assert idx["lonely"] == (1, [4])


def test_index_df_band(spark, docs):
    idx = {
        r.term
        for r in inverted_index(docs, min_df=2, max_df=2).collect()
    }
    assert idx == {"cat", "ran"}  # "the" (df=3) and hapaxes out


def test_index_postings_distinct_per_doc(spark):
    d = spark.createDataFrame(
        [(1, "echo echo echo")], "doc_id long, text string"
    )
    r = inverted_index(d).collect()[0]
    assert (r.doc_freq, r.postings) == (1, [1])


def test_index_invariant_under_partitioning(spark, docs):
    a = sorted(
        (r.term, r.doc_freq, tuple(r.postings))
        for r in inverted_index(docs).collect()
    )
    b = sorted(
        (r.term, r.doc_freq, tuple(r.postings))
        for r in inverted_index(docs.repartition(7)).collect()
    )
    assert a == b


def test_distinctive_terms_ranking(spark, docs):
    out = {
        (r.doc_id, r.rank): (r.term, r.tf, r.doc_freq)
        for r in distinctive_terms(docs, k=2).collect()
    }
    # doc 1: all tf=1 -> rarest first ("cat" df=2, "sat" df=1):
    # ties break (tf desc, df asc, term asc) -> sat (df=1) first
    assert out[(1, 1)] == ("sat", 1, 1)
    assert out[(1, 2)] == ("cat", 1, 2)
    # doc 4: only one term, no rank-2 row
    assert out[(4, 1)][0] == "lonely"
    assert (4, 2) not in out


def test_distinctive_terms_tf_beats_rarity(spark):
    d = spark.createDataFrame(
        [(1, "big big small"), (2, "big")],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.rank): r.term
        for r in distinctive_terms(d, k=1).collect()
    }
    # "big" tf=2 outranks "small" (tf=1) despite higher df
    assert out[(1, 1)] == "big"


def test_search_and_intersects(spark, docs):
    idx = inverted_index(docs)
    got = sorted(
        r.doc_id for r in search_and(idx, ["the", "ran"]).collect()
    )
    assert got == [2, 3]
    assert (
        search_and(idx, ["cat", "fast"]).count() == 0
    )  # disjoint postings


def test_search_single_term(spark, docs):
    got = sorted(
        r.doc_id
        for r in search_and(
            inverted_index(docs), ["cat"]
        ).collect()
    )
    assert got == [1, 2]


def test_ranked_search_scoring_and_plan(spark):
    """Integer tf-idf ranking matches a python replay (incl. the
    score-desc/doc-asc tie break), and the query side joins via
    broadcast."""
    from collections import Counter

    from osmgraft.operators.search import ranked_search

    docs = [
        (0, "a a a rare"),
        (1, "a b b"),
        (2, "b b b b"),
        (3, "rare rare c"),
        (4, "c c a"),
        (5, "d"),
    ]
    queries = [(0, "a rare"), (1, "b c"), (2, "zzz")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, qtext string"
    )
    out = ranked_search(ddf, qdf, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    n = len(docs)
    tf = {
        d: Counter(t.split()) for d, t in docs
    }
    df_ = Counter()
    for d, c in tf.items():
        for t in c:
            df_[t] += 1
    want = set()
    for qid, qt in queries:
        scores = {}
        for d, c in tf.items():
            s = sum(
                c[t] * (n // df_[t])
                for t in set(qt.split())
                if t in c
            )
            if s > 0 or any(t in c for t in qt.split()):
                if any(t in c for t in qt.split()):
                    scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for r, (d, s) in enumerate(ranked[:3], 1):
            want.add((qid, r, d, s))
    got = {
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in out.collect()
    }
    assert got == want
    assert not any(q == 2 for q, _, _, _ in got)  # no zzz matches
