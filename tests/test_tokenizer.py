"""Distributed BPE (operators/tokenizer) differential-tested
against a pure-Python reference implementation of Sennrich et al.
2016 — pair counting, merge training, and segmentation must agree
exactly, including the left-to-right non-overlapping merge rule."""

from __future__ import annotations

from collections import Counter

import pytest

from osmgraft.operators.tokenizer import (
    bpe_pair_counts,
    bpe_segment,
    bpe_train,
    word_counts,
)

DOCS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wide wider widest low new"),
    (3, "aaa aa a aaa"),
    (4, "x  y"),  # double space -> empty token must be dropped
]


# ---- pure-Python reference ------------------------------------


def _py_word_counts(docs):
    c = Counter()
    for _, t in docs:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return c


def _py_pairs(vocab):
    pc = Counter()
    for syms, n in vocab:
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
    return pc


def _py_merge(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(docs, n):
    vocab = [
        (list(w), c) for w, c in _py_word_counts(docs).items()
    ]
    merges = []
    for _ in range(n):
        pc = _py_pairs(vocab)
        if not pc:
            break
        best = sorted(
            pc.items(), key=lambda kv: (-kv[1], "\x1f".join(kv[0]))
        )[0][0]
        merges.append(best)
        vocab = [(_py_merge(s, best), c) for s, c in vocab]
    return merges


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_word_counts_drops_empty_tokens(spark, docs_df):
    got = {r["word"]: r["n"] for r in word_counts(docs_df).collect()}
    assert got == dict(_py_word_counts(DOCS))
    assert "" not in got


def test_pair_counts_match_python(spark, docs_df):
    got = {
        (r["left"], r["right"]): r["pair_count"]
        for r in bpe_pair_counts(docs_df).collect()
    }
    vocab0 = [
        (list(w), c) for w, c in _py_word_counts(DOCS).items()
    ]
    assert got == dict(_py_pairs(vocab0))


def test_train_matches_python_reference(spark, docs_df):
    assert bpe_train(docs_df, 6) == _py_train(DOCS, 6)


def test_merge_is_left_to_right_non_overlapping(spark):
    """'a a a' under merge (a,a) segments as [aa, a], not [a, aa]
    and not [aa, aa] — the reference algorithm's sequential rule."""
    df = spark.createDataFrame(
        [(0, "aaa")], "doc_id long, text string"
    )
    out = bpe_segment(df, [("a", "a")]).collect()[0]
    assert out["n_words"] == 1
    assert out["n_bpe_symbols"] == 2  # [aa, a]


def test_segment_matches_python(spark, docs_df):
    merges = _py_train(DOCS, 5)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_symbols"])
        for r in bpe_segment(docs_df, list(merges)).collect()
    }
    for d, t in DOCS:
        words = [w for w in t.split(" ") if w]
        total = 0
        for w in words:
            s = list(w)
            for p in merges:
                s = _py_merge(s, p)
            total += len(s)
        assert got[d] == (len(words), total)


def test_pair_count_plan_never_explodes_corpus(spark, docs_df):
    """the corpus is aggregated to (word, n) BEFORE pair expansion:
    the plan must show two exchanges (word agg, pair agg) and no
    Python stage — tokenizer statistics stay JVM-side."""
    plan = (
        bpe_pair_counts(docs_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2
    assert "Python" not in plan
