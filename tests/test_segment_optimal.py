"""segment_optimal: full-pipeline replay (vocab ranking + min-token
DP) in Python must match, and the DP must beat greedy left-to-right
longest-match on a crafted vocabulary."""

from __future__ import annotations

import random
from collections import Counter

from osmgraft.operators.tokenizer import segment_optimal

MAXW, MAXK, TOPN = 12, 4, 32


def _vocab(words):
    cnt = Counter()
    for w in words:
        for k in range(2, MAXK + 1):
            for i in range(len(w) - k + 1):
                cnt[w[i : i + k]] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    return {g for g, _ in ranked[:TOPN]}


def _dp(word, vocab):
    cost = [0] + [1 << 30] * len(word)
    for j in range(1, len(word) + 1):
        for k in range(1, MAXK + 1):
            if j - k < 0:
                break
            if k == 1 or word[j - k : j] in vocab:
                cost[j] = min(cost[j], cost[j - k] + 1)
    return cost[len(word)]


def _greedy(word, vocab):
    i, n = 0, 0
    while i < len(word):
        step = 1
        for k in range(MAXK, 1, -1):
            if word[i : i + k] in vocab and i + k <= len(word):
                step = k
                break
        i += step
        n += 1
    return n


def _run(spark, firstwords):
    df = spark.createDataFrame(
        [(i, w + " tail") for i, w in enumerate(firstwords)],
        "doc_id long, text string",
    )
    return {
        r.doc_id: (r.word, r.word_len, r.n_tokens)
        for r in segment_optimal(df).collect()
    }


def test_segment_matches_replay(spark):
    rng = random.Random(13)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randrange(1, 13)))
        for _ in range(80)
    ]
    got = _run(spark, words)
    vocab = _vocab([w[:MAXW] for w in words])
    for i, w in enumerate(words):
        w = w[:MAXW]
        assert got[i] == (w, len(w), _dp(w, vocab))


def test_dp_beats_greedy(spark):
    # corpus engineered so 'abc' ranks in vocab along with 'ab':
    # greedy longest-match on "abcabc..." consumes 'abc' fine, but
    # on words like "ababc" greedy 'ab|ab|c'=3 while DP 'ab|abc'=2.
    words = ["ababc"] * 5 + ["abc"] * 10 + ["ab"] * 10
    got = _run(spark, words)
    vocab = _vocab(words)
    assert "ab" in vocab and "abc" in vocab
    assert got[0] == ("ababc", 5, 2)
    assert _greedy("ababc", vocab) >= got[0][2]
