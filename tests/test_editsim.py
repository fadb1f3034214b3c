"""edit_neardup_pairs: the deletion-neighborhood blocking must
recall EXACTLY the brute-force Levenshtein<=1 pairs on randomized
strings (substitutions, inserts, deletes, duplicates, empties)."""

from __future__ import annotations

import random

from osmgraft.operators.editsim import edit_neardup_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _brute(titles):
    out = set()
    for i, a in titles:
        for j, b in titles:
            if i < j and _lev(a, b) <= 1:
                out.add((i, j, _lev(a, b)))
    return out


def _mutate(rng, s: str) -> str:
    if not s:
        return rng.choice("abc")
    k = rng.randrange(len(s))
    op = rng.randrange(3)
    if op == 0:  # substitute
        return s[:k] + rng.choice("abcxyz") + s[k + 1 :]
    if op == 1:  # delete
        return s[:k] + s[k + 1 :]
    return s[:k] + rng.choice("abcxyz") + s[k:]  # insert


def test_editsim_matches_brute(spark):
    rng = random.Random(7)
    base = [
        "".join(rng.choice("abcde") for _ in range(rng.randrange(0, 12)))
        for _ in range(30)
    ]
    pool = list(base)
    for s in base:  # planted near-dups and exact dups
        if rng.random() < 0.5:
            pool.append(_mutate(rng, s))
        if rng.random() < 0.2:
            pool.append(s)
    titles = list(enumerate(pool))
    df = spark.createDataFrame(
        [(i, t) for i, t in titles], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in edit_neardup_pairs(df, prefix_len=40).collect()
    }
    assert got == _brute(titles)


def test_editsim_prefix_truncation(spark):
    # strings differing only beyond the prefix are exact-prefix dups
    df = spark.createDataFrame(
        [(0, "x" * 50 + "AAA"), (1, "x" * 50 + "BBB")],
        "doc_id long, text string",
    )
    rows = edit_neardup_pairs(df, prefix_len=40).collect()
    assert [(r.doc_a, r.doc_b, r.edit_dist) for r in rows] == [(0, 1, 0)]
