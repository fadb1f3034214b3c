"""jaccard_prefix_join: exact-rational verify arithmetic and
losslessness vs a brute-force all-pairs Python replay."""

from __future__ import annotations

from itertools import combinations

from osmgraft.operators.dedup import jaccard_prefix_join


def _grams(text, n=3):
    ts = text.split(" ")
    return {
        " ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)
    }


def test_prefix_join_lossless_vs_bruteforce(spark):
    docs = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g z"),      # near-dup of 1
        (3, "a b c d q r s t"),      # half-overlap with 1
        (4, "u v w x y z1 z2 z3"),   # disjoint
        (5, "u v w x y z1 z2 z3"),   # exact dup of 4
        (6, "m n"),                  # too short for 3-grams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for num, den in ((1, 2), (1, 4), (2, 3)):
        got = {
            (r.a, r.b): (r.inter, r.na, r.nb)
            for r in jaccard_prefix_join(
                df, threshold_num=num, threshold_den=den, gram_n=3
            ).collect()
        }
        sets = {i: _grams(t) for i, t in docs}
        want = {}
        for a, b in combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            if na and nb and inter * (den + num) >= num * (na + nb):
                want[(a, b)] = (inter, na, nb)
        assert got == want, (num, den)
    # sanity: at 1/2 the exact dup and the near-dup pair survive
    got12 = {
        (r.a, r.b)
        for r in jaccard_prefix_join(
            df, threshold_num=1, threshold_den=2
        ).collect()
    }
    assert (4, 5) in got12 and (1, 2) in got12
    assert (1, 3) not in got12
