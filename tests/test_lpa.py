"""lpa_communities: deterministic synchronous label propagation
must (a) match a literal per-round Python replay on a random graph
and (b) split a barbell graph into its two cliques despite the
bridge keeping it connected (which any reachability resolver would
collapse to one cluster)."""

from __future__ import annotations

import random
from collections import Counter

from osmgraft.operators.linkgraph import lpa_communities


def _replay(edges, iters):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = {s for s, _ in und}
    lab = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            cnt = Counter(lab[d] for s, d in und if s == n)
            if cnt:
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                new[n] = best[0]
            else:
                new[n] = lab[n]
        lab = new
    return lab


def _run(spark, edges, iters):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.community
        for r in lpa_communities(df, iters=iters).collect()
    }


def test_lpa_barbell(spark):
    a = [(i, j) for i in range(5) for j in range(5) if i < j]
    b = [(i, j) for i in range(5, 10) for j in range(5, 10) if i < j]
    edges = a + b + [(4, 5)]
    got = _run(spark, edges, iters=4)
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in range(5, 10)} == {5}


def test_lpa_matches_replay(spark):
    rng = random.Random(5)
    edges = [
        (rng.randrange(40), rng.randrange(40)) for _ in range(120)
    ]
    for iters in (1, 3):
        assert _run(spark, edges, iters) == _replay(edges, iters)
