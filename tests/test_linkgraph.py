"""host_pagerank: hand-computed tiny graph, partitioning
invariance (the point of integer arithmetic), dangling hosts."""

from __future__ import annotations

from osmgraft.operators.linkgraph import host_pagerank

S = 10**12
BASE = S * 15 // 100


def _ranks(spark, edges, iters, parts=None):
    df = spark.createDataFrame(edges, "src string, dst string")
    if parts:
        df = df.repartition(parts)
    return {
        r.host: r.rank
        for r in host_pagerank(df, iters=iters).collect()
    }


def test_one_iteration_by_hand(spark):
    # a -> b, a -> c, b -> c; c dangling
    edges = [("a", "b"), ("a", "c"), ("b", "c")]
    got = _ranks(spark, edges, iters=1)
    # a receives nothing: base only
    assert got["a"] == BASE
    # b receives a's rank div 2
    assert got["b"] == BASE + 85 * (S // 2) // 100
    # c receives a div 2 + b div 1
    assert got["c"] == BASE + 85 * (S // 2 + S) // 100


def test_partitioning_invariance(spark):
    edges = [
        (f"h{i % 7}", f"h{(i * 5 + 3) % 11}")
        for i in range(200)
        if i % 7 != (i * 5 + 3) % 11
    ]
    edges = list(dict.fromkeys(edges))
    a = _ranks(spark, edges, iters=3, parts=1)
    b = _ranks(spark, edges, iters=3, parts=13)
    assert a == b  # bit-identical, not approximately equal


def test_symmetric_cycle_stays_uniform(spark):
    # a perfect cycle preserves mass: rank stays exactly `scale`
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    got = _ranks(spark, edges, iters=4)
    assert set(got.values()) == {S}
