"""Deterministic export sharding (operators/export.py) and exact
percentiles (operators/indexing.exact_percentiles) unit tests."""

import pyspark.sql.functions as F
import pytest

from osmgraft.operators.export import shard_plan, shard_summary
from osmgraft.operators.indexing import exact_percentiles


def _docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.lit(f"w{i}") for i in range(3)]
        ).alias("text"),
    )


def test_shard_plan_positions_dense_per_shard(spark):
    out = shard_plan(_docs(spark, 100), n_shards=4).collect()
    assert len(out) == 100
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shard_plan_invariant_under_partitioning(spark):
    d = _docs(spark, 200)
    a = sorted(map(tuple, shard_plan(d, n_shards=4).collect()))
    b = sorted(
        map(
            tuple,
            shard_plan(d.repartition(13), n_shards=4).collect(),
        )
    )
    assert a == b


def test_shard_salt_reshuffles(spark):
    d = _docs(spark, 200)
    a = {r.doc_id: (r.shard, r.pos) for r in shard_plan(d).collect()}
    b = {
        r.doc_id: (r.shard, r.pos)
        for r in shard_plan(d, salt="epoch2").collect()
    }
    assert a != b  # a different permutation...
    assert set(a) == set(b)  # ...over the same documents


def test_shard_summary_balances_docs(spark):
    s = {
        r.shard: r.n_docs
        for r in shard_summary(_docs(spark, 800), n_shards=8).collect()
    }
    assert sum(s.values()) == 800
    # keyed-hash balance: no shard more than 2x the mean
    assert max(s.values()) <= 2 * (800 // 8)


def test_shard_plan_no_global_sort(spark):
    plan = (
        shard_plan(_docs(spark, 50), n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


@pytest.fixture()
def values(spark):
    # 1..100 once each: p50=50, p90=90, p99=99 by ceil-rank
    return spark.range(1, 101).select(
        (F.col("id")).cast("long").alias("v")
    )


def test_percentiles_ceil_rank_exact(spark, values):
    r = exact_percentiles(values, "v").collect()[0]
    assert (r.n_rows, r.p50, r.p90, r.p99) == (100, 50, 90, 99)


def test_percentiles_with_duplicates(spark):
    df = spark.createDataFrame(
        [(1,)] * 9 + [(100,)], "v long"
    )
    r = exact_percentiles(df, "v", ps=(50, 90, 95)).collect()[0]
    # N=10: rank(50)=5 -> 1; rank(90)=9 -> 1; rank(95)=10 -> 100
    assert (r.p50, r.p90, r.p95) == (1, 1, 100)


def test_percentiles_match_python(spark):
    import random

    random.seed(3)
    vals = [random.randrange(0, 50) for _ in range(237)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = exact_percentiles(df, "v", ps=(10, 50, 99)).collect()[0]
    sv = sorted(vals)

    def pick(p):
        rank = (p * len(sv) + 99) // 100
        return sv[rank - 1]

    assert (r.p10, r.p50, r.p99) == (pick(10), pick(50), pick(99))
