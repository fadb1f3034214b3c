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


# ----------------------------------------------------------------
# weighted systematic sampling
# ----------------------------------------------------------------


def _wdf(spark, n=400, seed_mod=37):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * F.col("id")) % seed_mod + 1)
        .cast("long")
        .alias("w"),
    )


def test_weighted_sample_matches_python(spark):
    from osmgraft.operators.export import weighted_systematic_sample

    df = _wdf(spark)
    rows = sorted(
        (r.doc_id, r.w) for r in df.collect()
    )
    wt = sum(w for _, w in rows)
    target = 25
    stride = wt // target
    cum = 0
    want = {}
    for d, w in rows:
        cum += w
        hits = cum // stride - (cum - w) // stride
        if hits >= 1:
            want[d] = hits
    got = {
        r.doc_id: r.hits
        for r in weighted_systematic_sample(
            df, ["doc_id"], "w", target
        ).collect()
    }
    assert got == want
    assert abs(len(got) - target) <= max(1, wt // stride - target)


def test_weighted_sample_partitioning_invariance(spark):
    from osmgraft.operators.export import weighted_systematic_sample

    df = _wdf(spark, n=300)
    a = {
        (r.doc_id, r.hits)
        for r in weighted_systematic_sample(
            df.repartition(7), ["doc_id"], "w", 20
        ).collect()
    }
    b = {
        (r.doc_id, r.hits)
        for r in weighted_systematic_sample(
            df.coalesce(1), ["doc_id"], "w", 20
        ).collect()
    }
    assert a == b


def test_weighted_sample_certainty_region(spark):
    """Rows with w >= stride are ALWAYS selected, with
    hits >= w div stride."""
    from osmgraft.operators.export import weighted_systematic_sample

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, F.lit(500))
        .otherwise(F.lit(3))
        .cast("long")
        .alias("w"),
    )
    target = 12
    wt = 10 * 500 + 90 * 3
    stride = wt // target
    out = {
        r.doc_id: r.hits
        for r in weighted_systematic_sample(
            df, ["doc_id"], "w", target
        ).collect()
    }
    for d in range(0, 100, 10):
        assert d in out  # 500 > stride=439 -> certainty
        assert out[d] >= 500 // stride


def test_weighted_sample_guards(spark):
    import pytest

    from osmgraft.operators.export import weighted_systematic_sample

    df = _wdf(spark, n=5)
    with pytest.raises(ValueError):
        weighted_systematic_sample(df, ["doc_id"], "w", 0)
    with pytest.raises(ValueError):
        weighted_systematic_sample(df, ["doc_id"], "w", 10**9)


def test_spatial_shards_contiguous_and_balanced(spark):
    """Shards are equal-size (+-1), contiguous along the curve
    (max hd of shard s <= min hd of shard s+1), and invariant
    under input partitioning."""
    from osmgraft.operators.export import spatial_shard_plan
    from osmgraft.suite import doc_points

    pts = doc_points(spark, "/root/testdata/sf0.001")
    out = spatial_shard_plan(pts.repartition(7), n_shards=4)
    rows = out.collect()
    n = len(rows)
    sizes = {}
    bounds = {}
    for r in rows:
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
        lo, hi = bounds.get(r.shard, (r.hd, r.hd))
        bounds[r.shard] = (min(lo, r.hd), max(hi, r.hd))
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    for s in range(3):
        assert bounds[s][1] <= bounds[s + 1][0]
    again = {
        (r.doc_id, r.shard)
        for r in spatial_shard_plan(
            pts.coalesce(1), n_shards=4
        ).collect()
    }
    assert again == {(r.doc_id, r.shard) for r in rows}
    assert n == pts.count()
