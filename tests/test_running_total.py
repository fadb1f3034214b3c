"""with_running_total: the distributed prefix sum equals the
single-task SUM() OVER (ORDER BY), across multiple partitions."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from osmgraft.operators.indexing import with_running_total


def test_matches_global_window(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 131) % 97 + 1).alias("v"),
    )
    got = with_running_total(
        df, order_cols=["k"], value_col="v", out_col="run",
        num_partitions=8,
    )
    expect = df.withColumn(
        "run", F.sum("v").over(Window.orderBy("k"))
    )
    assert sorted(
        (r.k, r.run) for r in got.collect()
    ) == sorted((r.k, r.run) for r in expect.collect())


def test_spreads_over_partitions(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    out = with_running_total(
        df, order_cols=["k"], value_col="v", num_partitions=8
    )
    # the compute runs in >1 task (the whole point vs a global
    # window's single partition)
    n_parts = out.rdd.getNumPartitions()
    assert n_parts >= 8
    assert out.count() == 5000
