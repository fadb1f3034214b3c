"""Distributed dense global index must equal the single-partition
window form exactly (same total order, same 1-based dense values)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from osmgraft.operators.indexing import with_global_index


def test_matches_global_window(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 977).alias("k"),
        F.col("id").alias("tie"),
    ).repartition(16)
    w = Window.orderBy("k", "tie")
    want = {
        (r.k, r.tie): r.idx
        for r in df.withColumn(
            "idx", F.row_number().over(w).cast("long")
        ).collect()
    }
    out = with_global_index(df, ["k", "tie"], num_partitions=8)
    assert out.rdd.getNumPartitions() == 8
    got = {(r.k, r.tie): r.idx for r in out.collect()}
    assert got == want
    assert sorted(got.values()) == list(range(1, 5001))


def test_geobase_build_uses_distributed_index(spark):
    """suite_addr's address base built through the distributed
    index must equal the window-built one (oracle compatibility)."""
    from osmgraft.suite_addr import _addresses

    a = _addresses(spark, "/root/testdata/sf0.001")
    rows = {
        r.addr_idx: (r.city, r.street, r.housenumeric, r.housenumber)
        for r in a.collect()
    }
    assert sorted(rows) == list(range(1, len(rows) + 1))
    # index order respects (city, street, housenumeric)
    vals = [rows[i][:3] for i in sorted(rows)]
    assert vals == sorted(vals)
