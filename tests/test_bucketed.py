"""Bucketed co-located join: the way->node resolution over
pre-bucketed tables must plan WITHOUT any Exchange, and produce
exactly what the ad hoc join produces."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.operators.bucketed import (
    resolve_way_nodes_bucketed,
    write_bucketed_graph,
)


def test_bucketed_resolution_no_exchange(spark, tmp_path):
    nodes = spark.range(1, 501).select(
        F.col("id"),
        (F.col("id") * 7).alias("lat_i"),
        (-F.col("id") * 3).alias("lon_i"),
    )
    ways = spark.range(1, 41).select(
        (F.col("id") + 1000).alias("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda j: (F.col("id") * 13 + j * 7) % 500 + 1,
        ).alias("refs"),
    )
    write_bucketed_graph(
        nodes, ways, n_buckets=8, path=str(tmp_path / "wh")
    )
    # force the shuffle-join path (the tables are tiny enough to
    # broadcast, which would sidestep the bucketing under test)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = resolve_way_nodes_bucketed(spark)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

        got = sorted(
            (r.way_id, r.j, r.ref, r.lat_i, r.lon_i)
            for r in out.collect()
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", saved
        )

    want = sorted(
        (r.way_id, r.j, r.ref, r.lat_i, r.lon_i)
        for r in ways.select(
            F.col("id").alias("way_id"),
            F.posexplode("refs").alias("j", "ref"),
        )
        .join(nodes.withColumnRenamed("id", "ref"), "ref")
        .select("way_id", "j", "ref", "lat_i", "lon_i")
        .collect()
    )
    assert got == want and len(got) == 200


def test_tile_blur_kernel_exact(spark):
    """Single-cell impulse spreads the exact binomial kernel;
    total mass is conserved away from borders."""
    from pyspark.sql import functions as F

    from osmgraft.geo.cells import _lon_bits
    from osmgraft.operators.tiles import tile_blur

    bits = _lon_bits(20)
    mid = 800 * (1 << bits) + 1200  # interior cell
    rollup = spark.createDataFrame(
        [(mid, 16)], "cell long, n long"
    )
    got = {
        r.cell: (r.smoothed_num, r.smoothed)
        for r in tile_blur(rollup, shift=20).collect()
    }
    assert len(got) == 9
    assert got[mid] == (64, 4)  # 4*16, div 16
    assert got[mid + 1] == (32, 2)
    assert got[mid + (1 << bits) + 1] == (16, 1)
    assert sum(v[0] for v in got.values()) == 16 * 16  # mass * 16
