"""Bucketed co-located joins (the brief's "bucketing for
co-located joins"): pre-bucket the nodes and exploded way-ref
tables on the join key so the planet-scale way->node resolution
(J1) runs WITHOUT a shuffle on either side.

At 100 TB the ref-resolution join dominates osmconvert-style
workloads: every way explodes to its node refs and joins the node
table on id. Sort-merge joining that ad hoc shuffles BOTH sides
every run. Writing both tables bucketed by the id key once
(`bucketBy(n, key).sortBy(key)`) makes every subsequent join
exchange-free: Spark recognizes the matching bucketing and plans a
SortMergeJoin with zero Exchange operators
(tests/test_bucketed.py asserts the plan).

This is the persistent-table twin of graph.resolve_way_nodes —
same semantics, amortized shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed_graph(
    nodes: DataFrame,
    ways: DataFrame,
    n_buckets: int = 16,
    nodes_table: str = "nodes_b",
    wayrefs_table: str = "wayrefs_b",
    path: str | None = None,
) -> None:
    """Persist nodes(id, lat_i, lon_i) and the EXPLODED way refs
    (way_id, j, ref) as bucketed+sorted tables on the join key.
    One shuffle each at write time buys exchange-free joins for
    every query after. `path` makes them external tables rooted
    there (default: the session warehouse)."""
    w = (
        nodes.select("id", "lat_i", "lon_i")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "id")
        .sortBy("id")
    )
    if path:
        w = w.option("path", f"{path}/{nodes_table}")
    w.saveAsTable(nodes_table)
    refs = ways.select(
        F.col("id").alias("way_id"),
        F.posexplode("refs").alias("j", "ref"),
    )
    w2 = (
        refs.withColumn("id", F.col("ref"))
        .write.mode("overwrite")
        .bucketBy(n_buckets, "id")
        .sortBy("id")
    )
    if path:
        w2 = w2.option("path", f"{path}/{wayrefs_table}")
    w2.saveAsTable(wayrefs_table)


def resolve_way_nodes_bucketed(
    spark: SparkSession,
    nodes_table: str = "nodes_b",
    wayrefs_table: str = "wayrefs_b",
) -> DataFrame:
    """J1 over the bucketed tables: (way_id, j, ref, lat_i, lon_i)
    with no Exchange in the physical plan (co-located buckets)."""
    nodes = spark.table(nodes_table)
    refs = spark.table(wayrefs_table)
    return refs.join(nodes, "id").select(
        "way_id", "j", F.col("id").alias("ref"), "lat_i", "lon_i"
    )
