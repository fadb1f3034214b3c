"""Streaming quadtree maintenance
(streaming/tiles.quadtree_maintenance_stream): after draining two
change batches (with a checkpoint restart between), the maintained
tree artifact equals a from-scratch quadtree of the post-change
world."""

from __future__ import annotations

import random

from osmgraft.operators.tiles import quadtree_rollup
from osmgraft.streaming.tiles import (
    TILE_CHANGE_SCHEMA,
    quadtree_maintenance_stream,
)

CAP, LEAF, LEVELS = 4, 20, 5


def _pts(n):
    rng = random.Random(7)
    return [
        (
            i,
            400000000 + rng.randrange(0, 4000000),
            300000000 + rng.randrange(0, 4000000),
        )
        for i in range(n)
    ]


def test_streamed_tree_equals_scratch(spark, tmp_path):
    pts_path = str(tmp_path / "pts")
    tree_out = str(tmp_path / "tree")
    changes = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")

    base = _pts(60)
    spark.createDataFrame(
        base, "doc_id long, lat_i long, lon_i long"
    ).write.parquet(pts_path)

    # batch 1: move 10 docs north; batch 2: delete 5, add 8 far away
    b1 = [
        (i, la + 2000000, lo, False, 1)
        for i, la, lo in base
        if i % 6 == 0
    ]
    b2 = [(i, 0, 0, True, 2) for i, _, _ in base if i % 11 == 0] + [
        (1000 + j, -500000000 + j * 3000, -600000000 + j * 5000,
         False, 2)
        for j in range(8)
    ]

    def drain(rows):
        spark.createDataFrame(
            rows, TILE_CHANGE_SCHEMA
        ).coalesce(1).write.mode("append").parquet(changes)
        q = quadtree_maintenance_stream(
            spark, pts_path, tree_out, changes, ckpt,
            cap=CAP, leaf_shift=LEAF, levels=LEVELS,
        )
        q.awaitTermination(120)

    drain(b1)
    drain(b2)  # fresh stream instance = restart from checkpoint

    # from-scratch post-change world
    world = {i: (la, lo) for i, la, lo in base}
    for i, la, lo, dele, _ in b1 + b2:
        if dele:
            world.pop(i, None)
        else:
            world[i] = (la, lo)
    scratch_df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in world.items()],
        "doc_id long, lat_i long, lon_i long",
    )
    scratch = {
        (r["level"], r["qcell"]): (r["n_docs"], r["min_doc"])
        for r in quadtree_rollup(
            scratch_df, cap=CAP, leaf_shift=LEAF, levels=LEVELS
        ).collect()
    }
    got = {
        (r["level"], r["qcell"]): (r["n_docs"], r["min_doc"])
        for r in spark.read.parquet(tree_out).collect()
    }
    assert got == scratch
    assert sum(n for n, _ in got.values()) == len(world)
