"""Incremental tile-view maintenance (tile_rollup_incremental):
equality with full recompute, pass-through of unaffected tiles, and
the broadcast plan shape the 100-TB story depends on."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from osmgraft.operators.merge import change_apply
from osmgraft.operators.spatial import with_cell
from osmgraft.operators.tiles import tile_rollup, tile_rollup_incremental


def _pts(spark, n=4000):
    return with_cell(
        spark.range(0, n).select(
            F.col("id").alias("doc_id"),
            (470000000 + (F.col("id") * 2246822519) % 40000000)
            .cast("long").alias("lat_i"),
            (100000000 + (F.col("id") * 2654435761) % 40000000)
            .cast("long").alias("lon_i"),
        )
    )


def _changes(pts):
    moved = pts.filter(
        (F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 5 == 0)
    ).select(
        "doc_id",
        (F.col("lat_i") + F.lit(900000)).alias("lat_i"),
        "lon_i",
        (F.col("doc_id") % 5 == 0).alias("deleted"),
    )
    added = pts.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        (F.col("lat_i") + F.lit(1800000)).alias("lat_i"),
        (F.col("lon_i") + F.lit(1300000)).alias("lon_i"),
        F.lit(False).alias("deleted"),
    )
    return with_cell(moved.unionByName(added))


def test_incremental_equals_full_recompute(spark):
    pts = _pts(spark)
    changes = _changes(pts)
    base = tile_rollup(pts)
    inc = tile_rollup_incremental(base, pts, changes)
    full = tile_rollup(change_apply(pts, changes, ["doc_id"]))
    cols = ["cell", "n_docs", "min_doc", "max_doc"]
    assert sorted(map(tuple, inc.select(*cols).collect())) == sorted(
        map(tuple, full.select(*cols).collect())
    )


def test_empty_changefile_is_identity(spark):
    pts = _pts(spark, n=500)
    base = tile_rollup(pts)
    empty = _changes(pts).limit(0)
    inc = tile_rollup_incremental(base, pts, empty)
    cols = ["cell", "n_docs", "min_doc", "max_doc"]
    assert sorted(map(tuple, inc.select(*cols).collect())) == sorted(
        map(tuple, base.select(*cols).collect())
    )


def test_plan_broadcasts_affected_set(spark):
    """The affected-cell set must reach both the recompute semi-join
    and the pass-through anti-join as broadcasts; a shuffled
    (SortMergeJoin) affected-set would re-shuffle the 10^12-row base
    on every daily diff."""
    pts = _pts(spark)
    changes = _changes(pts)
    inc = tile_rollup_incremental(tile_rollup(pts), pts, changes)
    buf = io.StringIO()
    with redirect_stdout(buf):
        inc.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("BroadcastExchange") >= 3  # keys + 2x affected
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
