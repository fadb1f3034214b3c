"""Streaming tile maintenance: change batches drive the
manifest-committed incremental tile refresh; restart from the
stream checkpoint processes only new batches; the final tile store
equals a from-scratch rollup of the final points."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.manifest import (
    read_committed,
    run_resumable,
    verify_manifest,
    with_bucket,
)
from osmgraft.operators.spatial import with_cell
from osmgraft.operators.tiles import tile_rollup
from osmgraft.streaming.tiles import tile_maintenance_stream

N_BUCKETS = 16


def _write_base(spark, pts_path):
    pts = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (470000000 + (F.col("id") * 2246822519) % 40000000)
        .cast("long").alias("lat_i"),
        (100000000 + (F.col("id") * 2654435761) % 40000000)
        .cast("long").alias("lon_i"),
    )
    pts.write.mode("overwrite").parquet(pts_path)
    return pts


def _seed_tiles(spark, pts_path, tiles_out):
    base = with_cell(spark.read.parquet(pts_path))
    tiles = with_bucket(tile_rollup(base), "cell", N_BUCKETS)
    run_resumable(
        tiles, tiles_out, n_buckets=N_BUCKETS,
        input_lineage="seed",
    )


def _tiles_equal_recompute(spark, pts_path, tiles_out):
    expected = tile_rollup(with_cell(spark.read.parquet(pts_path)))
    got = read_committed(spark, tiles_out).drop("bucket")
    cols = ["cell", "n_docs", "min_doc", "max_doc"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, expected.select(*cols).collect())
    )
    assert verify_manifest(spark, tiles_out).isEmpty()


def test_stream_maintains_tiles_across_restart(spark, tmp_path):
    pts_path = str(tmp_path / "pts")
    tiles_out = str(tmp_path / "tiles")
    changes = tmp_path / "changes"
    changes.mkdir()
    ckpt = str(tmp_path / "ckpt")

    _write_base(spark, pts_path)
    _seed_tiles(spark, pts_path, tiles_out)

    def change_file(name, rows):
        spark.createDataFrame(
            rows,
            "doc_id long, lat_i long, lon_i long, deleted boolean,"
            " seq long",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(changes / name)
        )

    # batch 1: move doc 5 (stale seq-1 row must lose), delete doc 7,
    # insert doc 9000
    change_file("c1", [
        (5, 471000000, 101000000, False, 1),
        (5, 489000000, 131000000, False, 2),
        (7, 0, 0, True, 2),
        (9000, 502000000, 118000000, False, 2),
    ])
    q = tile_maintenance_stream(
        spark, pts_path, tiles_out, str(changes), ckpt,
        n_buckets=N_BUCKETS,
    )
    q.awaitTermination(120)
    _tiles_equal_recompute(spark, pts_path, tiles_out)
    pts1 = {
        r.doc_id for r in spark.read.parquet(pts_path).collect()
    }
    assert 7 not in pts1 and 9000 in pts1

    # batch 2 arrives; restart from the same checkpoint — c1 is not
    # reapplied, c2 is, tiles stay equal to a fresh rollup
    change_file("c2", [
        (9000, 0, 0, True, 3),
        (11, 476000000, 104000000, False, 3),
    ])
    q2 = tile_maintenance_stream(
        spark, pts_path, tiles_out, str(changes), ckpt,
        n_buckets=N_BUCKETS,
    )
    q2.awaitTermination(120)
    _tiles_equal_recompute(spark, pts_path, tiles_out)
    pts2 = {
        r.doc_id for r in spark.read.parquet(pts_path).collect()
    }
    assert 9000 not in pts2 and len(pts2) == 1999


def test_streaming_corridor_equals_batch(spark, tmp_path):
    """streaming_corridor_probe drained over two arrival batches
    equals the batch cell_corridor_join on all arrived points;
    appending more points after a restart only adds rows for the
    new points (stateless append mode)."""
    from pyspark.sql import functions as F

    from osmgraft.operators.graph import synth_ways
    from osmgraft.operators.linecover import (
        cell_corridor_join,
        way_cell_cover,
    )
    from osmgraft.streaming.tiles import streaming_corridor_probe
    from osmgraft.suite import doc_points, load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").select("doc_id")
    routes = synth_ways(docs, docs.count()).where(
        F.col("way_id") % 20 == 0
    )
    nodes = doc_points(spark, sf)
    cover = way_cell_cover(routes, nodes, shift=20).localCheckpoint()

    def _pts(lo, hi):
        return nodes.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )

    pdir = str(tmp_path / "pts")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _pts(0, 30).coalesce(1).write.mode("overwrite").parquet(pdir)

    def drain():
        q = (
            streaming_corridor_probe(spark, pdir, cover, shift=20)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["way_id"], r["doc_id"])
            for r in spark.read.parquet(out).collect()
        }

    first = drain()
    want1 = {
        (r["way_id"], r["doc_id"])
        for r in cell_corridor_join(
            cover, _pts(0, 30), shift=20
        ).collect()
    }
    assert first == want1 and len(first) > 0

    _pts(30, 60).coalesce(1).write.mode("append").parquet(pdir)
    second = drain()
    want2 = {
        (r["way_id"], r["doc_id"])
        for r in cell_corridor_join(
            cover, _pts(0, 60), shift=20
        ).collect()
    }
    assert second == want2
