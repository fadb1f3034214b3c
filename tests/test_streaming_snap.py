"""streaming_snap_probe drained equals the batch snap_to_ways on
the same arrived points, across two arrival batches (stateless
append mode, restart between batches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.operators.graph import synth_ways
from osmgraft.operators.linecover import snap_cell_index, snap_to_ways
from osmgraft.streaming.tiles import streaming_snap_probe
from osmgraft.suite import doc_points, load


def _snap_set(df):
    return {
        (r["doc_id"], r["way_id"], r["seg_idx"], r["dist2"])
        for r in df.collect()
    }


def test_streaming_snap_equals_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").select("doc_id")
    ways = synth_ways(docs, docs.count()).where(
        F.col("way_id") % 8 == 0
    )
    nodes = doc_points(spark, sf)
    index = snap_cell_index(ways, nodes, shift=20).localCheckpoint()

    def _pts(lo, hi):
        return nodes.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )

    pdir = str(tmp_path / "pts")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _pts(0, 40).coalesce(1).write.mode("overwrite").parquet(pdir)

    def drain():
        q = (
            streaming_snap_probe(spark, pdir, index, shift=20)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["doc_id"], r["way_id"], r["seg_idx"], r["dist2"])
            for r in spark.read.parquet(out).collect()
        }

    first = drain()
    want1 = _snap_set(snap_to_ways(_pts(0, 40), ways, nodes, shift=20))
    assert first == want1
    assert len(first) > 0

    # second arrival batch: only the new points produce rows
    _pts(40, 90).coalesce(1).write.mode("append").parquet(pdir)
    both = drain()
    want2 = _snap_set(snap_to_ways(_pts(0, 90), ways, nodes, shift=20))
    assert both == want2
    assert len(both) > len(first)
