"""streaming_viterbi drained equals batch viterbi_map_match on the
same traces, with steps split across two arrival batches (trace
state persists across the restart) and out-of-order arrival."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.operators.graph import synth_ways
from osmgraft.operators.linecover import (
    snap_cell_index,
    viterbi_map_match,
)
from osmgraft.streaming.viterbi import streaming_viterbi
from osmgraft.suite import doc_points, load
from osmgraft.suite_graph import _synth_traces

N_STEPS = 5


def test_streaming_viterbi_equals_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").select("doc_id")
    ways = synth_ways(docs, docs.count())
    nodes = doc_points(spark, sf)
    traces = _synth_traces(nodes).localCheckpoint()

    want = {
        (r["trace_id"], r["total_cost"], r["path"])
        for r in viterbi_map_match(
            traces, ways, nodes, n_steps=N_STEPS, k=3, shift=20
        ).collect()
    }
    assert len(want) > 3

    index = snap_cell_index(ways, nodes, shift=20).localCheckpoint()

    pdir = str(tmp_path / "pts")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: steps 3,4 FIRST (out of order); batch 2: steps 0-2
    traces.where(F.col("step") >= 3).coalesce(1).write.mode(
        "overwrite"
    ).parquet(pdir)

    def drain():
        q = (
            streaming_viterbi(
                spark, pdir, index, n_steps=N_STEPS, k=3, shift=20
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        try:
            return {
                (r["trace_id"], r["total_cost"], r["path"])
                for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return set()

    first = drain()
    assert first == set()  # nothing completes without steps 0-2

    traces.where(F.col("step") < 3).coalesce(1).write.mode(
        "append"
    ).parquet(pdir)
    both = drain()  # fresh query instance = restart from checkpoint
    assert both == want
