"""Exactly-once across a mid-stream kill: the streaming flagship is
stopped after some (but not all) micro-batches committed, resumed
from its checkpoint, and the final windowed counts must equal the
batch pipeline over the same files — no lost and no duplicated
pages despite the restart (round-2 VERDICT task 8: the manifest
resume story composed with streaming_flagship)."""

from __future__ import annotations

import datetime
import time

from pyspark.sql import functions as F


def _batch_truth(spark, pages_dir, window="1 hour"):
    """The streaming_flagship transformation in batch mode: same
    geocode -> cell -> PIP stages, same tumbling window."""
    from osmgraft.fixtures import fixture_polyset
    from osmgraft.operators.spatial import assign_regions, with_cell
    from osmgraft.pages import geocode

    pages = spark.read.option("recursiveFileLookup", "true").parquet(
        str(pages_dir)
    )
    assigned = assign_regions(
        with_cell(geocode(pages)), fixture_polyset(),
        prefilter_bbox=False,
    )
    return (
        assigned.withColumn("ts", F.col("warc_ts"))
        .groupBy(F.window("ts", window).alias("w"), "region")
        .agg(F.count("*").cast("long").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            "region",
            "n_pages",
        )
    )


def test_streaming_flagship_kill_resume(spark, tmp_path):
    from osmgraft.pages import PAGES_SCHEMA, synth_pages
    from osmgraft.streaming.windows import streaming_flagship

    pages_dir = tmp_path / "pages"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # 16 part files -> 4 micro-batches at maxFilesPerTrigger=4
    synth_pages(spark, 4000, partitions=16).write.parquet(
        str(pages_dir / "b1")
    )

    def sink(df, trigger_kwargs):
        return (
            df.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    # phase 1: start, let >=1 micro-batch commit, then KILL
    q1 = sink(
        streaming_flagship(spark, str(pages_dir), window="1 hour"),
        {"processingTime": "0 seconds"},
    )
    deadline = time.time() + 120
    committed = 0
    while time.time() < deadline:
        p = q1.lastProgress
        if p is not None and p["batchId"] >= 1:
            committed = p["batchId"]
            break
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination(60)
    assert committed >= 1, "no batch committed before the kill"

    # watermark driver: one far-future page so every data window
    # finalizes on resume (its own window stays open and is
    # excluded from the comparison). It must survive the geocode ->
    # PIP stages (the watermark column is computed after them), so
    # synthesize it with the regular pages generator at a huge
    # doc_id (warc_ts = base + id*17s ≈ year 2029).
    import numpy as np

    from osmgraft.pages import _pages_pdf

    far = datetime.datetime(2029, 1, 1)

    def write_driver(doc_id: int, sub: str) -> None:
        pdf = _pages_pdf(np.array([doc_id], dtype="int64"))
        spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(
            1
        ).write.parquet(str(pages_dir / sub))

    write_driver(10_000_000, "b2")

    # phase 2: resume from the checkpoint, drain everything
    q2 = sink(
        streaming_flagship(spark, str(pages_dir), window="1 hour"),
        {"availableNow": True},
    )
    q2.awaitTermination(300)

    # the batch that CONSUMES the driver raises the watermark at
    # its end; emission of the windows it finalizes happens in the
    # NEXT batch — feed one more driver row and drain again
    write_driver(10_001_000, "b3")
    q3 = sink(
        streaming_flagship(spark, str(pages_dir), window="1 hour"),
        {"availableNow": True},
    )
    q3.awaitTermination(300)

    got_df = spark.read.parquet(out).filter(
        F.col("window_start") < F.lit(far)
    )
    # exactly-once: no (window, region) emitted twice across the
    # restart (the file sink's transaction log must dedupe the
    # killed batch)
    dupes = (
        got_df.groupBy("window_start", "region")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dupes == 0

    want_df = _batch_truth(spark, pages_dir).filter(
        F.col("window_start") < F.lit(far)
    )
    got = {
        (r.window_start, r.region): r.n_pages
        for r in got_df.collect()
    }
    want = {
        (r.window_start, r.region): r.n_pages
        for r in want_df.collect()
    }
    assert got == want
    # most (not all) pages geocode: unmatched ones drop out before
    # the windowed aggregate, identically in both modes
    assert sum(want.values()) > 3000
