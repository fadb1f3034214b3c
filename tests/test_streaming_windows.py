"""Watermarked windowed aggregation: in-window late events update
their window; events beyond the watermark are dropped; append mode
emits each window exactly once when finalized."""

from __future__ import annotations

from datetime import datetime

from osmgraft.streaming.windows import run_to_sink, windowed_cell_activity


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, cell long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def T(m, s=0):
    return datetime(2024, 1, 1, 10, m, s)


def test_windowed_activity_with_watermark(spark, tmp_path):
    events = tmp_path / "events"
    events.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: events in windows [10:00,10:10) and [10:10,10:20),
    # plus max event time 10:45 to push the watermark (20 min) to
    # 10:25 — finalizing both early windows
    _write_batch(spark, str(events / "b1"), [
        (1, T(1), 100, 1.0),
        (2, T(5), 100, 2.0),
        (3, T(12), 200, 5.0),
        (4, T(45), 300, 1.0),  # watermark driver
    ])
    agg = windowed_cell_activity(spark, str(events))
    q = run_to_sink(agg, out, ckpt)
    q.awaitTermination(120)

    got = {
        (r.window_start.minute, r.cell): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # finalized windows emitted; the 10:40 window is still open
    assert got[(0, 100)] == (2, 3.0)
    assert got[(10, 200)] == (1, 5.0)
    assert (40, 300) not in got

    # batch 2: an event at 10:03 is LATER than the watermark
    # (10:25) — dropped, the already-emitted window is not revised;
    # a 10:50 event keeps the 10:40 window open
    _write_batch(spark, str(events / "b2"), [
        (5, T(3), 100, 100.0),   # too late: dropped
        (6, T(50), 300, 2.0),
    ])
    q2 = run_to_sink(windowed_cell_activity(spark, str(events)), out, ckpt)
    q2.awaitTermination(120)
    got2 = {
        (r.window_start.minute, r.cell): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    assert got2[(0, 100)] == (2, 3.0)  # unchanged — late data dropped

    # batch 3: push event time to 11:30 -> watermark 11:10 ->
    # the 10:40 and 10:50 windows finalize
    _write_batch(spark, str(events / "b3"), [
        (7, datetime(2024, 1, 1, 11, 30), 300, 0.0),
    ])
    q3 = run_to_sink(windowed_cell_activity(spark, str(events)), out, ckpt)
    q3.awaitTermination(120)
    got3 = {
        (r.window_start.minute, r.cell): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    assert got3[(40, 300)] == (1, 1.0)
    assert got3[(50, 300)] == (1, 2.0)


def test_streaming_flagship_counts_match_batch(spark, tmp_path):
    """The flagship pipeline under structured streaming: per-region
    windowed page counts over a file-fed pages stream must equal
    the batch flagship's counts over the same files."""
    from pyspark.sql import functions as F

    from osmgraft.operators.flagship import flagship_assign
    from osmgraft.pages import synth_pages
    from osmgraft.streaming.windows import streaming_flagship

    pages_dir = tmp_path / "pages"
    synth_pages(spark, 4000, partitions=4).write.parquet(
        str(pages_dir / "b1")
    )

    batch = flagship_assign(
        spark.read.option("recursiveFileLookup", "true").parquet(
            str(pages_dir)
        )
    )
    want = {
        r.region: r.n for r in batch.groupBy("region").agg(
            F.count("*").alias("n")
        ).collect()
    }

    q = (
        streaming_flagship(spark, str(pages_dir), window="1 hour")
        .writeStream.format("memory")
        .queryName("flag_stream")
        .outputMode("complete")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        got_rows = spark.sql(
            "SELECT region, SUM(n_pages) AS n FROM flag_stream "
            "GROUP BY region"
        ).collect()
    finally:
        q.stop()
    got = {r.region: r.n for r in got_rows}
    assert got == want
    assert sum(want.values()) > 0
