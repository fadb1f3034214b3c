"""Streaming session windows (streaming/windows.streaming_sessions):
append-mode sessions finalize once the watermark passes session
close, and closed sessions equal the batch gaps-and-islands
sessionizer (operators/events.sessionize) on the same rows."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from osmgraft.operators.events import sessionize
from osmgraft.streaming.windows import (
    SESSION_EVENTS_SCHEMA,
    run_to_sink,
    streaming_sessions,
)


def T(h, m, s=0):
    return datetime(2024, 1, 1, h, m, s)


ROWS = [
    # user 7: two sessions (31-min gap between events 2 and 3)
    (1, T(10, 0), 7, "a", 0.0, ""),
    (2, T(10, 10), 7, "b", 0.0, ""),
    (3, T(10, 41), 7, "a", 0.0, ""),
    (4, T(10, 50), 7, "a", 0.0, ""),
    # user 8: one single-event session
    (5, T(10, 5), 8, "c", 0.0, ""),
]
WM_DRIVER = [(99, T(14, 0), 9, "z", 0.0, "")]


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SESSION_EVENTS_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def test_streaming_sessions_match_batch(spark, tmp_path):
    events = tmp_path / "events"
    events.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # the 14:00 event pushes the watermark (2 h) to 12:00, past
    # every user-7/8 session close (last close 10:50 + 30 min gap)
    _write_batch(spark, str(events / "b1"), ROWS + WM_DRIVER)

    q = run_to_sink(
        streaming_sessions(spark, str(events)), out, ckpt
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.start_epoch): (
            r.end_epoch,
            r.n_events,
            r.n_types,
        )
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.user_id, r.start_epoch): (
            r.end_epoch,
            r.n_events,
            r.n_types,
        )
        for r in sessionize(
            spark.createDataFrame(ROWS, SESSION_EVENTS_SCHEMA),
            gap_s=1800,
        ).collect()
    }
    # every closed streaming session equals its batch twin; the
    # watermark-driver's own session (user 9) is still open
    assert got == batch
    assert len(got) == 3


def test_streaming_sessions_late_event_dropped(spark, tmp_path):
    events = tmp_path / "events"
    events.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, str(events / "b1"), ROWS + WM_DRIVER)
    q = run_to_sink(
        streaming_sessions(spark, str(events)), out, ckpt
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    # an event at 10:02 is far behind the 12:00 watermark: dropped,
    # no emitted session is revised, no duplicate appears
    _write_batch(
        spark,
        str(events / "b2"),
        [(50, T(10, 2), 7, "late", 0.0, "")],
    )
    q2 = run_to_sink(
        streaming_sessions(spark, str(events)), out, ckpt
    )
    q2.awaitTermination(120)
    after = spark.read.parquet(out)
    assert after.count() == n1
    assert (
        after.filter(F.col("n_types") >= 3).count() == 0
    )  # no session absorbed the late "late" type
