"""Stream-stream watermarked interval join (streaming/joins.py):
inner-join output over an availableNow drain equals the batch
interval join of everything that arrived — same-batch matches,
cross-batch matches inside the tolerance, non-matches outside it —
and the match set is complete across a checkpoint restart."""

from __future__ import annotations

import datetime as dt

from osmgraft.streaming.joins import (
    batch_interval_join,
    streaming_interval_join,
)

T0 = dt.datetime(2025, 3, 1, 12, 0, 0)


def _t(s: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


TRACES = [
    # (user, ts_offset_s, cell)
    ("a", 0, 100),
    ("a", 1200, 101),
    ("b", 30, 200),
    ("c", 500, 300),  # no event for c
]
EVENTS = [
    # (user, ts_offset_s, event_type)
    ("a", 60, "checkin"),     # matches a@0 (60s) not a@1200 (1140s)
    ("a", 1100, "photo"),     # matches a@1200 (100s) not a@0
    ("b", 700, "checkin"),    # outside 600s of b@30 -> no match
    ("d", 10, "checkin"),     # no trace for d
]


def _write_traces(spark, path, rows):
    spark.createDataFrame(
        [(u, _t(s), c) for u, s, c in rows],
        "user string, ts timestamp, cell long",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(u, _t(s), e) for u, s, e in rows],
        "user string, ts timestamp, event_type string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _drain(spark, tdir, edir, out_dir, ckpt):
    def sink(batch, _bid):
        batch.write.mode("append").parquet(out_dir)

    q = (
        streaming_interval_join(spark, tdir, edir, tolerance_s=600)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        return sorted(
            (r.user, r.trace_ts, r.cell, r.event_ts, r.event_type)
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:
        return []


def _batch_want(spark, traces, events):
    t = spark.createDataFrame(
        [(u, _t(s), c) for u, s, c in traces],
        "user string, ts timestamp, cell long",
    )
    e = spark.createDataFrame(
        [(u, _t(s), ev) for u, s, ev in events],
        "user string, ts timestamp, event_type string",
    )
    return sorted(
        (r.user, r.trace_ts, r.cell, r.event_ts, r.event_type)
        for r in batch_interval_join(t, e, tolerance_s=600).collect()
    )


def test_interval_join_matches_batch(spark, tmp_path):
    tdir, edir = tmp_path / "traces", tmp_path / "events"
    tdir.mkdir(), edir.mkdir()
    _write_traces(spark, str(tdir / "b1"), TRACES)
    _write_events(spark, str(edir / "b1"), EVENTS)

    got = _drain(
        spark,
        str(tdir),
        str(edir),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    want = _batch_want(spark, TRACES, EVENTS)
    assert got == want
    # sanity on the fixture: both match directions exercised,
    # tolerance excludes b, unmatched users drop out
    assert [(u, e) for u, _, _, _, e in want] == [
        ("a", "checkin"),
        ("a", "photo"),
    ]


def test_interval_join_across_restart(spark, tmp_path):
    """late-arriving partner rows still match after a full stop +
    checkpoint resume: the buffered side lives in join state."""
    tdir, edir = tmp_path / "traces", tmp_path / "events"
    tdir.mkdir(), edir.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # round 1: traces only -> zero output, state buffers them
    _write_traces(spark, str(tdir / "b1"), TRACES)
    _write_events(spark, str(edir / "b1"), [("z", 0, "noop")])
    got1 = _drain(spark, str(tdir), str(edir), out, ckpt)
    assert got1 == []

    # round 2 (new drain, same checkpoint): events arrive late
    _write_events(spark, str(edir / "b2"), EVENTS)
    got2 = _drain(spark, str(tdir), str(edir), out, ckpt)
    want = _batch_want(spark, TRACES, EVENTS)
    assert got2 == want
