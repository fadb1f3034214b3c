"""applyInPandasWithState: cumulative per-cell state carries across
micro-batches and stream restarts (checkpointed)."""

from __future__ import annotations

from datetime import datetime

from osmgraft.streaming.stateful import cell_lifetime_stats


def T(m):
    return datetime(2024, 1, 1, 10, m)


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, cell long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _drain(spark, events_dir, out_dir, ckpt):
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)

    def sink(batch, _bid):
        batch.write.mode("append").parquet(out_dir)

    q = (
        cell_lifetime_stats(spark, events_dir)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return {
            r.cell: (r.n_events, r.sum_value, r.first_seen, r.last_seen)
            for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        return {}  # no batches emitted this run


def test_stateful_cumulative_across_restarts(spark, tmp_path):
    events = tmp_path / "events"
    events.mkdir()
    ckpt = str(tmp_path / "ckpt")

    _write(spark, str(events / "b1"), [
        (1, T(1), 100, 1.0),
        (2, T(5), 100, 2.0),
        (3, T(3), 200, 5.0),
    ])
    got = _drain(spark, str(events), str(tmp_path / "o1"), ckpt)
    assert got[100] == (2, 3.0, T(1), T(5))
    assert got[200] == (1, 5.0, T(3), T(3))

    # restart with a new batch: state resumes from the checkpoint,
    # counts are CUMULATIVE, first_seen survives
    _write(spark, str(events / "b2"), [
        (4, T(9), 100, 10.0),
    ])
    got2 = _drain(spark, str(events), str(tmp_path / "o2"), ckpt)
    assert got2[100] == (3, 13.0, T(1), T(9))
    assert 200 not in got2  # untouched cells not re-emitted
