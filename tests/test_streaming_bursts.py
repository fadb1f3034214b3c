"""Streaming burst collapse: emitted rows == batch collapse_bursts
minus each key's final (still-open) burst, including across a
two-batch split and a checkpointed restart."""

from __future__ import annotations

from datetime import datetime, timedelta

from osmgraft.operators.events import collapse_bursts
from osmgraft.streaming.bursts import burst_monitor

W = 60  # seconds

T0 = datetime(2024, 1, 1)


def _us(s):
    return int((T0 + timedelta(seconds=s)).timestamp()) * 1_000_000


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, us long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _drain(spark, events_dir, out_dir, ckpt):
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)

    def sink(batch, _bid):
        batch.write.mode("append").parquet(out_dir)

    q = (
        burst_monitor(spark, events_dir, window_s=W)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return {
            (r.user_id, r.event_type, r.burst): (
                r.first_us, r.last_us, r.n_raw,
            )
            for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        return {}


def test_streaming_bursts_closed_equals_batch(spark, tmp_path):
    events = tmp_path / "events"
    events.mkdir()
    ckpt = str(tmp_path / "ckpt")
    # u1 click: bursts [0..119], [300..310], open [700]
    # u1 view: single open burst
    # u2 click: [0,30], open [500]
    rows1 = [
        (1, "click", 1, _us(0)), (1, "click", 2, _us(59)),
        (1, "click", 3, _us(119)),
        (1, "view", 4, _us(10)),
        (2, "click", 5, _us(0)), (2, "click", 6, _us(30)),
    ]
    rows2 = [
        (1, "click", 7, _us(300)), (1, "click", 8, _us(310)),
        (1, "click", 9, _us(700)),
        (2, "click", 10, _us(500)),
    ]
    _write(spark, str(events / "b1"), rows1)
    got1 = _drain(
        spark, str(events), str(tmp_path / "out"), ckpt
    )
    # nothing closed yet within batch 1 for u1 click? burst 1 spans
    # 0..119 and stays open until an over-window event arrives
    assert got1 == {}
    _write(spark, str(events / "b2"), rows2)
    got2 = _drain(
        spark, str(events), str(tmp_path / "out"), ckpt
    )
    assert got2[(1, "click", 1)] == (_us(0), _us(119), 3)
    assert got2[(1, "click", 2)] == (_us(300), _us(310), 2)
    assert got2[(2, "click", 1)] == (_us(0), _us(30), 2)
    assert (1, "view", 1) not in got2  # still open
    assert (1, "click", 3) not in got2  # still open

    # batch equivalence: streaming closed set == batch minus each
    # key's last burst
    all_rows = rows1 + rows2
    df = spark.createDataFrame(
        [
            (eid, datetime.utcfromtimestamp(us // 1_000_000), u, t)
            for (u, t, eid, us) in all_rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    batch = {
        (r.user_id, r.event_type, r.burst): (
            r.first_us, r.last_us, r.n_raw,
        )
        for r in collapse_bursts(df, window_s=W).collect()
    }
    last = {}
    for (u, t, b) in batch:
        last[(u, t)] = max(last.get((u, t), 0), b)
    expected = {
        k: v for k, v in batch.items() if k[2] != last[(k[0], k[1])]
    }
    assert got2 == expected
