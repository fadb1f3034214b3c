"""Streaming CUSUM monitor: equals the literal recurrence replayed
in Python over the full feed, and the carried statistic survives a
checkpointed restart (no double-count, no reset)."""

from __future__ import annotations

from osmgraft.streaming.cusum import cusum_monitor

TN, TD, ALLOW, THRESH = 7, 2, 1, 5  # target mean 3.5/day


def _recurrence(xs):
    s, out = 0, []
    for x in xs:
        s = max(0, s + x * TD - TN - ALLOW * TD)
        out.append((s, s > THRESH * TD))
    return out


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "event_type string, day long, n_events long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _drain(spark, counts_dir, out_dir, ckpt):
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)

    def sink(batch, _bid):
        batch.write.mode("append").parquet(out_dir)

    q = (
        cusum_monitor(spark, counts_dir, TN, TD, ALLOW, THRESH)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return {
            (r.event_type, r.day): (r.cusum_scaled, r.is_alarm)
            for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        return {}


def test_streaming_cusum_matches_recurrence(spark, tmp_path):
    counts = tmp_path / "counts"
    counts.mkdir()
    ckpt = str(tmp_path / "ckpt")
    xs_a = [3, 4, 2, 9, 11, 12, 1]  # drifts over target then drops
    xs_b = [4] * 5
    _write(
        spark,
        str(counts / "b1"),
        [("a", d, x) for d, x in enumerate(xs_a[:4])]
        + [("b", d, x) for d, x in enumerate(xs_b[:2])],
    )
    got = _drain(spark, str(counts), str(tmp_path / "o1"), ckpt)
    want = {("a", d): v for d, v in enumerate(_recurrence(xs_a[:4]))}
    want |= {("b", d): v for d, v in enumerate(_recurrence(xs_b[:2]))}
    assert got == want

    # restart: the carried S continues the SAME recurrence
    _write(
        spark,
        str(counts / "b2"),
        [("a", 4 + d, x) for d, x in enumerate(xs_a[4:])]
        + [("b", 2 + d, x) for d, x in enumerate(xs_b[2:])],
    )
    got2 = _drain(spark, str(counts), str(tmp_path / "o2"), ckpt)
    full_a = _recurrence(xs_a)
    full_b = _recurrence(xs_b)
    want2 = {("a", 4 + d): full_a[4 + d] for d in range(3)}
    want2 |= {("b", 2 + d): full_b[2 + d] for d in range(3)}
    assert got2 == want2
    # the planted drift fires an alarm somewhere in the tail
    assert any(v[1] for v in got2.values())
