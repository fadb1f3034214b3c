"""Structured Streaming change application: exactly-once file
processing, newest-wins within batch, tombstone deletes, resume via
stream checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.streaming.changes import apply_change_stream


def test_change_stream_applies_batches(spark, tmp_path):
    base_path = str(tmp_path / "base")
    changes = tmp_path / "changes"
    changes.mkdir()
    ckpt = str(tmp_path / "ckpt")

    spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("orig "), F.col("id").cast("string")).alias(
            "text"
        ),
    ).write.mode("overwrite").parquet(base_path)

    def change_file(name, rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, deleted boolean, seq long"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(changes / name)
        )

    # batch 1: update 5, delete 7, insert 1000; a stale (seq 1) and
    # a newer (seq 2) change to doc 5 — newest wins
    change_file("c1", [
        (5, "stale", False, 1),
        (5, "upd5", False, 2),
        (7, None, True, 2),
        (1000, "new1000", False, 2),
    ])
    q = apply_change_stream(spark, base_path, str(changes), ckpt)
    q.awaitTermination(120)

    t = spark.read.parquet(base_path)
    got = {r.doc_id: r.text for r in t.collect()}
    assert got[5] == "upd5"
    assert 7 not in got
    assert got[1000] == "new1000"
    assert len(got) == 100  # 100 - 1 deleted + 1 inserted

    # batch 2 arrives later; restart from the same checkpoint —
    # c1 must NOT be reapplied (doc 7 stays deleted, no dup work)
    change_file("c2", [
        (1000, None, True, 3),
        (8, "upd8", False, 3),
    ])
    q2 = apply_change_stream(spark, base_path, str(changes), ckpt)
    q2.awaitTermination(120)
    got2 = {r.doc_id: r.text for r in spark.read.parquet(base_path).collect()}
    assert got2[8] == "upd8"
    assert 1000 not in got2
    assert 7 not in got2
    assert len(got2) == 99


def test_streaming_asof_equals_batch(spark, tmp_path):
    """streaming_asof_enrich drained over two arrival batches
    equals merge.asof_join on all arrived events — including the
    NULL-payload (no prior version) rows — and appending events
    after a restart only adds rows for the new arrivals."""
    from osmgraft.operators.merge import asof_join
    from osmgraft.streaming.changes import streaming_asof_enrich
    from osmgraft.suite import load

    sf = "/root/testdata/sf0.001"
    ev = load(spark, sf, "events").select(
        "event_id", "user_id", "ts"
    )
    vers = (
        ev.where(F.col("event_id") % 5 == 0)
        .select(
            "user_id",
            F.to_date("ts").cast("timestamp").alias("vts"),
            F.expr("datediff(to_date(ts), DATE'1970-01-01')")
            .cast("long")
            .alias("version_day"),
        )
        .distinct()
        .localCheckpoint()
    )

    def _ev(lo, hi):
        return ev.where(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )

    edir = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _ev(0, 150).coalesce(1).write.mode("overwrite").parquet(edir)

    def drain():
        q = (
            streaming_asof_enrich(
                spark, edir, vers, "user_id", "ts", "vts",
                ["version_day"],
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["event_id"], r["version_day"])
            for r in spark.read.parquet(out).collect()
        }

    def want(hi):
        return {
            (r["event_id"], r["version_day"])
            for r in asof_join(
                _ev(0, hi), vers, "user_id", "ts", "vts",
                ["version_day"],
            ).collect()
        }

    first = drain()
    assert first == want(150) and len(first) == 150
    # some events must predate every version row (NULL payload)
    assert any(v is None for _, v in first)

    _ev(150, 300).coalesce(1).write.mode("append").parquet(edir)
    assert drain() == want(300)
