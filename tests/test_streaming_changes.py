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
