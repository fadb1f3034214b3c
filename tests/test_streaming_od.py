"""Streaming OD flow deltas (streaming/stateful.od_flow_stream):
drained over two arrival batches with a checkpoint restart, the
summed deltas equal the batch od_matrix — including trips that
span the batch boundary."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osmgraft.operators.events import od_matrix
from osmgraft.streaming.stateful import (
    OD_EVENTS_SCHEMA,
    od_flow_stream,
)


def _events(n):
    t0 = dt.datetime(2024, 1, 1)
    regions = ["A", "B", None, "C"]
    return [
        (
            i,
            i % 7,
            t0 + dt.timedelta(minutes=i),
            regions[(i * 2654435761) % 4],
        )
        for i in range(n)
    ]


def test_streaming_od_equals_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    all_rows = _events(300)

    def write(rows, mode):
        spark.createDataFrame(rows, OD_EVENTS_SCHEMA).coalesce(
            1
        ).write.mode(mode).parquet(src)

    def drain():
        stream = spark.readStream.schema(OD_EVENTS_SCHEMA).parquet(
            src
        )
        q = (
            od_flow_stream(stream)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["from_region"], r["to_region"]): r["total"]
            for r in spark.read.parquet(out)
            .groupBy("from_region", "to_region")
            .agg(F.sum("n_trips").alias("total"))
            .collect()
        }

    def batch(rows):
        df = spark.createDataFrame(rows, OD_EVENTS_SCHEMA)
        return {
            (r["from_region"], r["to_region"]): r["n_trips"]
            for r in od_matrix(df).collect()
        }

    # batch 1: the first 180 events (ts order == event_id order)
    write(all_rows[:180], "overwrite")
    assert drain() == batch(all_rows[:180])
    # batch 2: the rest — boundary-spanning trips must count once
    write(all_rows[180:], "append")
    assert drain() == batch(all_rows)
