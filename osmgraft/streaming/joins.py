"""Stream-stream joins: the last Structured Streaming join shape
the engine didn't yet exercise (stream-static broadcast joins live
in streaming/changes.py and streaming/tiles.py).

`streaming_interval_join` correlates two live streams — e.g. a GPS
trace-point stream and an event stream — per user within a time
tolerance, as a watermarked INNER equi-join with a range predicate.
Spark buffers each side's rows in join state only until the other
side's watermark passes `ts + tolerance`, so state is bounded by
(arrival skew + tolerance) x input rate, never by stream length —
the 100-TB-day shape. With an availableNow drain the inner-join
output equals the batch join of everything that arrived (inner
joins emit exactly the matched pairs; the watermark only bounds
state, it drops nothing that still has a partner in-flight) —
asserted in tests/test_streaming_joins.py, including across a
checkpoint restart.

Reference parity: osmctools is batch-only; this extends C1-C3's
change-stream role to correlating two live feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TRACE_SCHEMA = "user string, ts timestamp, cell long"
EVENT_SCHEMA = "user string, ts timestamp, event_type string"


def streaming_interval_join(
    spark: SparkSession,
    traces_dir: str,
    events_dir: str,
    tolerance_s: int = 600,
    watermark_s: int = 60,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """(user, trace_ts, cell, event_ts, event_type) for every
    (trace point, event) pair of the same user with
    |event_ts - trace_ts| <= tolerance_s."""
    traces = (
        spark.readStream.schema(TRACE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(traces_dir)
        .withWatermark("ts", f"{watermark_s} seconds")
        .select(
            F.col("user"),
            F.col("ts").alias("trace_ts"),
            F.col("cell"),
        )
    )
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
        .withWatermark("ts", f"{watermark_s} seconds")
        .select(
            F.col("user").alias("e_user"),
            F.col("ts").alias("event_ts"),
            F.col("event_type"),
        )
    )
    tol = F.expr(f"INTERVAL {int(tolerance_s)} SECONDS")
    joined = traces.join(
        events,
        (F.col("user") == F.col("e_user"))
        & (F.col("event_ts") >= F.col("trace_ts") - tol)
        & (F.col("event_ts") <= F.col("trace_ts") + tol),
        "inner",
    )
    return joined.select(
        "user", "trace_ts", "cell", "event_ts", "event_type"
    )


def batch_interval_join(
    traces: DataFrame, events: DataFrame, tolerance_s: int = 600
) -> DataFrame:
    """Batch twin (same columns) — the oracle for the streamed
    result, and the operator users run over stored history."""
    t = traces.select(
        "user", F.col("ts").alias("trace_ts"), "cell"
    )
    e = events.select(
        F.col("user").alias("e_user"),
        F.col("ts").alias("event_ts"),
        "event_type",
    )
    tol = F.expr(f"INTERVAL {int(tolerance_s)} SECONDS")
    return (
        t.join(
            e,
            (F.col("user") == F.col("e_user"))
            & (F.col("event_ts") >= F.col("trace_ts") - tol)
            & (F.col("event_ts") <= F.col("trace_ts") + tol),
            "inner",
        ).select(
            "user", "trace_ts", "cell", "event_ts", "event_type"
        )
    )
