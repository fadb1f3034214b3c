"""C1/C2 as Structured Streaming: incremental change-file
application (the osmupdate/osmchange replication pattern,
osmupdate.c:585-605 + osmchange.c:1485-1659) re-expressed as a file
stream -> foreachBatch MERGE loop.

The reference polls a server for minutely/hourly/daily .osc change
sets and cascades them through osmconvert merges. Here the change
feed is a directory of parquet change batches (the network fetch is
out of scope); Structured Streaming's file source gives exactly-once
per-file processing with checkpointed progress — the streaming
analogue of osmupdate's timestamp cascade — and each micro-batch is
applied with the same tombstone-aware upsert as the batch operator
(operators/merge.change_apply), writing through the snapshot store.

Scale notes: the base table is rewritten per micro-batch in this
parquet stand-in; on Iceberg the same foreachBatch body becomes
MERGE INTO (metadata-only for untouched files). State lives in the
stream checkpoint (processed files) + the table itself — no
unbounded in-memory state, no watermark needed (change feeds are
keyed upserts, not event-time windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import change_apply

CHANGE_SCHEMA = (
    "doc_id long, text string, deleted boolean, seq long"
)


def apply_change_stream(
    spark: SparkSession,
    base_path: str,
    changes_dir: str,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
):
    """Start a stream applying change batches from `changes_dir` to
    the snapshot at `base_path`. Returns the StreamingQuery.

    Within a micro-batch, later files win per key (ordered by the
    `seq` column — the reference's 'newest change wins' rule across
    its cascade, osmconvert.c:11158-11164)."""
    keys = key_cols or ["doc_id"]

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        # change sets arrive as per-batch subdirectories (the
        # osmupdate cascade shape): look beneath them
        .option("recursiveFileLookup", "true")
        .parquet(changes_dir)
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window, functions as F

        if batch.isEmpty():
            return
        sp = batch.sparkSession
        # newest change per key within the micro-batch
        w = Window.partitionBy(*keys).orderBy(F.col("seq").desc())
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "seq")
        )
        base = sp.read.parquet(base_path)
        merged = change_apply(base, latest, keys)
        # write-then-swap (the parquet stand-in for an Iceberg
        # snapshot commit: readers see old or new, never partial)
        tmp = base_path.rstrip("/") + f"__stage_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        final = sp.read.parquet(tmp)
        final.write.mode("overwrite").parquet(base_path)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_asof_enrich(
    spark: SparkSession,
    events_dir: str,
    versions: DataFrame,
    key: str,
    ts_col: str,
    right_ts: str,
    payload_cols: list[str],
    schema: str = "event_id long, user_id long, ts timestamp",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Continuous twin of operators/merge.asof_join (q126): every
    STREAMED event is enriched with the dimension version in force
    at its event time — the latest right row with right_ts <= ts
    per key.

    The batch sweep needs a per-key total order, which a stream
    cannot hold statelessly, so the STATIC dimension is packed to
    ONE row per key carrying its whole version history as an array
    sorted by right_ts (bounded by versions-per-key, never by the
    corpus), BROADCAST into a stream-static left equi-join, and
    the as-of pick is an in-row array_max over the <=-ts prefix.
    Stateless by construction: append mode, no watermark, no state
    store; restarts are safe because re-processing a file yields
    identical rows (idempotent-sink discipline). Events whose key
    has no prior version keep NULL payloads, same as the batch
    operator. Duplicate (key, right_ts) version rows are resolved
    by the lexicographically greatest payload — the same class of
    tie the batch sweep leaves to sort order.

    Drained results equal merge.asof_join on the arrived events
    exactly (tested)."""
    from pyspark.sql import functions as F

    packed = versions.groupBy(F.col(key)).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(right_ts).alias("_vts"),
                    *[F.col(c) for c in payload_cols],
                )
            )
        ).alias("_vers")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    ev_cols = stream.columns
    joined = stream.join(F.broadcast(packed), on=key, how="left")
    pick = F.array_max(
        F.filter("_vers", lambda v: v["_vts"] <= F.col(ts_col))
    )
    return joined.select(
        *ev_cols, *[pick[c].alias(c) for c in payload_cols]
    )
