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
