"""Continuous tile maintenance: a change stream (the osmupdate
minutely/daily .osc cascade, osmupdate.c:585-605) drives the
incremental tile refresh (operators/tiles.tile_rollup_incremental
semantics) through the manifest commit protocol
(manifest.refresh_committed) — the full north_rule loop: streaming
ingest -> affected-bucket refresh -> lineage-stamped commits,
resumable at every layer.

Exactly-once across kills, by construction:

- The file stream checkpoint marks a micro-batch done only after
  the foreachBatch body returns, so a killed batch re-runs whole.
- Inside the body the ORDER is load-bearing: tiles are refreshed
  BEFORE the points snapshot is swapped. The affected-bucket set
  needs the OLD positions of moved keys; refreshing first means a
  re-run still sees them. After the swap, a re-run recomputes the
  same post-change world (change_apply is idempotent) and
  refresh_committed skips buckets already committed under the
  batch's epoch — so every kill point converges to the same state.
- Epoch = the micro-batch id: the stream checkpoint guarantees
  batch ids are stable across restarts for the same input files.

Scale: per batch, work is O(|changes| + rows-in-affected-buckets),
never O(corpus); the tile store rewrite is partition-pruned by the
manifest bucket filter exactly as in the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TILE_CHANGE_SCHEMA = (
    "doc_id long, lat_i long, lon_i long, deleted boolean, seq long"
)


def tile_maintenance_stream(
    spark: SparkSession,
    pts_path: str,
    tiles_out: str,
    changes_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
):
    """Start the maintenance stream; returns the StreamingQuery.

    `pts_path`: current points snapshot (doc_id, lat_i, lon_i).
    `tiles_out`: manifest-committed tile store (seed it with
    manifest.run_resumable over the initial rollup).
    `changes_dir`: parquet change batches (TILE_CHANGE_SCHEMA),
    later `seq` wins per key within a batch."""
    from pyspark.sql import Window, functions as F

    from ..manifest import refresh_committed, with_bucket
    from ..operators.merge import change_apply
    from ..operators.spatial import with_cell
    from ..operators.tiles import tile_rollup

    stream = (
        spark.readStream.schema(TILE_CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .option("recursiveFileLookup", "true")
        .parquet(changes_dir)
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sp = batch.sparkSession
        w = Window.partitionBy("doc_id").orderBy(F.col("seq").desc())
        latest = with_cell(
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "seq")
        )
        base = with_cell(sp.read.parquet(pts_path))
        new_pts = change_apply(base, latest, ["doc_id"])

        old_b = with_bucket(
            base.join(
                latest.select("doc_id"), "doc_id", "left_semi"
            ),
            "cell",
            n_buckets,
        ).select("bucket")
        new_b = with_bucket(
            latest.filter(~F.col("deleted")), "cell", n_buckets
        ).select("bucket")
        affected = sorted(
            r.bucket
            for r in old_b.unionByName(new_b).distinct().collect()
        )

        tiles = with_bucket(tile_rollup(new_pts), "cell", n_buckets)
        # 1) refresh tiles (idempotent per epoch) ...
        refresh_committed(
            tiles, tiles_out, affected,
            input_lineage=f"batch-{batch_id}",
        )
        # 2) ... THEN swap the points snapshot (see module
        # docstring: this order makes every kill point convergent)
        tmp = pts_path.rstrip("/") + f"__stage_{batch_id}"
        new_pts.drop("cell").write.mode("overwrite").parquet(tmp)
        sp.read.parquet(tmp).write.mode("overwrite").parquet(
            pts_path
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_corridor_probe(
    spark: SparkSession,
    points_dir: str,
    cover: DataFrame,
    shift: int = 20,
    radius: int = 1,
    schema: str = "doc_id long, lat_i long, lon_i long",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of operators/linecover.cell_corridor_join:
    points ARRIVING AS A STREAM (geotagged pages, probe vehicles)
    are matched against a STATIC route-cover corridor — geofence
    alerting as a stream-static join.

    Stateless by construction so it runs in append mode with no
    watermark: the static side is the dilated cover (bounded,
    broadcast), the stream side computes its grid cell IN-ROW, and
    the inner equi-join emits (way_id, doc_id, cell) the moment a
    point lands in the corridor. Restarts are safe because there
    is no state to rebuild — re-processing a file yields the same
    rows (idempotent-sink discipline, the manifest-upsert rule).

    The drained verdicts equal the batch corridor join on the same
    points exactly (tested)."""
    from ..operators.linecover import dilate_cover, point_cell_col

    dil = dilate_cover(cover, shift, radius)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(points_dir)
    )
    pts = stream.select(
        "doc_id",
        point_cell_col("lat_i", "lon_i", shift).alias("cell"),
    )
    from pyspark.sql import functions as F

    return pts.join(F.broadcast(dil), "cell").select(
        "way_id", "doc_id", "cell"
    )


def streaming_snap_probe(
    spark: SparkSession,
    points_dir: str,
    cell_index: DataFrame,
    shift: int = 20,
    schema: str = "doc_id long, lat_i long, lon_i long",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of operators/linecover.snap_to_ways: points
    arriving as a stream are map-matched to the nearest static way
    segment within one cell side — stateless append mode, so the
    per-point argmin cannot be a window; instead the static side is
    operators/linecover.snap_cell_index (cell -> bounded candidate
    segment list) and the argmin runs IN-ROW as a higher-order
    aggregate fold over the list, comparing (dist2, way_id,
    seg_idx) structs with least().  Scoring is the same pinned
    IEEE double op sequence as the batch operator, so drained
    results equal snap_to_ways on the same points exactly
    (tested).  The stream side computes its cell in-row and makes
    ONE broadcast equi-join; no state, no watermark, restart-safe
    by idempotence."""
    from pyspark.sql import functions as F

    from ..operators.linecover import point_cell_col

    s = 1 << shift
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(points_dir)
    )
    pts = stream.select(
        "doc_id",
        F.col("lon_i").alias("px"),
        F.col("lat_i").alias("py"),
        point_cell_col("lat_i", "lon_i", shift).alias("cell"),
    )
    joined = pts.join(F.broadcast(cell_index), "cell")

    def score(e):
        d = lambda c: c.cast("double")  # noqa: E731
        apx = d(F.col("px") - e["ax"])
        apy = d(F.col("py") - e["ay"])
        abx = d(e["bx"] - e["ax"])
        aby = d(e["by"] - e["ay"])
        bpx = d(F.col("px") - e["bx"])
        bpy = d(F.col("py") - e["by"])
        dot = apx * abx + apy * aby
        len2 = abx * abx + aby * aby
        ap2 = apx * apx + apy * apy
        bp2 = bpx * bpx + bpy * bpy
        return (
            F.when((dot <= 0) | (len2 == 0), ap2)
            .when(dot >= len2, bp2)
            .otherwise(ap2 - (dot / len2) * dot)
        )

    init = F.struct(
        F.lit(float("inf")).alias("dist2"),
        F.lit(2**63 - 1).cast("long").alias("way_id"),
        F.lit(2**63 - 1).cast("long").alias("seg_idx"),
    )
    best = F.aggregate(
        F.col("segs"),
        init,
        lambda acc, e: F.least(
            acc,
            F.struct(
                score(e).alias("dist2"),
                e["way_id"].alias("way_id"),
                e["seg_idx"].alias("seg_idx"),
            ),
        ),
    )
    return (
        joined.withColumn("_best", best)
        .where(F.col("_best.dist2") <= F.lit(float(s) * float(s)))
        .select(
            "doc_id",
            F.col("_best.way_id").alias("way_id"),
            F.col("_best.seg_idx").alias("seg_idx"),
            F.col("_best.dist2").alias("dist2"),
        )
    )


def quadtree_maintenance_stream(
    spark: SparkSession,
    pts_path: str,
    tree_out: str,
    changes_dir: str,
    checkpoint_dir: str,
    cap: int = 8,
    leaf_shift: int = 20,
    levels: int = 6,
):
    """Continuously-maintained ADAPTIVE quadtree: each change
    micro-batch refreshes only the affected leaf-cell counts
    (operators/tiles.quadtree_rollup_incremental), then the whole
    tree re-derives at count-table cost and the (small) tree
    artifact is rewritten atomically — adaptive splits/merges
    follow the hotspots as they move, while per-batch corpus work
    stays O(|changes| + affected-cell rows).

    Exactly-once across kills by the same order argument as
    tile_maintenance_stream: the tree artifact is written BEFORE
    the points snapshot swaps, so a re-run of a killed batch still
    sees the old positions it needs and converges to the same
    state (change_apply is idempotent; the tree write is a full
    overwrite of a count-table-sized output)."""
    from pyspark.sql import Window, functions as F

    from ..operators.merge import change_apply
    from ..operators.tiles import quadtree_rollup_incremental

    stream = (
        spark.readStream.schema(TILE_CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .option("recursiveFileLookup", "true")
        .parquet(changes_dir)
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sp = batch.sparkSession
        w = Window.partitionBy("doc_id").orderBy(
            F.col("seq").desc()
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "seq")
        )
        base = sp.read.parquet(pts_path)
        tree = quadtree_rollup_incremental(
            base,
            latest,
            cap=cap,
            leaf_shift=leaf_shift,
            levels=levels,
        )
        # 1) rewrite the tree artifact (count-table sized) ...
        tmp_t = tree_out.rstrip("/") + f"__stage_{batch_id}"
        tree.write.mode("overwrite").parquet(tmp_t)
        sp.read.parquet(tmp_t).write.mode("overwrite").parquet(
            tree_out
        )
        # 2) ... THEN swap the points snapshot
        new_pts = change_apply(base, latest, ["doc_id"])
        tmp_p = pts_path.rstrip("/") + f"__stage_{batch_id}"
        new_pts.write.mode("overwrite").parquet(tmp_p)
        sp.read.parquet(tmp_p).write.mode("overwrite").parquet(
            pts_path
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
