"""Tile materializer: per-cell rollups and spatially-ordered tile
writes, with explicit skew handling for megacity-dense cells
(north_rule).

Skew strategy, by aggregate class:

- ALGEBRAIC aggregates (count/min/max/sum — the reference's tile
  stats): plain groupBy(cell). Spark's partial (map-side) aggregation
  already collapses each partition's contribution to one row per
  cell before the shuffle, so a hot cell costs O(#partitions)
  post-shuffle rows regardless of its row count. Salting would only
  add a shuffle.
- HOLISTIC aggregates (per-tile document lists / samples): the hot
  cell's rows DO all meet in one reducer, so we salt: stage 1 groups
  by (cell, salt) — spreading the hot cell over `salt_buckets`
  reducers — stage 2 merges the per-salt partials per cell. Salt is
  derived from doc_id, so results are deterministic and the merge
  canonicalizes order.
- JOINS on cell: AQE skew-join splitting
  (spark.sql.adaptive.skewJoin.enabled, on in session.py) handles
  hot-cell join sides at runtime.

Writes use repartitionByRange(cell) so tiles land in cell order —
file-level spatial locality (range metadata prunes cell-range scans
like the reference's grid file layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tile_rollup(pts: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Per-tile algebraic stats (the reference's tile statistics
    role). Partial aggregation makes this skew-proof — no salt."""
    return pts.groupBy(cell_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def tile_doc_lists(
    pts: DataFrame,
    cell_col: str = "cell",
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-tile document id list — a HOLISTIC aggregate, salted:
    stage 1 collects per (cell, salt) so a megacity cell spreads
    over salt_buckets reducers; stage 2 merges and sorts per cell.
    Output is deterministic (sorted ids)."""
    salted = pts.withColumn(
        "_salt", F.pmod(F.col("doc_id"), F.lit(salt_buckets))
    )
    partial = salted.groupBy(cell_col, "_salt").agg(
        F.collect_list("doc_id").alias("_ids"),
        F.count("*").cast("long").alias("_n"),
    )
    return partial.groupBy(cell_col).agg(
        F.array_sort(
            F.flatten(F.collect_list("_ids"))
        ).alias("doc_ids"),
        F.sum("_n").alias("n_docs"),
    )


def write_tiles(
    df: DataFrame,
    path: str,
    cell_col: str = "cell",
    n_files: int | None = None,
) -> None:
    """Materialize tiles in cell-range order: range repartition puts
    neighboring cells in the same files (spatial locality), so a
    cell-range predicate prunes to a few files via parquet min/max
    metadata — the columnar analogue of the reference's grid
    layout."""
    out = (
        df.repartitionByRange(n_files, F.col(cell_col))
        if n_files
        else df.repartitionByRange(F.col(cell_col))
    )
    out.sortWithinPartitions(cell_col).write.mode(
        "overwrite"
    ).parquet(path)
