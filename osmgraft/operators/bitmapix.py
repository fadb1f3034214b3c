"""Bitmap indexing over bounded categorical domains — the OLAP
bitmap-index primitive (public classic: O'Neil's Model 204 bitmap
indexes) packed into int64 words with Spark/DuckDB bit aggregates.

A bitmap index answers "which categories appear in this group" and
set-algebra questions (intersection, union, difference of groups)
with single-word bit operations instead of joins — the right shape
when the domain is bounded (hosts, languages, shard ids): the
per-group state is ONE long regardless of row count, the aggregate
is bit_or (map-side combinable), and every downstream set question
is a projection.

NOT from the reference — osmctools' statistics count one dimension;
this is the multi-membership rollup their tile stats can't answer
without a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def category_bitmaps(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    n_cats: int,
) -> DataFrame:
    """df -> one row per group with the packed membership bitmap:
    bit c set iff some row of the group has category c (categories
    must be 0 <= c < n_cats <= 63). Rows whose category falls
    outside that range contribute NOTHING (NULL to the bit_or) —
    Spark's shiftleft masks the shift count to 6 bits, so an
    unguarded out-of-range value would silently alias onto a low
    bit; exclusion is the detectable contract, and the caller
    pre-validates if absence must be an error. Output (group, bm,
    n_cats_set) — bm is bit_or(1 << c), n_cats_set its popcount,
    both exact int64 and engine-portable."""
    if not 0 < int(n_cats) <= 63:
        raise ValueError("n_cats must be in 1..63")
    return (
        df.select(
            F.col(group_col).alias("grp"),
            # F.shiftleft takes a literal bit count; a per-row
            # shift must go through the SQL function
            F.expr(
                f"CASE WHEN {cat_col} BETWEEN 0 AND {int(n_cats) - 1}"
                f" THEN shiftleft(CAST(1 AS BIGINT),"
                f" CAST({cat_col} AS INT)) END"
            ).alias("w"),
        )
        .groupBy("grp")
        .agg(
            F.coalesce(F.bit_or("w"), F.lit(0))
            .cast("long")
            .alias("bm")
        )
        .select(
            "grp",
            "bm",
            F.bit_count("bm").cast("long").alias("n_cats_set"),
        )
    )


def bitmap_overlap(
    bitmaps: DataFrame,
    pairs: DataFrame,
) -> DataFrame:
    """Set algebra between two groups' bitmaps: for every
    (grp_a, grp_b) pair, the intersection / union / difference
    POPCOUNTS via word-wise bit ops — the 'how many hosts do these
    two tiles share' answer in one broadcast join and three
    bit_count projections, no row-level join anywhere."""
    a = bitmaps.select(
        F.col("grp").alias("grp_a"), F.col("bm").alias("bm_a")
    )
    b = bitmaps.select(
        F.col("grp").alias("grp_b"), F.col("bm").alias("bm_b")
    )
    return (
        pairs.join(a, "grp_a")
        .join(b, "grp_b")
        .select(
            "grp_a",
            "grp_b",
            F.bit_count(
                F.col("bm_a").bitwiseAND(F.col("bm_b"))
            ).cast("long").alias("n_both"),
            F.bit_count(
                F.col("bm_a").bitwiseOR(F.col("bm_b"))
            ).cast("long").alias("n_either"),
            F.bit_count(
                F.col("bm_a").bitwiseAND(
                    F.bitwise_not(F.col("bm_b"))
                )
            ).cast("long").alias("n_only_a"),
        )
    )
