"""Distributed skyline (Pareto frontier) operator.

NOT translated reference code — the reference (ramunasd/osmctools)
has no multi-criteria selection; this extends its statistics family
(osmfilter --out-count style rankings) with the classic
non-dominated-set query a corpus curation pipeline runs ("which
documents are on the quality/length frontier", "which users on the
activity/value frontier").

Skyline under MAXIMIZE-both semantics: a point (x, y) survives iff
no other point has x' >= x AND y' >= y with at least one strict.

Plan shape (designed for 10^12 rows):

1. **Bucket pre-filter, pure Catalyst.** Coarse x-buckets (x >> k):
   one partial aggregate computes each bucket's max y; the suffix
   max over STRICTLY GREATER buckets (a tiny single-partition window
   over the bucket list, then a broadcast join) certainly dominates
   any point with y <= that suffix max — because every point in a
   greater bucket has x' > x. The scan-heavy bulk dies map-side;
   only the frontier band shuffles.
2. **Per-x reduction.** groupBy x -> max y (the only full shuffle):
   within equal x, only the max-y point can survive.
3. **Global frontier.** Running max of y over x DESC, excluding the
   current row, over the per-x aggregate (orders of magnitude
   smaller than the input; the single-partition window is over
   distinct surviving x only) -> keep y > running max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket_shift: int = 4,
) -> DataFrame:
    """Distinct (x, y) Pareto frontier, maximizing both columns.
    Returns (x_col, y_col, n_rows) where n_rows counts input rows
    carrying exactly that frontier point."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    pts = df.select(x.alias("x"), y.alias("y"))

    # stage 1: bucket suffix-max pre-filter (map-side kill)
    b = pts.withColumn("b", F.shiftright("x", bucket_shift))
    bmax = b.groupBy("b").agg(F.max("y").alias("by"))
    wsuf = (
        Window.orderBy(F.col("b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    suff = bmax.select(
        "b", F.max("by").over(wsuf).alias("suf")
    )
    cand = (
        b.join(F.broadcast(suff), "b")
        .where(F.col("suf").isNull() | (F.col("y") > F.col("suf")))
        .select("x", "y")
    )

    # stage 2+3: per-x max, then the strict running max over x desc
    perx = cand.groupBy("x").agg(F.max("y").alias("y"))
    w = (
        Window.orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        perx.select("x", "y", F.max("y").over(w).alias("rm"))
        .where(F.col("rm").isNull() | (F.col("y") > F.col("rm")))
        .select("x", "y")
    )

    counts = pts.groupBy("x", "y").agg(
        F.count("*").cast("long").alias("n_rows")
    )
    return (
        frontier.join(counts, ["x", "y"])
        .select(
            F.col("x").alias(x_col),
            F.col("y").alias(y_col),
            "n_rows",
        )
    )
