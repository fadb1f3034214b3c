"""Categorical co-occurrence affinity — contingency-table lift in
exact integer arithmetic.

For two categorical columns (host x region, lang x tile, ...),
the lift of a cell is observed/expected =
(n_obs * n_total) / (n_row * n_col). Reporting that ratio as a
float invites aggregation-order drift, so the operator returns
the two sides of the comparison as exact int64 products —
`lift_num = n_obs * n_total`, `lift_den = n_row * n_col` — plus
the over-representation verdict (num > den). Downstream report
layers divide at the edge if they want the decimal.

Magnitude: n_obs, n_row, n_col, n_total <= corpus size N, so the
products are int64-safe through N ~ 3 * 10^9 rows per computed
slice; at the full 10^12-doc table the operator runs per
partition-pruned slice (e.g. per crawl snapshot), which is also
what makes the marginals broadcast-able.

Scale plan: three partial-aggregable groupBys (cell, row
marginal, column marginal — the marginals are tiny and broadcast
back onto the cell table) and one 1-row total. No windows, no
skew sensitivity beyond the cell groupBy itself, which AQE
handles like any key-frequency rollup.

NOT from the reference — osmctools' statistics sink counts one
dimension at a time; this is the two-dimensional association
rollup a corpus auditor runs over its outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def contingency_lift(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """df -> (row, col, n_obs, n_row, n_col, n_total, lift_num,
    lift_den, over) with exact int64 counts and products."""
    base = df.select(
        F.col(row_col).alias("row"), F.col(col_col).alias("col")
    )
    cells = base.groupBy("row", "col").agg(
        F.count("*").cast("long").alias("n_obs")
    )
    rows = base.groupBy("row").agg(
        F.count("*").cast("long").alias("n_row")
    )
    cols = base.groupBy("col").agg(
        F.count("*").cast("long").alias("n_col")
    )
    total = base.agg(F.count("*").cast("long").alias("n_total"))
    return (
        cells.join(F.broadcast(rows), "row")
        .join(F.broadcast(cols), "col")
        .join(F.broadcast(total))
        .select(
            "row",
            "col",
            "n_obs",
            "n_row",
            "n_col",
            "n_total",
            (F.col("n_obs") * F.col("n_total"))
            .cast("long")
            .alias("lift_num"),
            (F.col("n_row") * F.col("n_col"))
            .cast("long")
            .alias("lift_den"),
            (
                F.col("n_obs") * F.col("n_total")
                > F.col("n_row") * F.col("n_col")
            ).alias("over"),
        )
    )
