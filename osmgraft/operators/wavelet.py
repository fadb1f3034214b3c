"""Integer Haar wavelet transform over per-key time series — the
compaction step of a telemetry / recrawl-signal store.

The unnormalized Haar transform (Haar 1910; the standard
compaction basis of approximate query processors, e.g. the
wavelet synopses literature) maps a length-2^L series to L detail
bands plus one approximation by repeated pairwise sum/difference:

    a_l[k] = a_{l-1}[2k] + a_{l-1}[2k+1]
    d_l[k] = a_{l-1}[2k] - a_{l-1}[2k+1]

Dropping the 1/sqrt(2) normalization keeps every coefficient an
exact int64 (magnitudes grow by at most 2x per level, so a
length-1024 series of counts < 2^50 is safe), which makes the
transform invertible in integer arithmetic and oracle-checkable
bit-for-bit. Large |d_l[k]| localizes change (a host whose daily
volume jumped), zero runs compress away — the classic use.

Scale plan: the series is densified once (distinct keys x a
literal 0..n-1 sequence, explode factor n, missing slots 0) and
then each level is ONE partial-aggregable groupBy on
(key, idx div 2) — sum and alternating-sign sum fused in the same
shuffle. L = log2(n) levels means log2(n) shuffles of a table
that HALVES each round; at a million keys and n=1024 that is 10
rapidly-shrinking aggregations, no windows, no state.

NOT from the reference — osmctools has no time-series layer; this
serves the recrawl/change-rate family (q198/q205) as their
storage-side synopsis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def haar_transform(
    series: DataFrame, n: int, key: str = "key"
) -> DataFrame:
    """series(key, idx, v) with 0 <= idx < n (n a power of two,
    missing idx = 0) -> (key, level, idx, kind, coef): detail
    rows kind='d' for level 1..log2(n), one approximation row
    kind='a' at the top level. Exact int64 throughout."""
    if n & (n - 1) or n <= 1:
        raise ValueError("n must be a power of two > 1")
    spark = series.sparkSession
    keys = series.select(F.col(key).alias("key")).distinct()
    grid = keys.join(
        spark.range(n).select(F.col("id").alias("idx"))
    )
    cur = (
        grid.join(
            series.select(
                F.col(key).alias("key"), "idx",
                F.col("v").cast("long").alias("v"),
            ),
            ["key", "idx"],
            "left",
        )
        .select(
            "key", "idx",
            F.coalesce("v", F.lit(0).cast("long")).alias("v"),
        )
    )
    out = None
    level = 0
    length = n
    while length > 1:
        level += 1
        length //= 2
        pair = cur.groupBy(
            "key", F.expr("idx div 2").alias("idx")
        ).agg(
            F.sum("v").cast("long").alias("a"),
            F.sum(
                F.when(F.col("idx") % 2 == 0, F.col("v")).otherwise(
                    -F.col("v")
                )
            )
            .cast("long")
            .alias("d"),
        )
        det = pair.select(
            "key",
            F.lit(level).cast("long").alias("level"),
            "idx",
            F.lit("d").alias("kind"),
            F.col("d").alias("coef"),
        )
        out = det if out is None else out.unionByName(det)
        cur = pair.select("key", "idx", F.col("a").alias("v"))
    top = cur.select(
        "key",
        F.lit(level).cast("long").alias("level"),
        "idx",
        F.lit("a").alias("kind"),
        F.col("v").alias("coef"),
    )
    return out.unionByName(top)
