"""Neighborhood-value analytics over point fields: exact-integer
inverse-distance-weighted interpolation and robust spatial outlier
detection.  Both ride the radius_pairs cell-join (operators/knn.py)
— one equi-join shuffle on the cell key, 3x3 neighborhood, no
all-pairs — then reduce per query point.

NOT translated C code — the reference measures geometry
(osmconvert.c bbox/center math) but has no field interpolator."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .knn import radius_pairs


def idw_surface(
    points: DataFrame,
    radius_fix: int,
    value_col: str = "value",
    id_col: str = "doc_id",
) -> DataFrame:
    """Leave-one-out inverse-distance-weighted estimate at every
    point: est(a) = sum_b w_ab * v_b / sum_b w_ab over neighbors b
    within radius, with the integer kernel w_ab = r^2 - d_ab^2
    (max at distance 0, exactly 0 at the radius — the polynomial
    stand-in for 1/d^2 that keeps EVERYTHING in int64: num and den
    ship separately, so the estimate is an exact rational and any
    engine reproduces it bit-for-bit).  The smoothed-surface
    primitive under heatmaps and sensor-field gridding; "leave one
    out" makes it double as a cross-validation residual source
    (compare v_a against num/den).

    Output: (id, v, num, den, n_neighbors); points with no
    neighbor in range are absent (no den=0 rows to divide by).

    Scale: radius_pairs' single cell-keyed equi-join generates the
    neighbor list; the reduce is one map-side-combined groupBy on
    the point id.  Weights bounded by r^2 < 2^63 for any radius
    under ~3e9 fixed units (a third of the globe).
    """
    pairs = radius_pairs(points, radius_fix, id_col=id_col)
    vals = points.select(
        F.col(id_col).alias("b"),
        F.col(value_col).cast("long").alias("_bv"),
    )
    r2 = radius_fix * radius_fix
    w = F.lit(r2) - F.col("dist2")
    est = (
        pairs.join(vals, "b")
        .groupBy("a")
        .agg(
            F.sum(w * F.col("_bv")).cast("long").alias("num"),
            F.sum(w).cast("long").alias("den"),
            F.count("*").cast("long").alias("n_neighbors"),
        )
    )
    return est.join(
        points.select(
            F.col(id_col).alias("a"),
            F.col(value_col).cast("long").alias("v"),
        ),
        "a",
    ).select(
        F.col("a").alias(id_col), "v", "num", "den", "n_neighbors"
    )


def spatial_outliers(
    points: DataFrame,
    radius_fix: int,
    value_col: str = "value",
    id_col: str = "doc_id",
    k_mad: int = 3,
    min_neighbors: int = 3,
) -> DataFrame:
    """Local robust anomalies: a point is an outlier when its value
    deviates from its spatial NEIGHBORHOOD's lower median by more
    than k_mad neighborhood MADs — robust_spikes' median/MAD rule
    (operators/events.py) on the spatial axis instead of the time
    axis, so one broken sensor in a healthy block is loud while a
    uniformly-busy downtown stays quiet.  All integer, exact lower
    medians via the row_number rank trick; neighborhoods below
    min_neighbors are skipped (a median of 1 value flags nothing
    meaningful).

    Output: (id, v, med, mad, n_neighbors) for flagged points.

    Scale: the pair table is cell-join bounded; the two medians are
    window sorts PARTITIONED BY the query point, so per-partition
    state is one neighborhood, never the corpus.
    """
    pairs = radius_pairs(points, radius_fix, id_col=id_col)
    vals = points.select(
        F.col(id_col).alias("b"),
        F.col(value_col).cast("long").alias("_bv"),
    )
    nb = pairs.join(vals, "b").select("a", "b", "_bv")

    def lower_median(df: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy("a").orderBy(val, "b")
        wc = Window.partitionBy("a")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count("*").over(wc))
            .where(F.expr("_rn = (_n + 1) div 2"))
            .select(
                "a",
                F.col(val).alias(out),
                F.col("_n").alias("n_neighbors"),
            )
        )

    med = lower_median(nb, "_bv", "med").where(
        F.col("n_neighbors") >= min_neighbors
    )
    devs = nb.join(med.select("a", "med"), "a").withColumn(
        "_dev", F.abs(F.col("_bv") - F.col("med"))
    )
    mad = lower_median(devs, "_dev", "mad").select("a", "mad")
    own = points.select(
        F.col(id_col).alias("a"),
        F.col(value_col).cast("long").alias("v"),
    )
    return (
        med.join(mad, "a")
        .join(own, "a")
        .where(
            F.abs(F.col("v") - F.col("med"))
            > F.lit(k_mad) * F.col("mad")
        )
        .select(
            F.col("a").alias(id_col),
            "v",
            "med",
            F.col("mad").cast("long").alias("mad"),
            "n_neighbors",
        )
    )
