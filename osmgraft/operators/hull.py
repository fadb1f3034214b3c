"""Distributed exact convex hull over fixed-point coordinates.

NOT translated reference code — the reference (ramunasd/osmctools)
has no hull operator; this extends its fixed-point geometry model
(osmconvert.c 7-decimal lat/lon ints) with the footprint primitive a
coverage/tiling product needs ("what area does this tile's data
span").

Plan shape (designed for 10^12 points):

1. **Akl-Toussaint throw-away, pure Catalyst.** Per group, one
   aggregate finds four extreme hull vertices (lexicographic E/W by
   (lon,lat), N/S by (lat,lon)); a broadcast join + integer cross
   products discard every point STRICTLY inside the E-N-W-S
   quadrilateral. On uniformly-dense data this keeps O(perimeter
   band) of the input — the scan-heavy 99% never leaves the JVM and
   never shuffles. Cross products of 1.8e9-scale coordinates need
   ~2^65, so the test runs in DECIMAL(38,0) — exact, Catalyst-native,
   no floats.

2. **Exact monotone chain on the survivors.** One applyInPandas per
   group runs Andrew's monotone chain in arbitrary-precision Python
   ints (no int64 overflow, no epsilon): strict-turn popping keeps
   VERTICES only (collinear edge-interior points are dropped). The
   per-group survivor set is the memory contract — bounded by the
   quad-exterior band, not the input.

The DuckDB oracle computes the same hull by gift wrapping (Jarvis
march) in a recursive CTE with HUGEINT cross products — a completely
independent algorithm that must agree on the exact vertex set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,0)"


def _cross(ax, ay, bx, by, qx, qy):
    """Exact sign-safe cross product (b-a) x (q-a) in decimal(38,0)
    Catalyst arithmetic."""
    return (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)


def akl_toussaint_survivors(
    points: DataFrame,
    group_col: str,
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
) -> DataFrame:
    """Distinct (group, lon, lat) points NOT strictly inside the
    E-N-W-S extreme-point quadrilateral of their group — a superset
    of the group's hull vertices."""
    x = F.col(lon_col).cast(_DEC)
    y = F.col(lat_col).cast(_DEC)
    pts = points.select(
        F.col(group_col).alias("grp"),
        x.alias("x"),
        y.alias("y"),
    ).distinct()

    quad = pts.groupBy("grp").agg(
        F.max(F.struct("x", "y")).alias("e"),
        F.min(F.struct("x", "y")).alias("w"),
        F.max(F.struct("y", "x")).alias("n"),
        F.min(F.struct("y", "x")).alias("s"),
    ).select(
        "grp",
        F.col("e.x").alias("ex"), F.col("e.y").alias("ey"),
        F.col("n.x").alias("nx"), F.col("n.y").alias("ny"),
        F.col("w.x").alias("wx"), F.col("w.y").alias("wy"),
        F.col("s.x").alias("sx"), F.col("s.y").alias("sy"),
    )

    j = pts.join(F.broadcast(quad), "grp")
    # E->N->W->S is counterclockwise; strictly inside iff strictly
    # left of all four edges. A degenerate (zero-length) edge yields
    # cross = 0 everywhere, so nothing is ever discarded through it.
    inside = (
        (_cross(F.col("ex"), F.col("ey"), F.col("nx"), F.col("ny"),
                F.col("x"), F.col("y")) > 0)
        & (_cross(F.col("nx"), F.col("ny"), F.col("wx"), F.col("wy"),
                  F.col("x"), F.col("y")) > 0)
        & (_cross(F.col("wx"), F.col("wy"), F.col("sx"), F.col("sy"),
                  F.col("x"), F.col("y")) > 0)
        & (_cross(F.col("sx"), F.col("sy"), F.col("ex"), F.col("ey"),
                  F.col("x"), F.col("y")) > 0)
    )
    return j.where(~inside).select(
        "grp",
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )


def _chain_vertices(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Andrew's monotone chain on sorted distinct points, exact
    Python-int arithmetic; strict turns only -> hull VERTICES (no
    collinear edge-interior points)."""
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (
            b[0] - o[0]
        )

    lower: list[tuple[int, int]] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[int, int]] = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def convex_hull(
    points: DataFrame,
    group_col: str,
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
) -> DataFrame:
    """Exact per-group convex hull vertex set: one row per hull
    vertex, (group, lon_i, lat_i, n_vertices)."""
    import pandas as pd

    surv = akl_toussaint_survivors(points, group_col, lat_col, lon_col)

    def hull(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = sorted(
            {(int(x), int(y)) for x, y in zip(pdf["x"], pdf["y"])}
        )
        v = _chain_vertices(pts)
        return pd.DataFrame(
            {
                "grp": pdf["grp"].iloc[0],
                "lon_i": [p[0] for p in v],
                "lat_i": [p[1] for p in v],
                "n_vertices": len(v),
            }
        )

    out_schema = (
        f"grp {dict(points.dtypes)[group_col]}, lon_i long, "
        "lat_i long, n_vertices long"
    )
    return (
        surv.groupBy("grp")
        .applyInPandas(hull, out_schema)
        .withColumnRenamed("grp", group_col)
    )
