"""Neighbor search (SURVEY.md J8): broadcast exact kNN against a
small reference set, and cell-bucketed radius pairing for
point-to-point neighbor joins.

The reference accelerates neighbor lookup by sorting points on the
coarse coco cell key and range-scanning adjacent cells
(osmgeobase.c:2547-2560; osmposition dat_). Our scale path:

  * small probe set (gazetteer, centroids): broadcast the set and
    compute exact top-k inside an Arrow batch — ZERO shuffle, the
    100 TB side streams through map tasks.
  * point-to-point within radius r: encode both sides into cells of
    side >= r, explode the probe side to its 3x3 cell neighborhood,
    equi-join on cell (Spark sort-merge/shuffled-hash join — this IS
    the cell-prefix sort-merge join), refine by exact distance.
    Exact for fixed radius; skew from megacity cells is handled by
    AQE skew-join splitting (enabled in session.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..geo.cells import DEFAULT_SHIFT
from .spatial import with_cell


def knn_broadcast(
    points: DataFrame,
    ref_names: list[str],
    ref_lat: np.ndarray,
    ref_lon: np.ndarray,
    k: int = 3,
    id_col: str = "doc_id",
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
) -> DataFrame:
    """Exact kNN of every point against a broadcast reference set.
    Ties broken by reference index (stable argsort) — matches the
    SQL oracle's ORDER BY dist2, name."""
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(
        (list(ref_names), np.asarray(ref_lat, dtype=np.int64),
         np.asarray(ref_lon, dtype=np.int64))
    )
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("neighbor", StringType()),
            StructField("dist2", LongType()),
            StructField("rank", LongType()),
        ]
    )

    def topk(batches):
        names, rla, rlo = bc.value
        names_arr = np.array(names, dtype=object)
        for b in batches:
            ids = b[id_col].to_numpy("int64")
            la = b[lat_col].to_numpy("int64")
            lo = b[lon_col].to_numpy("int64")
            # (n_points, n_ref) int64 distance matrix
            d = (la[:, None] - rla[None, :]) ** 2 + (
                lo[:, None] - rlo[None, :]
            ) ** 2
            order = np.argsort(d, axis=1, kind="stable")[:, :k]
            n = len(ids)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, k),
                    "neighbor": names_arr[order].ravel(),
                    "dist2": np.take_along_axis(d, order, 1).ravel(),
                    "rank": np.tile(
                        np.arange(1, k + 1, dtype=np.int64), n
                    ),
                }
            )

    return points.select(id_col, lat_col, lon_col).mapInPandas(
        topk, out_schema
    )


def radius_pairs(
    points: DataFrame,
    radius_fix: int,
    id_col: str = "doc_id",
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
) -> DataFrame:
    """All ordered pairs (a, b), a != b, with squared fixed-point
    distance <= radius_fix^2. Exact: cell side chosen >= radius so
    the 3x3 neighborhood covers every qualifying pair; one equi-join
    shuffle on the cell key.
    """
    shift = DEFAULT_SHIFT
    while (1 << shift) < radius_fix:
        shift += 1
    a = with_cell(points, lat_col, lon_col, out="_cell", shift=shift)
    # probe side explodes to its 3x3 neighborhood
    from ..geo.cells import _lon_bits

    lon_bits = _lon_bits(shift)
    offsets = [
        (dy << lon_bits) + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ]
    probe = a.withColumn(
        "_cell",
        F.explode(
            F.array(*[F.col("_cell") + F.lit(o) for o in offsets])
        ),
    )
    b = a.select(
        F.col(id_col).alias("_bid"),
        F.col(lat_col).alias("_blat"),
        F.col(lon_col).alias("_blon"),
        F.col("_cell"),
    )
    r2 = radius_fix * radius_fix
    dlat = F.col(lat_col) - F.col("_blat")
    dlon = F.col(lon_col) - F.col("_blon")
    return (
        probe.join(b, on="_cell")
        .filter(F.col(id_col) != F.col("_bid"))
        .withColumn("dist2", dlat * dlat + dlon * dlon)
        .filter(F.col("dist2") <= F.lit(r2))
        .select(
            F.col(id_col).alias("a"),
            F.col("_bid").alias("b"),
            "dist2",
        )
    )
    # no dedup needed: b sits in exactly one cell, and exactly one of
    # a's 9 probe cells equals it, so each ordered pair joins once


def city_knn_cells(
    points: DataFrame,
    ref_names: list[str],
    ref_lat: np.ndarray,
    ref_lon: np.ndarray,
    k: int = 3,
    shift: int = 21,
    id_col: str = "doc_id",
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
) -> DataFrame:
    """Reverse kNN — for each reference point, the k nearest DATA
    points — via the cell-prefix join, exact by certificate.

    The forward direction (knn_broadcast) broadcasts the small side
    and scans; here the top-k is over the 100-TB side, so scanning
    everything per city is the thing to avoid. Plan:

      1. candidates: points equi-joined (broadcast) to the 3x3 cell
         neighborhood of each city at cell side s = 2^shift — the
         cell-prefix join; per-city top-k by (dist2, id) window
         over the candidate set only.
      2. certificate: any point OUTSIDE the 3x3 block differs by
         >= s+1 in some axis (bands differ by >= 2, intra-cell
         offsets < s), so its dist2 > s^2. A city whose candidate
         top-k has k rows with kth dist2 <= s^2 is FINAL — no
         outside point can enter or tie into its top-k.
      3. fallback: uncertified cities (deserts) take the exact
         brute-force pass, restricted to those cities only — in-plan
         (anti-join), no driver decision, empty when the grid
         suffices.

    At 100 TB: stage 1 touches only the 9-cell neighborhoods (a
    pushed-down broadcast-join prune of the scan); the fallback full
    scan is paid only when a city has < k points within one cell
    side — `shift` is the knob trading neighborhood size against
    fallback probability. The tiny top-k intermediate is pinned with
    localCheckpoint so its window shuffle runs once, not per
    consumer (certificate + output).
    """
    from pyspark.sql import Window

    spark = points.sparkSession
    side = 1 << shift
    from ..geo.cells import _lon_bits

    lon_bits = _lon_bits(shift)

    # literal city dim as a JVM LocalRelation (a createDataFrame
    # Python-RDD roundtrip costs ~0.5-2 s per call)
    structs = [
        F.struct(
            F.lit(t).alias("neighbor"),
            F.lit(int(la)).cast("long").alias("clat"),
            F.lit(int(lo)).cast("long").alias("clon"),
        )
        for t, la, lo in zip(
            ref_names, np.asarray(ref_lat), np.asarray(ref_lon)
        )
    ]
    cities = (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("c"))
        .select("c.*")
    )

    offsets = [
        (dy << lon_bits) + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ]
    cities9 = with_cell(
        cities, "clat", "clon", out="_cc", shift=shift
    ).withColumn(
        "_cell",
        F.explode(F.array(*[F.col("_cc") + F.lit(o) for o in offsets])),
    )

    pts = with_cell(points, lat_col, lon_col, out="_cell", shift=shift)
    dlat = F.col(lat_col) - F.col("clat")
    dlon = F.col(lon_col) - F.col("clon")
    w = Window.partitionBy("neighbor").orderBy(
        F.asc("dist2"), F.asc(id_col)
    )
    top = (
        pts.join(F.broadcast(cities9), on="_cell")
        .withColumn("dist2", dlat * dlat + dlon * dlon)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("neighbor", "rank", id_col, "dist2")
        .localCheckpoint(eager=False)  # <= n_cities*k rows, 2 consumers
    )
    certified = (
        top.groupBy("neighbor")
        .agg(F.max("dist2").alias("_kd"), F.count("*").alias("_n"))
        .filter(
            (F.col("_n") == k) & (F.col("_kd") <= side * side)
        )
        .select("neighbor")
    )
    final = top.join(F.broadcast(certified), "neighbor", "left_semi")

    fb_cities = cities.join(
        F.broadcast(certified), "neighbor", "left_anti"
    )
    fb = (
        points.crossJoin(F.broadcast(fb_cities))
        .withColumn("dist2", dlat * dlat + dlon * dlon)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("neighbor", "rank", id_col, "dist2")
    )
    return final.unionByName(fb)
