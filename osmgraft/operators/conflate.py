"""Spatial entity resolution (POI conflation): merge place records
that carry the same name key and sit within a fixed radius — the
geocoder-maintenance operator that collapses "Springfield Cafe"
submitted three times at three slightly-different GPS fixes into one
canonical entity.  The reference has the two halves separately
(osmconvert dedups objects by id, osmconvert.c:61; osmassignpoly
matches points to named regions); conflation is their web-corpus
composition: identity is (name, proximity), not id.

NOT translated C code — the reference has no entity resolver."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo.cells import DEFAULT_SHIFT, _lon_bits
from .dedup import dedup_clusters
from .spatial import with_cell


def conflate_places(
    places: DataFrame,
    radius_fix: int,
    id_col: str = "place_id",
    key_col: str = "name_key",
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
    max_passes: int = 12,
) -> DataFrame:
    """(place_id, name_key, canonical): canonical = min place_id of
    the connected component under the relation "same name_key AND
    squared fixed-point distance <= radius_fix^2".  Transitive by
    design (A~B, B~C merges all three even when A-C exceeds the
    radius) — the standard conflation contract, resolved by the
    same min-label propagation as LSH dup groups (dedup_clusters;
    conflation chains are shallow for the same reason dup groups
    are).

    Scale shape: candidate pairs come from one equi-join on
    (name_key, cell) with the probe side exploded to its 3x3 cell
    neighborhood — cell side >= radius makes the block exact, the
    name key splits the world's densest cells by name before any
    distance math, and no all-pairs join exists.  Singletons skip
    the component join entirely (left join + coalesce).
    """
    shift = DEFAULT_SHIFT
    while (1 << shift) < radius_fix:
        shift += 1
    pts = places.select(
        F.col(id_col).alias("_pid"),
        F.col(key_col).alias("_key"),
        F.col(lat_col).alias("_lat"),
        F.col(lon_col).alias("_lon"),
    )
    cells = with_cell(pts, "_lat", "_lon", out="_cell", shift=shift)
    lon_bits = _lon_bits(shift)
    offsets = [
        (dy << lon_bits) + dx
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    probe = cells.withColumn(
        "_cell",
        F.explode(
            F.array(*[F.col("_cell") + F.lit(o) for o in offsets])
        ),
    )
    build = cells.select(
        F.col("_pid").alias("_bid"),
        F.col("_key").alias("_key"),
        F.col("_lat").alias("_blat"),
        F.col("_lon").alias("_blon"),
        "_cell",
    )
    dlat = F.col("_lat") - F.col("_blat")
    dlon = F.col("_lon") - F.col("_blon")
    r2 = radius_fix * radius_fix
    # each unordered pair joins exactly once: the build point sits in
    # one cell, and exactly one of the probe's 9 cells equals it
    pairs = (
        probe.join(build, ["_key", "_cell"])
        .where(F.col("_pid") < F.col("_bid"))
        .where(dlat * dlat + dlon * dlon <= F.lit(r2))
        .select(F.col("_pid").alias("a"), F.col("_bid").alias("b"))
    )
    comp = dedup_clusters(pairs, "a", "b", max_passes=max_passes)
    return (
        places.select(
            F.col(id_col).alias(id_col), F.col(key_col).alias(key_col)
        )
        .join(
            comp.select(
                F.col("doc_id").alias(id_col),
                F.col("cluster").alias("_canon"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            key_col,
            F.coalesce(F.col("_canon"), F.col(id_col))
            .cast("long")
            .alias("canonical"),
        )
    )
