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
from .dedup import cluster_star
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
    radius) — the standard conflation contract, resolved by STAR
    CONTRACTION (cluster_star, O(log^2 n) rounds regardless of
    component diameter). Min-label propagation was the round-4
    resolver and is WRONG here at scale: geographic conflation
    chains grow with data density (a line of places each within
    radius of the next), and the sf0.1 oracle sweep caught exactly
    that — 12 propagation passes left a long chain split
    (canonical 771 vs the true min 673) while the sf0.01 sample
    was shallow enough to hide it. Diameter-unbounded relations
    get the diameter-independent resolver.

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
    comp = cluster_star(pairs, "a", "b", max_rounds=max_passes)
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


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: list,
    window: int,
    id_col: str = "place_id",
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): sort
    the corpus by a discriminating key and emit every record pair
    within `window` positions — the OTHER classic entity-resolution
    blocking family (conflate_places blocks by hash/cell equality;
    sorted-neighborhood catches near-misses that equality blocking
    splits, e.g. 'cafe' / 'caffe' sorting adjacently while hashing
    apart).  Output: (a, b, rank_a, rank_b), a's rank < b's.

    Scale shape: the global dense rank comes from with_global_index
    (range-repartition + per-partition offset cumsum — one pass,
    no single-partition sort).  Pair generation is rank-bucket
    arithmetic: the left side keys on bucket rank div window, the
    right side explodes to its bucket and the one below, so every
    qualifying pair meets on EXACTLY one key (bucket delta is 0 or
    1 when rank distance < window) — an ordinary equi-join, w-1
    pairs per record, no distinct pass and no quadratic block.
    """
    from .indexing import with_global_index

    ranked = with_global_index(
        df, order_cols=order_cols, index_col="_rank"
    ).select(F.col(id_col), F.col("_rank"))
    left = ranked.select(
        F.col(id_col).alias("a"),
        F.col("_rank").alias("rank_a"),
        F.expr(f"_rank div {int(window)}").alias("_bk"),
    )
    right = ranked.select(
        F.col(id_col).alias("b"),
        F.col("_rank").alias("rank_b"),
        F.explode(
            F.array(
                F.expr(f"_rank div {int(window)}"),
                F.expr(f"_rank div {int(window)} - 1"),
            )
        ).alias("_bk"),
    )
    return (
        left.join(right, "_bk")
        .where(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") < window)
        )
        .select("a", "b", "rank_a", "rank_b")
    )


def conflate_snapshots(
    old: DataFrame,
    new: DataFrame,
    radius_fix: int,
    id_col: str = "place_id",
    key_col: str = "name_key",
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
) -> DataFrame:
    """Cross-snapshot entity matching — conflate_places' incremental
    sibling: every NEW place is matched to its nearest OLD place
    carrying the same name key within the radius (ties by lowest
    old id), and the verdict table is the gazetteer-maintenance
    diff:

      status 'matched' — (new id, old id, exact squared distance),
      status 'born'    — new place with no old counterpart in range,
      status 'dead'    — old place no new place claimed.

    One row per new place plus one per dead old place; columns
    (place_id, name_key, matched_id, dist2, status) with the
    integer sentinel -1 on the sides that don't apply — a sentinel
    rather than NULL keeps every column totally orderable, which
    engine-portable diffing (sort-then-hash) needs.

    Scale shape: the same (name_key, cell) 3x3 block join as
    conflate_places but BIPARTITE (new probes, old builds) — no
    self-join, no components; the argmin is a per-new-place
    window over its handful of block candidates, and 'dead' is one
    anti-join keyed on the matched ids.
    """
    shift = DEFAULT_SHIFT
    while (1 << shift) < radius_fix:
        shift += 1

    def prep(df: DataFrame) -> DataFrame:
        pts = df.select(
            F.col(id_col).alias("_pid"),
            F.col(key_col).alias("_key"),
            F.col(lat_col).alias("_lat"),
            F.col(lon_col).alias("_lon"),
        )
        return with_cell(
            pts, "_lat", "_lon", out="_cell", shift=shift
        )

    new_c = prep(new)
    old_c = prep(old)
    lon_bits = _lon_bits(shift)
    offsets = [
        (dy << lon_bits) + dx
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    probe = new_c.withColumn(
        "_cell",
        F.explode(
            F.array(*[F.col("_cell") + F.lit(o) for o in offsets])
        ),
    )
    build = old_c.select(
        F.col("_pid").alias("_oid"),
        F.col("_key").alias("_key"),
        F.col("_lat").alias("_olat"),
        F.col("_lon").alias("_olon"),
        "_cell",
    )
    dlat = F.col("_lat") - F.col("_olat")
    dlon = F.col("_lon") - F.col("_olon")
    r2 = radius_fix * radius_fix
    cand = (
        probe.join(build, ["_key", "_cell"])
        .withColumn("_d2", dlat * dlat + dlon * dlon)
        .where(F.col("_d2") <= F.lit(r2))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy("_d2", "_oid")
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "_pid",
            F.col("_oid").alias("matched_id"),
            F.col("_d2").cast("long").alias("dist2"),
        )
    )
    new_side = (
        new.select(
            F.col(id_col).alias("_pid"), F.col(key_col).alias(key_col)
        )
        .join(best, "_pid", "left")
        .select(
            F.col("_pid").alias(id_col),
            key_col,
            F.coalesce("matched_id", F.lit(-1))
            .cast("long")
            .alias("matched_id"),
            F.coalesce("dist2", F.lit(-1)).cast("long").alias("dist2"),
            F.when(F.col("matched_id").isNotNull(), F.lit("matched"))
            .otherwise(F.lit("born"))
            .alias("status"),
        )
    )
    dead = (
        old.select(
            F.col(id_col).alias(id_col), F.col(key_col).alias(key_col)
        )
        .join(
            best.select(F.col("matched_id").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        .select(
            id_col,
            key_col,
            F.lit(-1).cast("long").alias("matched_id"),
            F.lit(-1).cast("long").alias("dist2"),
            F.lit("dead").alias("status"),
        )
    )
    return new_side.unionByName(dead)
