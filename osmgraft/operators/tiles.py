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


def tile_pyramid(
    pts: DataFrame,
    levels: int = 4,
    base_shift: int = None,
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
) -> DataFrame:
    """Multi-resolution tile rollup (tile pyramid): per-cell
    algebraic stats at `levels` zoom levels at once, level l using
    quantization shift base_shift + l (cells 2x coarser per level
    on each axis — the reference's grid refinement ladder,
    osmgeobase.c zoom grid, run in reverse).

    Plan: ONE pass — each row posexplodes into its `levels` packed
    (level, cell) keys (a constant-width array of pure integer
    expressions, no lambda), then a single groupBy(level, cell).
    Algebraic aggregates partial-combine map-side, so the pyramid
    costs one shuffle of levels x one row per (partition, cell) —
    NOT one job per level, and hot megacity cells stay skew-proof
    (see module docstring). Each level's cell id packs with that
    level's own lon_bits, mirroring cell_encode exactly."""
    from ..geo.cells import DEFAULT_SHIFT as _DS

    if base_shift is None:
        base_shift = _DS
    lat0 = F.shiftright(
        F.col(lat_col) + F.lit(LAT_OFFSET), base_shift
    ).cast("long")
    lon0 = F.shiftright(
        F.col(lon_col) + F.lit(LON_OFFSET), base_shift
    ).cast("long")
    cells = [
        F.shiftleft(
            F.shiftright(lat0, lvl), _lon_bits(base_shift + lvl)
        ).bitwiseOR(F.shiftright(lon0, lvl))
        for lvl in range(levels)
    ]
    exploded = pts.select(
        "doc_id", F.posexplode(F.array(*cells)).alias("level", "cell")
    )
    return exploded.groupBy("level", "cell").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def tile_rollup_incremental(
    base_tiles: DataFrame,
    base_pts: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_id",
    cell_col: str = "cell",
    delete_col: str = "deleted",
) -> DataFrame:
    """Incremental tile-view maintenance: given the PREVIOUS rollup
    (`base_tiles`), the previous points table (`base_pts`, with
    `cell_col` already computed), and a changefile (`changes`:
    key + NEW position's cell + tombstone flag), return the rollup
    of the post-change world by recomputing ONLY tiles whose
    membership changed — the osmupdate role (apply a daily .osc,
    refresh derived output) expressed as Iceberg-style dynamic
    partition overwrite.

    Affected tiles = old cells of every changed/deleted key (join
    into the base) UNION new cells of every upserted row. Tiles
    outside that set pass through from `base_tiles` untouched —
    min/max/count are holistic under delete, so per-tile recompute
    (not delta arithmetic) is the correct general maintenance, and
    the affected-set bound makes it cheap.

    Scale plan: a daily changefile is tiny relative to the corpus
    (~10^7 changes vs 10^12 rows), so the affected-cell set is
    broadcast to both the semi-join (recompute scan) and the
    anti-join (pass-through) — zero extra shuffles beyond the one
    groupBy of the recomputed slice. On cell-partitioned storage
    the semi-join predicate prunes the scan to affected partitions
    and the result maps 1:1 onto a partition-overwrite commit
    (compose with manifest.write_committed for resumability).
    """
    from .merge import change_apply

    new_pts = change_apply(base_pts, changes, [key_col], delete_col)
    old_cells = (
        base_pts.join(
            F.broadcast(changes.select(key_col)), key_col, "left_semi"
        ).select(cell_col)
    )
    new_cells = changes.filter(~F.col(delete_col)).select(cell_col)
    affected = old_cells.unionByName(new_cells).distinct()
    refreshed = tile_rollup(
        new_pts.join(F.broadcast(affected), cell_col, "left_semi"),
        cell_col,
    )
    untouched = base_tiles.join(
        F.broadcast(affected), cell_col, "left_anti"
    )
    return untouched.unionByName(refreshed)


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


# ----------------------------------------------------------------
# raster <-> vector tile materializer (north_rule)
# ----------------------------------------------------------------

from ..geo.cells import (  # noqa: E402
    DEFAULT_SHIFT,
    LAT_OFFSET,
    LON_OFFSET,
    _lon_bits,
)


def _pixel(shift: int, grid_bits: int):
    """Row-major sub-pixel index inside a cell: the next grid_bits
    bits of the SAME quantization below the cell shift (div/% so
    the arithmetic is ANSI-SQL portable)."""
    sub = 1 << (shift - grid_bits)
    g = 1 << grid_bits
    py = ((F.col("lat_i") + LAT_OFFSET) / sub).cast("long") % g
    px = ((F.col("lon_i") + LON_OFFSET) / sub).cast("long") % g
    return (py * g + px).alias("pix")


def rasterize_tiles(
    pts: DataFrame,
    shift: int = DEFAULT_SHIFT,
    grid_bits: int = 4,
    cell_col: str = "cell",
) -> DataFrame:
    """Raster side: per cell, a DENSE 2^grid_bits x 2^grid_bits
    point-count grid over the cell's sub-pixels, serialized
    row-major as a comma-joined string (canonical, oracle-robust —
    same convention as the q40 doc lists).

    Plan: groupBy (cell, pix) with map-side partial counts, then one
    per-cell merge building the dense grid from a pix->count map —
    both aggregates algebraic, so megacity cells cost
    O(#partitions) shuffle rows, not O(points)."""
    g = 1 << grid_bits
    counts = pts.select(
        F.col(cell_col).alias("cell"), _pixel(shift, grid_bits)
    ).groupBy("cell", "pix").agg(
        F.count("*").cast("long").alias("n")
    )
    m = F.map_from_entries(
        F.collect_list(F.struct("pix", "n"))
    )
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(g * g - 1)),
        lambda p: F.coalesce(
            F.try_element_at(m, p.cast("long")), F.lit(0)
        ),
    )
    return counts.groupBy("cell").agg(
        F.sum("n").alias("n_docs"),
        F.array_join(
            F.transform(grid, lambda v: v.cast("string")), ","
        ).alias("grid_str"),
    )


def vectorize_tiles(
    pts: DataFrame,
    shift: int = DEFAULT_SHIFT,
    grid_bits: int = 4,
    cell_col: str = "cell",
) -> DataFrame:
    """Vector side: occupied sub-pixels as fixed-point boxes
    (cell, pix, x1, y1, x2, y2, n) — the exact inverse of the
    raster quantization, so every input point lies inside its box
    (round-trip property, tests/test_tiles_raster.py)."""
    sub = 1 << (shift - grid_bits)
    g = 1 << grid_bits
    lon_bits = _lon_bits(shift)
    counts = pts.select(
        F.col(cell_col).alias("cell"), _pixel(shift, grid_bits)
    ).groupBy("cell", "pix").agg(
        F.count("*").cast("long").alias("n")
    )
    lat_band = (F.col("cell") / (1 << lon_bits)).cast("long")
    lon_band = F.col("cell") % (1 << lon_bits)
    py = (F.col("pix") / g).cast("long")
    px = F.col("pix") % g
    y1 = lat_band * (1 << shift) + py * sub - LAT_OFFSET
    x1 = lon_band * (1 << shift) + px * sub - LON_OFFSET
    return counts.select(
        "cell",
        "pix",
        x1.alias("x1"),
        y1.alias("y1"),
        (x1 + sub - 1).alias("x2"),
        (y1 + sub - 1).alias("y2"),
        "n",
    )


def tile_blur(
    rollup: DataFrame,
    shift: int = 20,
    cell_col: str = "cell",
    n_col: str = "n",
) -> DataFrame:
    """Integer 3x3 kernel smoothing of a tile rollup — the heatmap
    densification step: every cell SCATTERS its count to its
    neighbors with the separable binomial weights (2-|du|)(2-|dv|)
    (4 center, 2 edge, 1 corner, sum 16), so

        smoothed_num(c) = sum over neighbors b of w * n(b)

    is exact integers; `smoothed` = num div 16 is the normalized
    value. Grid-clamped (no wraparound): border cells lose the
    off-grid share of their kernel, the standard crop convention.

    Plan: one in-row 9-way explode over the (already tiny) rollup
    + one bounded groupBy sum — the corpus is never re-read; at
    100 TB the rollup is cells-sized, not docs-sized."""
    from ..geo.cells import LAT_OFFSET, LON_OFFSET, _lon_bits

    bits = _lon_bits(shift)
    cu_max = (2 * LON_OFFSET) >> shift
    cv_max = (2 * LAT_OFFSET) >> shift
    base = rollup.select(
        (F.col(cell_col) % F.lit(1 << bits)).alias("cu"),
        F.expr(f"{cell_col} div {1 << bits}").alias("cv"),
        F.col(n_col).alias("_n"),
    )
    scattered = (
        base.select(
            "cu",
            "cv",
            "_n",
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("du"),
        )
        .select(
            "cv",
            "_n",
            "du",
            (F.col("cu") + F.col("du")).alias("nu"),
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dv"),
        )
        .select(
            "_n",
            "nu",
            (F.col("cv") + F.col("dv")).alias("nv"),
            (
                (F.lit(2) - F.abs("du")) * (F.lit(2) - F.abs("dv"))
            ).cast("long").alias("w"),
        )
        .where(
            F.col("nu").between(0, cu_max)
            & F.col("nv").between(0, cv_max)
        )
    )
    return scattered.groupBy(
        (F.col("nv") * (1 << bits) + F.col("nu")).alias("cell")
    ).agg(
        F.sum(F.col("w") * F.col("_n")).alias("smoothed_num"),
    ).select(
        "cell",
        "smoothed_num",
        F.expr("smoothed_num div 16").alias("smoothed"),
    )


def quadtree_rollup(
    pts: DataFrame,
    cap: int = 8,
    leaf_shift: int = 20,
    levels: int = 6,
    lat_col: str = "lat_i",
    lon_col: str = "lon_i",
) -> DataFrame:
    """Adaptive quadtree tiling: split every cell holding more than
    `cap` documents into its 4 children, down to at most `levels`
    levels (level 0 = coarsest, shift leaf_shift + levels - 1; the
    leaf level uses leaf_shift). Returns one row per occupied leaf:
    (level, qcell, n_docs, min_doc). This is the skew-adaptive
    variant of the fixed-grid tile materializer (osmgeobase.c zoom
    grid): megacity hotspots get fine cells, empty countryside
    stays coarse, so downstream per-tile work is load-balanced by
    construction.

    Scale plan — the document table is shuffled exactly ONCE (the
    leaf-cell algebraic count); every decision after that runs on
    the per-leaf-cell count table, which is <= one row per occupied
    leaf cell regardless of corpus size:
      1. fcnt: groupBy(leaf latb, lonb) count/min — partial-agg,
         skew-proof.
      2. posexplode each leaf cell into its `levels` ancestor cells
         and sum counts per (level, cell) — the pyramid, one small
         shuffle.
      3. per leaf cell, the assigned node is the COARSEST ancestor
         whose population is <= cap (else the leaf): a struct-min
         over (level, cell), no iteration — the quadtree's "split
         while over capacity" recursion is equivalent to this
         closed form because populations are monotonically
         non-increasing with depth.
      4. roll leaf stats up to the assigned node (algebraic).
    """
    fine = pts.select(
        F.shiftright(
            F.col(lat_col) + F.lit(LAT_OFFSET), leaf_shift
        ).cast("long").alias("latb"),
        F.shiftright(
            F.col(lon_col) + F.lit(LON_OFFSET), leaf_shift
        ).cast("long").alias("lonb"),
        "doc_id",
    )
    fcnt = fine.groupBy("latb", "lonb").agg(
        F.count("*").cast("long").alias("n"),
        F.min("doc_id").alias("min_doc"),
    )
    return quadtree_from_counts(fcnt, cap, leaf_shift, levels)


def quadtree_from_counts(
    fcnt: DataFrame,
    cap: int = 8,
    leaf_shift: int = 20,
    levels: int = 6,
) -> DataFrame:
    """The tree-decision half of quadtree_rollup, over a per-leaf-
    cell count table (latb, lonb, n, min_doc) — steps 2-4 of the
    scale plan. Separated so an incrementally-maintained leaf
    count table (quadtree_rollup step 1 is the ONLY corpus-sized
    pass) can re-derive the whole adaptive tree at count-table
    cost."""
    top = levels - 1
    cells = [
        F.shiftleft(
            F.shiftright(F.col("latb"), top - lvl),
            _lon_bits(leaf_shift + top - lvl),
        ).bitwiseOR(F.shiftright(F.col("lonb"), top - lvl))
        for lvl in range(levels)
    ]
    anc = fcnt.select(
        "latb",
        "lonb",
        "n",
        "min_doc",
        F.posexplode(F.array(*cells)).alias("l", "cell"),
    )
    lvlcnt = anc.groupBy("l", "cell").agg(
        F.sum("n").alias("ln")
    )
    asg = (
        anc.join(lvlcnt, ["l", "cell"])
        .groupBy("latb", "lonb")
        .agg(
            F.min(
                F.when(
                    F.col("ln") <= cap, F.struct("l", "cell")
                )
            ).alias("w"),
            F.min("n").alias("n"),
            F.min("min_doc").alias("min_doc"),
        )
    )
    leaf_cell = F.shiftleft(
        F.col("latb"), _lon_bits(leaf_shift)
    ).bitwiseOR(F.col("lonb"))
    placed = asg.select(
        F.coalesce(F.col("w.l"), F.lit(top)).alias("level"),
        F.coalesce(F.col("w.cell"), leaf_cell).alias("qcell"),
        "n",
        "min_doc",
    )
    return placed.groupBy("level", "qcell").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.min("min_doc").alias("min_doc"),
    )


def quadtree_rollup_incremental(
    base_pts: DataFrame,
    changes: DataFrame,
    cap: int = 8,
    leaf_shift: int = 20,
    levels: int = 6,
    key_col: str = "doc_id",
    delete_col: str = "deleted",
) -> DataFrame:
    """Incrementally-maintained adaptive quadtree: apply a
    changefile (key + new position + tombstone) to the LEAF COUNT
    table by recomputing only affected leaf cells
    (tile_rollup_incremental — the Iceberg partition-overwrite
    idiom), then re-derive the whole tree with
    quadtree_from_counts. Splits/merges anywhere in the tree are
    handled for free because the tree decision is a pure function
    of the count table and costs only count-table rows — the
    corpus is never rescanned beyond the affected-cell slice.
    At real scale base_pts' rollup is the stored artifact of the
    previous build; here it derives in the same lineage so the
    oracle can replay the post-change world from scratch."""
    lb = _lon_bits(leaf_shift)

    def with_leaf(df):
        return df.withColumn(
            "cell",
            F.shiftleft(
                F.shiftright(
                    F.col("lat_i") + F.lit(LAT_OFFSET), leaf_shift
                ),
                lb,
            ).bitwiseOR(
                F.shiftright(
                    F.col("lon_i") + F.lit(LON_OFFSET), leaf_shift
                )
            ),
        )

    bp = with_leaf(base_pts)
    ch = with_leaf(changes)
    base_tiles = tile_rollup(bp)
    fcnt2 = tile_rollup_incremental(
        base_tiles, bp, ch, key_col=key_col, delete_col=delete_col
    )
    fcnt = fcnt2.select(
        F.shiftright(F.col("cell"), lb).alias("latb"),
        F.col("cell").bitwiseAND(F.lit((1 << lb) - 1)).alias(
            "lonb"
        ),
        F.col("n_docs").alias("n"),
        "min_doc",
    )
    return quadtree_from_counts(fcnt, cap, leaf_shift, levels)


def contour_cases(
    cells: DataFrame, threshold: int
) -> DataFrame:
    """Marching-squares case extraction over the per-cell count
    raster — the raster->vector step that turns a density grid
    into iso-line geometry (marching squares: the standard 2x2
    corner-classification contouring algorithm, public since
    Lorensen & Cline's marching cubes lineage).

    cells(latb, lonb, n) are grid corners; a corner is INSIDE when
    n > threshold (absent corners are 0, hence outside). Every
    2x2 block whose corners straddle the threshold gets its case
    index 1..14: bit 1 = corner (y, x), bit 2 = (y, x+1), bit 4 =
    (y+1, x), bit 8 = (y+1, x+1), block keyed by its low corner.
    Cases 0 and 15 (fully outside / fully inside) carry no
    contour and are not emitted, so the output is sparse along
    the iso-lines — exactly the rows a tile renderer strokes.

    Shape: one filter to inside corners, an explode-by-4 (each
    inside corner votes its bit into the <=4 blocks it touches),
    one partial-aggregable groupBy summing bits, one filter. No
    joins at all — the dilation trick turns the 4-neighbor
    stencil into a single aggregation, the same shape as the
    autocorrelation and blur stencils. Fully-inside plateaus
    produce case 15 which the tail filter drops, keeping output
    proportional to contour LENGTH, not area (the 100-TB
    property: a planet-wide ocean of dense cells emits only its
    coastline).

    Complements rasterize/vectorize above: those materialize per-
    tile grids; this extracts the geometry BETWEEN tiles. (The
    reference draws no contours; csv/tile outputs stop at counts —
    osmconvert.c --out-statistics lineage.)"""
    spark = cells.sparkSession
    votes = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 2), (1, 0, 4), (1, 1, 8)],
        "dy long, dx long, bit long",
    )
    inside = cells.where(
        F.col("n").cast("long") > F.lit(int(threshold))
    ).select("latb", "lonb")
    cased = (
        inside.join(F.broadcast(votes))
        .select(
            (F.col("latb") - F.col("dy")).alias("latb"),
            (F.col("lonb") - F.col("dx")).alias("lonb"),
            "bit",
        )
        .groupBy("latb", "lonb")
        .agg(F.sum("bit").cast("long").alias("mcase"))
    )
    return cased.where(
        (F.col("mcase") > 0) & (F.col("mcase") < 15)
    )


def raster_morphology(
    cells: DataFrame, threshold: int, radius: int = 1
) -> DataFrame:
    """Grid morphology over the per-cell count raster: the
    dilation and erosion of the `n > threshold` inside-set by a
    Chebyshev-`radius` square structuring element (standard
    mathematical morphology, Serra's public formulation) — the
    cleanup pass a tile pipeline runs before contouring
    (dilate+erode = closing fills pinholes; erode+dilate = opening
    knocks out speckle).

    One aggregation computes everything: each inside cell votes
    into the (2r+1)^2 cells of its neighborhood; a target cell is
    `dilated` iff it receives any vote, `inside` iff it receives
    the center vote, `eroded` iff it receives ALL (2r+1)^2 votes
    (every neighbor of it is inside). Output is one row per
    DILATED cell (the sparse support), with n_nbrs for free — the
    neighborhood density a blur would charge a second pass for.

    Shape: filter -> explode-by-(2r+1)^2 -> one partial-aggregable
    groupBy. No joins; the same single-shuffle stencil trick as
    contour_cases above, and like it, output scales with the
    inside-set's boundary-dilated support, not the grid."""
    r = int(radius)
    k = 2 * r + 1
    spark = cells.sparkSession
    offs = spark.createDataFrame(
        [(dy, dx) for dy in range(-r, r + 1)
         for dx in range(-r, r + 1)],
        "dy long, dx long",
    )
    inside = cells.where(
        F.col("n").cast("long") > F.lit(int(threshold))
    ).select("latb", "lonb")
    return (
        inside.join(F.broadcast(offs))
        .select(
            (F.col("latb") + F.col("dy")).alias("latb"),
            (F.col("lonb") + F.col("dx")).alias("lonb"),
            ((F.col("dy") == 0) & (F.col("dx") == 0))
            .cast("long")
            .alias("ctr"),
        )
        .groupBy("latb", "lonb")
        .agg(
            F.count("*").cast("long").alias("n_nbrs"),
            F.max("ctr").alias("_c"),
        )
        .select(
            "latb",
            "lonb",
            "n_nbrs",
            (F.col("_c") == 1).alias("inside"),
            (F.col("n_nbrs") == k * k).alias("eroded"),
        )
    )


def flow_directions(cells: DataFrame) -> DataFrame:
    """D8 flow routing over the density raster (the standard
    eight-direction steepest-descent assignment of raster
    hydrology, O'Callaghan & Mark 1984 — here descending the
    DOCUMENT-COUNT surface, so 'flow' traces how a crowd thins
    out of its hotspots): every occupied cell points at its
    lowest-count occupied neighbor, provided that count is
    strictly lower than its own (otherwise it is a PIT), with
    ties broken row-major on (dy, dx) — fully deterministic. The
    second output column is the inflow degree: how many neighbors
    chose THIS cell, the 1-step accumulation a drainage or
    desire-line renderer seeds from.

    Shape: one dilated self-equi-join (explode factor 8, the
    stencil trick again) feeding a partial-aggregable argmin per
    cell, then one count keyed on the chosen target. No
    windows; hotspot cells cost their 8 neighbor rows, nothing
    quadratic anywhere."""
    spark = cells.sparkSession
    offs = spark.createDataFrame(
        [
            (dy, dx)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)
        ],
        "dy long, dx long",
    )
    base = cells.select(
        "latb", "lonb", F.col("n").cast("long").alias("n")
    )
    nbr = base.join(F.broadcast(offs)).select(
        (F.col("latb") + F.col("dy")).alias("latb"),
        (F.col("lonb") + F.col("dx")).alias("lonb"),
        (-F.col("dy")).alias("sdy"),
        (-F.col("dx")).alias("sdx"),
        F.col("n").alias("n_nbr"),
    )
    # joined: for each occupied cell, its occupied neighbors with
    # the offset pointing FROM the cell TO the neighbor
    best = (
        base.join(nbr, ["latb", "lonb"])
        .groupBy("latb", "lonb")
        .agg(
            F.min("n").alias("n"),
            F.min(
                F.struct(
                    F.col("n_nbr").alias("n_nbr"),
                    F.col("sdy").alias("dy"),
                    F.col("sdx").alias("dx"),
                )
            ).alias("b"),
        )
        .select(
            "latb",
            "lonb",
            "n",
            F.when(
                F.col("b.n_nbr") < F.col("n"), F.col("b.dy")
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dir_dy"),
            F.when(
                F.col("b.n_nbr") < F.col("n"), F.col("b.dx")
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dir_dx"),
        )
    )
    # isolated cells (no occupied neighbor at all) never meet the
    # inner join — they are pits with dir (0,0) and must survive
    iso = base.join(
        best.select("latb", "lonb"), ["latb", "lonb"], "left_anti"
    ).select(
        "latb",
        "lonb",
        "n",
        F.lit(0).cast("long").alias("dir_dy"),
        F.lit(0).cast("long").alias("dir_dx"),
    )
    best = best.unionByName(iso)
    inflow = (
        best.where(
            (F.col("dir_dy") != 0) | (F.col("dir_dx") != 0)
        )
        .groupBy(
            (F.col("latb") + F.col("dir_dy")).alias("latb"),
            (F.col("lonb") + F.col("dir_dx")).alias("lonb"),
        )
        .agg(F.count("*").cast("long").alias("inflow"))
    )
    return best.join(inflow, ["latb", "lonb"], "left").select(
        "latb",
        "lonb",
        "n",
        "dir_dy",
        "dir_dx",
        F.coalesce("inflow", F.lit(0)).cast("long").alias("inflow"),
    )


def k_anonymous_cells(
    cells: DataFrame, k: int, levels: int = 2, step: int = 2
) -> DataFrame:
    """Privacy-bounded publication of the density raster:
    hierarchical spatial generalization until every published
    group holds >= k subjects (k-anonymity via generalization,
    Sweeney 2002 — the public formulation; the geo flavor is the
    quadtree coarsening every location-data release uses).

    Level 0 publishes cells already meeting k; the rest roll up
    `step` bits (a step x step cell merge) and publish at level 1
    where the MERGED count meets k; after `levels` rollups the
    residue is emitted with suppressed=true (still identifiable —
    the caller drops or reports it, but the operator never
    silently hides mass: sum(n_pub) over the output equals the
    input total, the no-silent-caps rule).

    Shape: one partial-aggregable groupBy per level over a table
    that only SHRINKS (survivors leave the pipeline at each
    level); `levels` is log-bounded by the grid depth. Output
    (latb, lonb, level, n_pub, suppressed) where latb/lonb are in
    the LEVEL's own grid units."""
    out = None
    cur = cells.select(
        "latb", "lonb", F.col("n").cast("long").alias("n")
    )
    for lvl in range(int(levels) + 1):
        pub = cur.where(F.col("n") >= int(k)).select(
            "latb",
            "lonb",
            F.lit(lvl).cast("long").alias("level"),
            F.col("n").alias("n_pub"),
            F.lit(False).alias("suppressed"),
        )
        rest = cur.where(F.col("n") < int(k))
        if lvl == int(levels):
            pub = pub.unionByName(
                rest.select(
                    "latb",
                    "lonb",
                    F.lit(lvl).cast("long").alias("level"),
                    F.col("n").alias("n_pub"),
                    F.lit(True).alias("suppressed"),
                )
            )
        out = pub if out is None else out.unionByName(pub)
        if lvl < int(levels):
            cur = rest.groupBy(
                F.shiftright("latb", int(step)).alias("latb"),
                F.shiftright("lonb", int(step)).alias("lonb"),
            ).agg(F.sum("n").cast("long").alias("n"))
    return out


def cover_compaction(
    cells: DataFrame, levels: int = 2
) -> DataFrame:
    """Minimal-cover normalization of a cell set: wherever all 4
    children of a parent cell are covered, replace them by the
    parent, repeatedly for `levels` levels — the S2/quadkey
    cell-union normalization every spatial index applies before
    storing a covering (public cell-hierarchy practice). Output is
    the compacted cover as (level, latb, lonb) rows in each
    level's own grid units; it covers exactly the input set, with
    sum(4^level) conserved (no silent area change).

    Shape: one partial-aggregable parent groupBy plus one
    broadcast-friendly anti-join per level, over a table that only
    SHRINKS (complete families leave as one parent; incomplete
    cells exit to the output). `levels` is log-bounded by grid
    depth; dense continents collapse bottom-up while sparse
    coastlines exit early."""
    out = None
    cur = cells.select("latb", "lonb").distinct()
    for lvl in range(1, int(levels) + 1):
        par = cur.groupBy(
            F.shiftright("latb", 1).alias("platb"),
            F.shiftright("lonb", 1).alias("plonb"),
        ).agg(F.count("*").alias("_nc"))
        complete = par.where(F.col("_nc") == 4).select(
            "platb", "plonb"
        )
        kept = (
            cur.withColumn(
                "platb", F.shiftright("latb", 1)
            )
            .withColumn("plonb", F.shiftright("lonb", 1))
            .join(complete, ["platb", "plonb"], "left_anti")
            .select(
                F.lit(lvl - 1).cast("long").alias("level"),
                "latb",
                "lonb",
            )
        )
        out = kept if out is None else out.unionByName(kept)
        cur = complete.select(
            F.col("platb").alias("latb"),
            F.col("plonb").alias("lonb"),
        )
    top = cur.select(
        F.lit(int(levels)).cast("long").alias("level"),
        "latb",
        "lonb",
    )
    return out.unionByName(top)
