"""Hilbert curve keys: the locality-improved sibling of the Morton
z-order key (operators/urls.py q99/q100 zorder family).

Morton interleaving has worst-case jumps (adjacent cells can be
2^k apart on the curve at quadrant boundaries); the Hilbert curve
keeps every curve step between PHYSICALLY adjacent cells, so
range-partitioning a corpus by Hilbert key packs spatial neighbors
into the same file/partition strictly better — the property the
locality test asserts quantitatively against the Morton key.

Encoding is the classic xy -> d transform (Wikipedia "Hilbert
curve", public domain formulation): per bit level s = 2^(order-1)
.. 1, accumulate the quadrant index and rotate the coordinate
frame.  The Spark column emitter, the SQL CTE emitter, and an
independent python reference all implement the same per-level
formulas and are differentially tested against each other.

Scale shape: pure per-row integer arithmetic (map-only, no UDF,
no shuffle); `order` levels of staged projections keep the codegen
unit linear (each level references the previous level's columns
once — the HOF-CSE discipline), instead of one exponentially
nested expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hilbert_d(x: int, y: int, order: int) -> int:
    """Python reference (independent of the column/SQL emitters'
    staging): Hilbert distance of cell (x, y) on the 2^order grid."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def with_hilbert(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order: int,
    out_col: str = "hd",
) -> DataFrame:
    """Append the Hilbert distance of (x_col, y_col) (both must be
    in [0, 2^order)) as `out_col`, via `order` staged projections."""
    cur = df.withColumn("_hx", F.col(x_col).cast("long")).withColumn(
        "_hy", F.col(y_col).cast("long")
    ).withColumn("_hd", F.lit(0).cast("long"))
    s = 1 << (order - 1)
    while s > 0:
        rx = F.when((F.col("_hx").bitwiseAND(s)) > 0, 1).otherwise(0)
        ry = F.when((F.col("_hy").bitwiseAND(s)) > 0, 1).otherwise(0)
        nd = F.col("_hd") + F.lit(s * s).cast("long") * (
            (rx * 3).bitwiseXOR(ry)
        )
        fx = F.when(
            (ry == 0) & (rx == 1), F.lit(s - 1) - F.col("_hx")
        ).otherwise(F.col("_hx"))
        fy = F.when(
            (ry == 0) & (rx == 1), F.lit(s - 1) - F.col("_hy")
        ).otherwise(F.col("_hy"))
        nx = F.when(ry == 0, fy).otherwise(F.col("_hx"))
        ny = F.when(ry == 0, fx).otherwise(F.col("_hy"))
        cur = cur.select(
            *[c for c in cur.columns if c not in ("_hx", "_hy", "_hd")],
            nx.alias("_hx"),
            ny.alias("_hy"),
            nd.alias("_hd"),
        )
        s >>= 1
    return cur.drop("_hx", "_hy").withColumnRenamed("_hd", out_col)


def hilbert_sql(
    src_cte: str, x_expr: str, y_expr: str, order: int
) -> str:
    """Chained-CTE DuckDB form of the same per-level transform:
    returns SQL text defining CTE `hfinal(..., hd)` over `src_cte`
    (which must expose x/y via x_expr/y_expr plus carried columns
    as `carry`).  Same loop as with_hilbert — one emitter cannot
    drift from the other."""
    stages = [
        f"h0 AS (SELECT carry, CAST({x_expr} AS BIGINT) AS hx,"
        f" CAST({y_expr} AS BIGINT) AS hy,"
        f" CAST(0 AS BIGINT) AS hd FROM {src_cte})"
    ]
    i = 0
    s = 1 << (order - 1)
    while s > 0:
        i += 1
        # new_x = ry==0 ? (rx==1 ? s-1-hy : hy) : hx
        # new_y = ry==0 ? (rx==1 ? s-1-hx : hx) : hy
        # new_d = hd + s*s * xor(3*rx, ry)
        stages.append(
            f"""h{i} AS (
  SELECT carry,
    CASE WHEN (hy & {s}) = 0 THEN
      CASE WHEN (hx & {s}) > 0 THEN {s - 1} - hy ELSE hy END
    ELSE hx END AS hx,
    CASE WHEN (hy & {s}) = 0 THEN
      CASE WHEN (hx & {s}) > 0 THEN {s - 1} - hx ELSE hx END
    ELSE hy END AS hy,
    hd + {s * s} * xor(
      CASE WHEN (hx & {s}) > 0 THEN 3 ELSE 0 END,
      CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END) AS hd
  FROM h{i - 1})"""
        )
        s >>= 1
    stages.append(f"hfinal AS (SELECT carry, hd FROM h{i})")
    return ",\n".join(stages)


def bbox_hcells(
    bbox: tuple[int, int, int, int],
    order: int = 12,
    shift: int = 20,
    max_cells: int = 64,
) -> tuple[int, list[int]]:
    """Cover a bbox with <= max_cells level-k Hilbert prefixes.

    Mirrors geo/zorder.bbox_zcells: coarsen k until the coarse
    cell count fits, then map each coarse (cu, cv) through
    hilbert_d at order-k levels.  Correct because the Hilbert
    transform consumes bits top-down, so

        hd(x, y, order) >> 2k == hilbert_d(x >> k, y >> k, order-k)

    (the prefix property, asserted over random (order, k) in
    tests).  Superset cover — callers refine on exact coords.
    Driver-side cost O(max_cells)."""
    from .cells import LAT_OFFSET, LON_OFFSET

    lon_min, lat_min, lon_max, lat_max = bbox
    if lon_min > lon_max or lat_min > lat_max:
        return 0, []
    cv0 = (lat_min + LAT_OFFSET) >> shift
    cv1 = (lat_max + LAT_OFFSET) >> shift
    cu0 = (lon_min + LON_OFFSET) >> shift
    cu1 = (lon_max + LON_OFFSET) >> shift
    k = 0
    while ((cv1 >> k) - (cv0 >> k) + 1) * (
        (cu1 >> k) - (cu0 >> k) + 1
    ) > max_cells:
        k += 1
    cells = sorted(
        hilbert_d(cu, cv, order - k)
        for cv in range(cv0 >> k, (cv1 >> k) + 1)
        for cu in range(cu0 >> k, (cu1 >> k) + 1)
    )
    return k, cells


def bbox_hranges(
    bbox: tuple[int, int, int, int],
    order: int = 12,
    shift: int = 20,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Merged contiguous fine-hd ranges covering the bbox — the
    stored-column shape (BETWEENs reach the parquet scan).  The
    Hilbert curve's adjacency means covers merge into FEWER ranges
    than the Morton equivalent on the same box (tested)."""
    k, cells = bbox_hcells(
        bbox, order=order, shift=shift, max_cells=max_ranges
    )
    span = 1 << (2 * k)
    ranges: list[tuple[int, int]] = []
    for cell in cells:
        lo = cell * span
        hi = lo + span - 1
        if ranges and lo <= ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], max(ranges[-1][1], hi))
        else:
            ranges.append((lo, hi))
    return ranges
