"""Way-crossing detection: exact segment-segment intersection.

The map-QA question the reference cannot ask: which pairs of way
segments intersect WITHOUT sharing a junction node (a missing
bridge/junction in road data, a digitizing error in boundaries)?
The reference's object model only ever relates ways through shared
refs (osmconvert.c way-node pass, osmconvert.c:9541-9694); actual
geometric crossings are invisible to it.  NOT translated C code —
no reference tool has a segment-intersection pass.

Semantics (deterministic, exact):
  * a pair of CLOSED segments (A = a1a2, B = b1b2) from distinct
    (way, seg) positions intersects when they share at least one
    point; pairs are emitted once, ordered
    (way_a, seg_a) < (way_b, seg_b) lexicographically, and same-way
    non-adjacent self-intersections are included (adjacent segments
    share a ref and fall to the shared-node rule below).
  * pairs sharing a node REF are excluded — those meet by
    construction at the shared junction and are not defects.
  * kind = 'proper' when the interiors cross (both orientation
    sign pairs strictly alternate) | 'touch' when an endpoint lies
    exactly on the other segment (includes collinear overlap: any
    1-D overlap interval is delimited by segment endpoints, so at
    least one endpoint-on-segment test fires).

Exactness: each orientation value is a 2x2 integer cross product
cross(p2-p1, q-p1); coordinate differences fit int64, but the
products reach |dx|*|dy| <= 3.6e9 * 1.8e9 ~ 6.5e18 per term (1.3e19
for the difference), past int64 for world-spanning pairs — they are
carried as decimal(38,0), HUGEINT in the DuckDB oracle, exactly the
way_signed_area discipline (operators/linecover.py).

Plan (the 100-TB shape): each segment lands in its EXACT integer
supercover cells (linecover._sweep_cells, the proven q106 kernel);
any intersecting pair shares the cell of a common point, so one
cell equi-self-join is a COMPLETE candidate generator — never a
geometry cross-join.  Segment geometry rides the cover rows, so the
plan is: one refs⋈nodes shuffle + per-way window -> bounded in-row
cell explode -> one self-join shuffle on cell -> distinct on the
pair key.  `shift` is the replication-vs-candidates knob: bigger
cells mean fewer cover rows per segment but more candidate pairs
per cell (AQE skew-join splits dense cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..geo.cells import LAT_OFFSET, LON_OFFSET
from .linecover import _sweep_cells

_DEC = "decimal(20,0)"


def _cross(ox, oy, px, py, qx, qy):
    """Exact 2x2 cross product cross(P-O, Q-O) as decimal(38,0)."""
    return (F.col(px) - F.col(ox)).cast(_DEC) * (
        F.col(qy) - F.col(oy)
    ).cast(_DEC) - (F.col(py) - F.col(oy)).cast(_DEC) * (
        F.col(qx) - F.col(ox)
    ).cast(_DEC)


def _sgn(d):
    return (
        F.when(d > 0, F.lit(1))
        .when(d < 0, F.lit(-1))
        .otherwise(F.lit(0))
    )


def _on_seg(s, px, py, ax, ay, bx, by):
    """Point P lies on closed segment AB: collinear (sign s == 0)
    and inside AB's bbox."""
    return (
        (s == 0)
        & F.col(px).between(F.least(ax, bx), F.greatest(ax, bx))
        & F.col(py).between(F.least(ay, by), F.greatest(ay, by))
    )


def way_segments(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """(way_id, refs) x nodes -> one row per consecutive resolved
    ref pair: (way_id, seg_idx 1-based, ra, rb, ax, ay, bx, by)."""
    pos = ways.select(
        "way_id", F.posexplode("refs").alias("j", "ref")
    ).join(
        nodes.select(
            F.col("doc_id").alias("ref"),
            F.col("lon_i").alias("ax"),
            F.col("lat_i").alias("ay"),
        ),
        "ref",
    )
    w = Window.partitionBy("way_id").orderBy("j")
    return pos.select(
        "way_id",
        (F.col("j") + 1).cast("long").alias("seg_idx"),
        F.col("ref").alias("ra"),
        F.lead("ref").over(w).alias("rb"),
        "ax",
        "ay",
        F.lead("ax").over(w).alias("bx"),
        F.lead("ay").over(w).alias("by"),
    ).where(F.col("bx").isNotNull())


def way_crossings(
    ways: DataFrame, nodes: DataFrame, shift: int = 24
) -> DataFrame:
    """-> (way_a, seg_a, way_b, seg_b, kind): every intersecting
    segment pair not sharing a node ref; kind 'proper' | 'touch'.
    See module docstring for semantics, exactness, and plan."""
    if not 0 < shift <= 30:
        raise ValueError("shift must be in (0, 30] for exact int64")
    seg = way_segments(ways, nodes)

    geom = ["ra", "rb", "ax", "ay", "bx", "by"]
    cover = _sweep_cells(
        seg.select(
            "way_id",
            "seg_idx",
            *geom,
            (F.col("ax") + F.lit(LON_OFFSET)).alias("u"),
            (F.col("ay") + F.lit(LAT_OFFSET)).alias("v"),
            (F.col("bx") + F.lit(LON_OFFSET)).alias("u2"),
            (F.col("by") + F.lit(LAT_OFFSET)).alias("v2"),
        ),
        ["way_id", "seg_idx", *geom],
        shift,
    ).distinct()

    a = cover.select(
        F.col("way_id").alias("way_a"),
        F.col("seg_idx").alias("seg_a"),
        *[F.col(c).alias(f"{c}_1") for c in geom],
        "cell",
    )
    b = cover.select(
        F.col("way_id").alias("way_b"),
        F.col("seg_idx").alias("seg_b"),
        *[F.col(c).alias(f"{c}_2") for c in geom],
        "cell",
    )
    pairs = (
        a.join(b, "cell")
        .where(
            (F.col("way_a") < F.col("way_b"))
            | (
                (F.col("way_a") == F.col("way_b"))
                & (F.col("seg_a") < F.col("seg_b"))
            )
        )
        # junction by construction: segments sharing a node ref
        .where(
            (F.col("ra_1") != F.col("ra_2"))
            & (F.col("ra_1") != F.col("rb_2"))
            & (F.col("rb_1") != F.col("ra_2"))
            & (F.col("rb_1") != F.col("rb_2"))
        )
        .drop("cell")
        .distinct()
    )

    d1 = _cross("ax_1", "ay_1", "bx_1", "by_1", "ax_2", "ay_2")
    d2 = _cross("ax_1", "ay_1", "bx_1", "by_1", "bx_2", "by_2")
    d3 = _cross("ax_2", "ay_2", "bx_2", "by_2", "ax_1", "ay_1")
    d4 = _cross("ax_2", "ay_2", "bx_2", "by_2", "bx_1", "by_1")
    scored = pairs.select(
        "way_a",
        "seg_a",
        "way_b",
        "seg_b",
        *[f"{c}_1" for c in geom[2:]],
        *[f"{c}_2" for c in geom[2:]],
        _sgn(d1).alias("s1"),
        _sgn(d2).alias("s2"),
        _sgn(d3).alias("s3"),
        _sgn(d4).alias("s4"),
    )

    proper = (F.col("s1") * F.col("s2") == -1) & (
        F.col("s3") * F.col("s4") == -1
    )
    ab1 = ("ax_1", "ay_1", "bx_1", "by_1")
    ab2 = ("ax_2", "ay_2", "bx_2", "by_2")
    touch = (
        _on_seg(F.col("s1"), "ax_2", "ay_2", *map(F.col, ab1))
        | _on_seg(F.col("s2"), "bx_2", "by_2", *map(F.col, ab1))
        | _on_seg(F.col("s3"), "ax_1", "ay_1", *map(F.col, ab2))
        | _on_seg(F.col("s4"), "bx_1", "by_1", *map(F.col, ab2))
    )
    return (
        scored.where(proper | touch)
        .select(
            "way_a",
            "seg_a",
            "way_b",
            "seg_b",
            F.when(proper, F.lit("proper"))
            .otherwise(F.lit("touch"))
            .alias("kind"),
        )
    )
