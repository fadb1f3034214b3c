"""Decided-cell polygon cover: an S2-style region cover over the
engine's tile-cell grid (geo/cells.py).

The idea (standard region-cover construction, cf. the S2 library's
RegionCoverer and every quadtree PIP accelerator): quantize the
polygon set's global bbox into a grid of cells and classify each
cell as

  * BOUNDARY — some polygon boundary segment passes through (or
    touches) the cell.  Points here need the exact PIP kernel.
  * DECIDED  — no boundary segment anywhere in the cell, so every
    polygon's inside/outside verdict is CONSTANT across the cell,
    hence the full (region, subregion) assignment — an order-
    dependent but deterministic function of that inside-vector
    (osmassignpoly.c:1761-1783) — is constant too.  It is computed
    once, on the cell's center, at build time.

Correctness argument (why a decided cell's assignment is constant):
take any two points p, q strictly inside the same decided cell and
the straight path between them. A point's even-odd parity w.r.t. a
polygon changes only where the path crosses that polygon's boundary;
the boundary is a subset of the union of its segments' bounding
boxes, and every cell overlapping any segment bbox is marked
BOUNDARY (the marking rasterizes each segment's bbox onto the grid,
a conservative superset of the cells the segment actually visits).
So no boundary point lies in a decided cell and the parity — and the
assignment — cannot change inside it. Points exactly ON a boundary
always fall in BOUNDARY cells and therefore always take the exact
kernel, so the reference's half-open / cross-product tie rules
(osmconvert.c:2086-2115) are preserved bit-exactly.

Vertical (north-south) segments are dropped from the crossing-count
arrays at build time (osmconvert.c:1907-1910, a legal optimization
for ray casting) but they ARE boundary — EdgeSet retains them as
(vx, vy1, vy2) precisely so this classifier can mark their cells.

Scale: the cover is built once on the driver in O(E · cells/segment
+ #cells) and broadcast; #cells is capped (``max_cells``) by
coarsening the grid, so driver memory is bounded regardless of data
size. At 100 TB the win is that the fraction of points taking the
exact-PIP kernel drops to ~ perimeter·cellsize/area of the polygon
set — the classic quadtree/S2 argument — while every other point is
a single broadcast array lookup.

NOT translated C code: the reference has no cell cover; this is the
standard construction applied to the engine's own grid.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .cells import LAT_OFFSET, LON_OFFSET
from .pip import PolygonSet, assign_polygons

#: hard cap on grid cells (driver + broadcast memory bound)
DEFAULT_MAX_CELLS = 1 << 16


@dataclass
class CellCover:
    """Broadcastable decided-cell index over one PolygonSet."""

    shift: int
    x_lo: int          # first lon band of the grid
    y_lo: int          # first lat band of the grid
    nx: int
    ny: int
    boundary: np.ndarray    # bool[ny, nx] — needs exact kernel
    region_idx: np.ndarray  # int32[ny, nx] — -1 outside / boundary
    sub_idx: np.ndarray     # int32[ny, nx]
    polyset: PolygonSet     # exact kernel for boundary cells

    @property
    def n_cells(self) -> int:
        return self.nx * self.ny

    @property
    def decided_frac(self) -> float:
        return 1.0 - float(self.boundary.mean()) if self.n_cells else 1.0

    def classify(
        self, px: np.ndarray, py: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized lookup -> (region, sub, needs_exact).

        Points outside the grid (outside the global bbox) are
        decided-outside: region -1, needs_exact False.
        """
        cx = ((px + LON_OFFSET) >> self.shift) - self.x_lo
        cy = ((py + LAT_OFFSET) >> self.shift) - self.y_lo
        in_grid = (cx >= 0) & (cx < self.nx) & (cy >= 0) & (cy < self.ny)
        cxc = np.clip(cx, 0, self.nx - 1)
        cyc = np.clip(cy, 0, self.ny - 1)
        needs = self.boundary[cyc, cxc] & in_grid
        r = np.where(in_grid, self.region_idx[cyc, cxc], -1)
        s = np.where(in_grid, self.sub_idx[cyc, cxc], -1)
        r = np.where(needs, -1, r)
        s = np.where(needs, -1, s)
        return r.astype(np.int32), s.astype(np.int32), needs


def _mark_bboxes(
    mask: np.ndarray,
    bx1: np.ndarray,
    by1: np.ndarray,
    bx2: np.ndarray,
    by2: np.ndarray,
    shift: int,
    x_lo: int,
    y_lo: int,
) -> None:
    """Rasterize segment bboxes onto the grid mask (inclusive).

    Per-segment Python loop, but the loop body is a slice store;
    cost is O(E · cells/segment) once, on the driver, at build time.
    """
    ny, nx = mask.shape
    cx1 = np.clip(((bx1 + LON_OFFSET) >> shift) - x_lo, 0, nx - 1)
    cx2 = np.clip(((bx2 + LON_OFFSET) >> shift) - x_lo, 0, nx - 1)
    cy1 = np.clip(((by1 + LAT_OFFSET) >> shift) - y_lo, 0, ny - 1)
    cy2 = np.clip(((by2 + LAT_OFFSET) >> shift) - y_lo, 0, ny - 1)
    for i in range(len(cx1)):
        mask[cy1[i] : cy2[i] + 1, cx1[i] : cx2[i] + 1] = True


def _mark_segments(
    mask: np.ndarray,
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
    shift: int,
    x_lo: int,
    y_lo: int,
) -> None:
    """Supercover marking of sloped segments by sampling.

    Marking the full bbox of a long diagonal segment floods a huge
    rectangle of cells; instead sample the segment at steps of half
    a cell side and mark each sample's 3x3 neighborhood. Any
    segment point is within half a cell (L-inf) of some sample, so
    the 3x3 dilation makes the marked set a SUPERSET of every cell
    the segment touches — conservative, hence still correct — while
    staying O(length/cellsize) cells per segment.
    """
    ny, nx = mask.shape
    half = 1 << (shift - 1)
    span = np.maximum(np.abs(bx - ax), np.abs(by - ay))
    n_steps = (span // half + 2).astype(np.int64)
    for i in range(len(ax)):
        t = np.arange(n_steps[i] + 1, dtype=np.int64)
        # integer lerp: a + d*t//n is within 1 unit of the real
        # segment — absorbed by the 3x3 dilation
        sx = ax[i] + (bx[i] - ax[i]) * t // n_steps[i]
        sy = ay[i] + (by[i] - ay[i]) * t // n_steps[i]
        cx = ((sx + LON_OFFSET) >> shift) - x_lo
        cy = ((sy + LAT_OFFSET) >> shift) - y_lo
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                gx = np.clip(cx + dx, 0, nx - 1)
                gy = np.clip(cy + dy, 0, ny - 1)
                mask[gy, gx] = True


def build_cell_cover(
    polyset: PolygonSet,
    shift: int = 14,
    max_cells: int = DEFAULT_MAX_CELLS,
) -> CellCover:
    """Build the decided-cell cover. ``shift`` is coarsened (cells
    doubled in each axis) until the grid fits ``max_cells``."""
    gx1, gy1, gx2, gy2 = polyset.global_bbox
    while True:
        x_lo = (gx1 + LON_OFFSET) >> shift
        x_hi = (gx2 + LON_OFFSET) >> shift
        y_lo = (gy1 + LAT_OFFSET) >> shift
        y_hi = (gy2 + LAT_OFFSET) >> shift
        nx = int(x_hi - x_lo + 1)
        ny = int(y_hi - y_lo + 1)
        if nx * ny <= max_cells:
            break
        shift += 1

    boundary = np.zeros((ny, nx), dtype=bool)
    for es in polyset.polys:
        # sloped/horizontal segments: sampled supercover (a long
        # diagonal's bbox would flood the grid)
        _mark_segments(
            boundary, es.x1, es.y1, es.x2, es.y2, shift, x_lo, y_lo
        )
        # exactly-vertical segments (retained by build_edges)
        _mark_bboxes(
            boundary, es.vx, es.vy1, es.vx, es.vy2, shift, x_lo, y_lo
        )

    # assignment at each decided cell's center; boundary cells get
    # -1 (never read — classify() routes them to the exact kernel)
    dec_y, dec_x = np.nonzero(~boundary)
    half = 1 << (shift - 1)
    cpx = ((dec_x + x_lo) << shift) + half - LON_OFFSET
    cpy = ((dec_y + y_lo) << shift) + half - LAT_OFFSET
    region_idx = np.full((ny, nx), -1, dtype=np.int32)
    sub_idx = np.full((ny, nx), -1, dtype=np.int32)
    if len(dec_x):
        r, s = assign_polygons(
            cpx.astype(np.int64), cpy.astype(np.int64), polyset
        )
        region_idx[dec_y, dec_x] = r
        sub_idx[dec_y, dec_x] = s
    return CellCover(
        shift=shift, x_lo=int(x_lo), y_lo=int(y_lo), nx=nx, ny=ny,
        boundary=boundary, region_idx=region_idx, sub_idx=sub_idx,
        polyset=polyset,
    )
