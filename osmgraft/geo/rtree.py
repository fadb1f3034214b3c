"""Broadcast STR-packed polygon R-tree for exact point-in-polygon.

The third physical strategy for the N-polygon assignment (G1/J5),
alongside the linear bbox scan (pip.assign_polygons) and the
decided-cell cover (cover.build_cell_cover):

  * pip.assign_polygons — O(P) vectorized bbox tests per point
    batch; right when P (polygon count) is tens.
  * cover — O(1) grid classify per point; right when the polygon
    set is fixed and a few MB of grid can be precomputed.
  * THIS — O(log P) MBR-tree descent per point batch; right when P
    is large (thousands of admin boundaries, planet-scale) and the
    per-polygon candidate sets are sparse, so a linear bbox sweep
    over every polygon per batch dominates.

Sort-Tile-Recursive packing (Leutenegger et al., "STR: A Simple and
Efficient Algorithm for R-Tree Packing", ICDE 1997): sort entry MBR
centers by x, cut into vertical slices of ~sqrt(n/cap) runs, sort
each slice by y, pack consecutive runs of `cap` entries into nodes;
repeat bottom-up until one root. Packing is fully deterministic
(numpy stable argsort on integer keys).

The candidate semantics are EXACTLY the per-polygon bbox prefilter
of pip.assign_polygons (point inside the polygon's vertex bbox), so
routing the same order-dependent admin-level state machine
(osmassignpoly.c:1758-1783 — semantics reimplemented, not
translated) over R-tree candidates provably returns identical
region/subregion assignments; tests/test_rtree.py asserts equality
on randomized polygon sets.

At 100 TB: the tree is a handful of int64 numpy arrays built once
on the driver and broadcast (O(P) memory, ~64 bytes/polygon); every
executor answers point batches locally — one scan, one Arrow stage,
zero shuffles, same plan shape as assign_regions.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_DEFAULT_CAP = 16


@dataclass
class STRtree:
    """Static packed R-tree over int64 MBRs.

    Flat layout: nodes are numbered 0..n_nodes-1 in build order
    (leaves first, then each parent level, root last). For node k,
    children[k] = (lo, hi) slice into `order` (leaf level: indices
    of the original entries; inner levels: child node ids).
    """

    # per node: MBR and child slice
    nx1: np.ndarray
    ny1: np.ndarray
    nx2: np.ndarray
    ny2: np.ndarray
    child_lo: np.ndarray
    child_hi: np.ndarray
    is_leaf: np.ndarray  # bool per node
    order: np.ndarray  # concatenated child lists (entry ids / node ids)
    root: int
    n_entries: int

    @staticmethod
    def build(
        bx1: np.ndarray,
        by1: np.ndarray,
        bx2: np.ndarray,
        by2: np.ndarray,
        cap: int = _DEFAULT_CAP,
    ) -> "STRtree":
        bx1 = np.asarray(bx1, dtype=np.int64)
        by1 = np.asarray(by1, dtype=np.int64)
        bx2 = np.asarray(bx2, dtype=np.int64)
        by2 = np.asarray(by2, dtype=np.int64)
        n = len(bx1)
        if n == 0:
            z = np.zeros(0, dtype=np.int64)
            return STRtree(z, z, z, z, z, z,
                           np.zeros(0, dtype=bool), z, -1, 0)

        def str_pack(cx, cy, ids):
            """One STR level: group `ids` (sorted by center) into
            runs of <= cap; returns list of id-arrays."""
            m = len(ids)
            n_nodes = -(-m // cap)
            n_slices = int(np.ceil(np.sqrt(n_nodes)))
            per_slice = n_slices * cap
            # stable sort by x center, slice, then by y within slice
            sx = ids[np.argsort(cx[ids], kind="stable")]
            groups = []
            for s in range(0, m, per_slice):
                sl = sx[s : s + per_slice]
                sl = sl[np.argsort(cy[sl], kind="stable")]
                for t in range(0, len(sl), cap):
                    groups.append(sl[t : t + cap])
            return groups

        nx1, ny1, nx2, ny2 = [], [], [], []
        child_lo, child_hi, is_leaf, order = [], [], [], []

        # level 0: entries -> leaves
        cx = (bx1 + bx2) // 2
        cy = (by1 + by2) // 2
        groups = str_pack(cx, cy, np.arange(n, dtype=np.int64))
        level_ids = []
        for g in groups:
            lo = sum(len(o) for o in order)
            order.append(g)
            child_lo.append(lo)
            child_hi.append(lo + len(g))
            nx1.append(bx1[g].min())
            ny1.append(by1[g].min())
            nx2.append(bx2[g].max())
            ny2.append(by2[g].max())
            is_leaf.append(True)
            level_ids.append(len(nx1) - 1)

        # upper levels: nodes -> parent nodes until a single root
        while len(level_ids) > 1:
            lv = np.array(level_ids, dtype=np.int64)
            ncx = (np.array(nx1, dtype=np.int64)[lv]
                   + np.array(nx2, dtype=np.int64)[lv]) // 2
            ncy = (np.array(ny1, dtype=np.int64)[lv]
                   + np.array(ny2, dtype=np.int64)[lv]) // 2
            # str_pack indexes cx/cy by id value, so pass center
            # arrays addressed by node id
            full_cx = np.zeros(len(nx1), dtype=np.int64)
            full_cy = np.zeros(len(nx1), dtype=np.int64)
            full_cx[lv] = ncx
            full_cy[lv] = ncy
            groups = str_pack(full_cx, full_cy, lv)
            nxt = []
            ax1 = np.array(nx1, dtype=np.int64)
            ay1 = np.array(ny1, dtype=np.int64)
            ax2 = np.array(nx2, dtype=np.int64)
            ay2 = np.array(ny2, dtype=np.int64)
            for g in groups:
                lo = sum(len(o) for o in order)
                order.append(g)
                child_lo.append(lo)
                child_hi.append(lo + len(g))
                nx1.append(ax1[g].min())
                ny1.append(ay1[g].min())
                nx2.append(ax2[g].max())
                ny2.append(ay2[g].max())
                is_leaf.append(False)
                nxt.append(len(nx1) - 1)
            level_ids = nxt

        return STRtree(
            np.array(nx1, dtype=np.int64),
            np.array(ny1, dtype=np.int64),
            np.array(nx2, dtype=np.int64),
            np.array(ny2, dtype=np.int64),
            np.array(child_lo, dtype=np.int64),
            np.array(child_hi, dtype=np.int64),
            np.array(is_leaf, dtype=bool),
            np.concatenate(order).astype(np.int64),
            level_ids[0],
            n,
        )

    def query_candidates(
        self, px: np.ndarray, py: np.ndarray,
        bx1: np.ndarray, by1: np.ndarray,
        bx2: np.ndarray, by2: np.ndarray,
    ) -> dict:
        """Batch stabbing query: {entry_id -> point-index array} for
        every entry whose MBR contains the point. The per-entry
        index arrays are ascending (candidate masks are built by
        boolean indexing of an ascending base array), matching the
        np.nonzero order the linear scan sees."""
        out = {}
        if self.root < 0 or len(px) == 0:
            return out
        base = np.arange(len(px), dtype=np.int64)
        stack = [(self.root, base)]
        while stack:
            node, idx = stack.pop()
            m = (
                (px[idx] >= self.nx1[node])
                & (px[idx] <= self.nx2[node])
                & (py[idx] >= self.ny1[node])
                & (py[idx] <= self.ny2[node])
            )
            if not m.any():
                continue
            idx = idx[m]
            kids = self.order[self.child_lo[node] : self.child_hi[node]]
            if self.is_leaf[node]:
                for e in kids:
                    em = (
                        (px[idx] >= bx1[e])
                        & (px[idx] <= bx2[e])
                        & (py[idx] >= by1[e])
                        & (py[idx] <= by2[e])
                    )
                    if em.any():
                        out[int(e)] = idx[em]
            else:
                for k in kids:
                    stack.append((int(k), idx))
        return out


def build_polyset_rtree(ps, cap: int = _DEFAULT_CAP) -> STRtree:
    """STR-pack the vertex bboxes of a PolygonSet (file order ids)."""
    if len(ps) == 0:
        z = np.zeros(0, dtype=np.int64)
        return STRtree.build(z, z, z, z, cap=cap)
    return STRtree.build(ps.bbx1, ps.bby1, ps.bbx2, ps.bby2, cap=cap)


_INT_MAX = np.int64(2**31 - 1)


def assign_polygons_rtree(
    px: np.ndarray, py: np.ndarray, ps, tree: STRtree
) -> tuple[np.ndarray, np.ndarray]:
    """pip.assign_polygons with R-tree candidate pruning.

    Identical output (tested): candidates(i) == points passing the
    linear scan's per-polygon bbox test, and the admin-level state
    machine below visits polygons in the same file order with the
    same per-polygon point sets, so every region/subregion update
    sequence is identical.
    """
    from .pip import crossings

    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    n = len(px)
    region = np.full(n, -1, dtype=np.int64)
    subregion = np.full(n, -1, dtype=np.int64)
    if len(ps) == 0 or n == 0:
        return region.astype(np.int32), subregion.astype(np.int32)

    cands = tree.query_candidates(
        px, py, ps.bbx1, ps.bby1, ps.bbx2, ps.bby2
    )

    level = np.full(n, _INT_MAX, dtype=np.int64)
    sublevel = np.full(n, -1, dtype=np.int64)

    # file order — the tie-break state machine is order-dependent
    for i in sorted(cands):
        idx = cands[i]
        es = ps.polys[i]
        ins = (crossings(px[idx], py[idx], es) & 1) != 0
        hit = idx[ins]
        if len(hit) == 0:
            continue
        admin = ps.admin_levels[i]
        lower = admin < level[hit]
        demote = hit[lower & (region[hit] >= 0) & (subregion[hit] < 0)]
        sublevel[demote] = level[demote]
        subregion[demote] = region[demote]
        take = hit[lower]
        level[take] = admin
        region[take] = i
        upper = (~lower) & (admin > level[hit]) & (admin > sublevel[hit])
        up = hit[upper]
        sublevel[up] = admin
        subregion[up] = i

    return region.astype(np.int32), subregion.astype(np.int32)
