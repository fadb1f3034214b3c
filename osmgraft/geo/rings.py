"""G9/G10: relation -> .poly ring assembly + polygon simplification,
an exact replica of osmrelpoly's algorithms (osmrelpoly.c):

- simplify_coords: posw__simplify (osmrelpoly.c:2089-2197) — 3-point
  sliding window; drop the middle vertex when the spanning-triangle
  area (exact C integer formula, cosrk latitude correction) is <= n^2
  and the cumulated dropped area is < n^2.
- assemble_rings: posr_setend (osmrelpoly.c:2520-2720) — closed
  member ways emit directly; open ways chain greedily by endpoint
  node ids in either direction with stamps preventing cycles; rings
  are written back along the chain with per-way reversal; inner
  rings carry negative section numbers ('!' in .poly); inners are
  skipped entirely when there is no outer section or >= 2 unclosed
  outer chains; consecutive duplicate vertices are suppressed within
  a section.

These kernels are pure Python/ints (driver- or applyInPandas-side;
a relation's member ways always fit in one task). The Spark operator
lives in operators/rings_op.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from .bboxtags import cosrk_table

_COSRK = cosrk_table()


def _cosrk(lat: int) -> int:
    i = abs(lat) // 1_000_000
    return _COSRK[min(i, 900)]


def _tdiv(a: int, b: int) -> int:
    """C trunc division."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def simplify_coords(
    coords: list[tuple[int, int]], simplify: int
) -> list[tuple[int, int]]:
    """posw__simplify replica over one way's fixed-point coords.
    simplify: the SQUARED parameter (the reference squares the CLI
    meters value at parse, osmrelpoly.c:3524-3526); 0 = keep all."""
    if simplify <= 0 or len(coords) <= 2:
        return list(coords)
    out: list[tuple[int, int]] = []
    xll, yll = coords[0]
    xl, yl = coords[1]
    areasum = 0
    for x, y in coords[2:]:
        area = (x - xll) * (y - yll)
        area -= (xl - xll) * (yl - yll)
        area -= (x - xl) * (y - yl)
        area = _tdiv(area, 2)
        area -= (xl - xll) * (y - yl)
        if area < 0:
            area = -area
        area = _tdiv(area, _cosrk(yl))
        if area <= simplify and areasum < simplify:
            # middle point nearly redundant: overwrite with new
            xl, yl = x, y
            areasum += area
        else:
            out.append((xll, yll))
            xll, yll = xl, yl
            xl, yl = x, y
            areasum = 0
    out.append((xll, yll))
    out.append((xl, yl))
    return out


def poly_text(
    name: str, rings: list[tuple[int, list[tuple[int, int]]]]
) -> str:
    """K5 .poly sink: serialize one polygon exactly as the reference
    does (posr__writepolygon osmrelpoly.c:2352-2420 +
    posr__writepolygonheader 2335-2350): name line (only when at
    least one section exists), per section a number line ('!' for
    inner), ' x y' vertex lines with full 7 decimals
    (write_sfix7o keeps trailing zeros), 'END' per section, then
    'END' + blank line as the polygon footer."""
    from .fixedpoint import format_fix7

    out: list[str] = []
    if rings:
        out.append(name + "\n")
        for subn, verts in rings:
            out.append(
                (f"!{-subn}" if subn < 0 else str(subn)) + "\n"
            )
            for x, y in verts:
                out.append(f" {format_fix7(x)} {format_fix7(y)}\n")
            out.append("END\n")
    out.append("END\n\n")
    return "".join(out)


@dataclass
class MemberWay:
    first: int  # first node id (0 = removed)
    last: int
    coords: list[tuple[int, int]]
    stamp: int = 0


def _emit(
    ring: list[tuple[int, int]], coords: list[tuple[int, int]],
    reverse: bool,
) -> None:
    """posr__writepolygon body: append coords (optionally reversed)
    suppressing consecutive duplicates within the section."""
    seq = reversed(coords) if reverse else coords
    for x, y in seq:
        if ring and ring[-1] == (x, y):
            continue
        ring.append((x, y))


def _process(
    ways: list[MemberWay], rings: list, sign: int, subn_start: int
) -> tuple[int, int]:
    """One role group (outer or inner): closed ways first, then
    greedy endpoint chaining. Returns (subn, unclosedn)."""
    subn = subn_start
    unclosed = 0
    # closed ways
    for w in ways:
        if w.first != 0 and w.first == w.last:
            subn += 1
            ring: list[tuple[int, int]] = []
            _emit(ring, w.coords, False)
            rings.append((sign * subn, ring))
            w.first = 0
    # open chains
    n_ways = len(ways)
    ia = 0
    stamp = 0
    while True:
        stamp += 1
        while ia < n_ways and ways[ia].first == 0:
            ia += 1
        if ia >= n_ways:
            break
        elea = ways[ia]
        node = elea.first
        closingnode = elea.last
        elea.stamp = stamp
        # forward walk to find the chain's far end
        ele = elea
        i = ia + 1
        while i < n_ways:
            e = ways[i]
            if e.first != 0 and e.stamp != stamp:
                if e.first == node:
                    ele, node = e, e.last
                    e.stamp = stamp
                    i = ia
                elif e.last == node:
                    ele, node = e, e.first
                    e.stamp = stamp
                    i = ia
            i += 1
        if node != closingnode:
            unclosed += 1
        # backward walk, writing
        subn += 1
        ring = []
        while True:
            if node == ele.first:
                _emit(ring, ele.coords, False)
                node = ele.last
            else:
                _emit(ring, ele.coords, True)
                node = ele.first
            ele.first = 0
            nxt = None
            for e in ways[ia:]:
                if e.first != 0 and (e.first == node or e.last == node):
                    nxt = e
                    break
            if nxt is None:
                break
            ele = nxt
        rings.append((sign * subn, ring))
    return subn, unclosed


def assemble_rings(
    members: list[tuple[int, int, list[tuple[int, int]], bool]],
    simplify: int = 0,
) -> list[tuple[int, list[tuple[int, int]]]]:
    """members: (first_node_id, last_node_id, coords, is_inner) in
    relation-member order. Returns [(signed_subn, vertices)] —
    negative subn = inner ring ('!' section in .poly)."""
    outer = [
        MemberWay(f, l, simplify_coords(c, simplify))
        for f, l, c, inner in members
        if not inner
    ]
    inner = [
        MemberWay(f, l, simplify_coords(c, simplify))
        for f, l, c, is_in in members
        if is_in
    ]
    rings: list[tuple[int, list[tuple[int, int]]]] = []
    if not outer:
        return rings
    subn, unclosed = _process(outer, rings, 1, 0)
    # osmrelpoly.c:2659-2663: no inners when no outer section or
    # >= 2 unclosed outer chains
    if subn == 0 or unclosed >= 2:
        return rings
    _process(inner, rings, -1, subn)
    return rings
