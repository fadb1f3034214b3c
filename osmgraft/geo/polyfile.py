"""Osmosis `.poly` border-file parsing/writing.

Two dialects replicated:

  * osmconvert `-B=` single border (border_file, osmconvert.c:
    1840-2037): ALL coordinate sections in the file fold into ONE
    even-odd edge set (holes = extra rings); any non-indented line is
    a section break; the enclosing bbox is derived from the EDGES
    after vertical-edge dropping.

  * osmassignpoly multi-polygon (poly_file, osmassignpoly.c:
    1257-1478): polygon datasets delimited by two sequential `END`
    lines; a dataset starts with a headline `Name[<sep>admin_level]`
    (separator default `;`, osmassignpoly.c:4638-4645); ring-id lines
    (`1`, `!2`, ...) are ignored; per-polygon bbox tracked over raw
    vertices. `END` is recognized by prefix (strzcmp semantics,
    osmassignpoly.c:495-516); blank lines are skipped.

Vertices convert to fixed point with the `+0.5` truncating round
(osmconvert.c:1902-1903); implausible coordinates (|lon|>180.1 or
|lat|>90.1) are ignored.
"""

from __future__ import annotations

import re

import numpy as np

from .fixedpoint import deg_to_fix_round
from .pip import EdgeSet, PolygonSet, build_edges

_COORD_RE = re.compile(
    r"^\s*([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
    r"\s+([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
)


def _parse_coord_line(line: str):
    m = _COORD_RE.match(line[1:])
    if not m:
        return None
    xf, yf = float(m.group(1)), float(m.group(2))
    if xf < -180.1 or xf > 180.1 or yf < -90.1 or yf > 90.1:
        return None
    return int(deg_to_fix_round(xf)), int(deg_to_fix_round(yf))


def _leading_int(s: str) -> int:
    m = re.match(r"\s*([+-]?\d+)", s)
    return int(m.group(1)) if m else 0


def parse_border(text: str) -> EdgeSet:
    """osmconvert `-B=` dialect -> one even-odd EdgeSet."""
    rings = []
    cur_x, cur_y = [], []
    for line in text.splitlines():
        if line[:1] in (" ", "\t"):
            c = _parse_coord_line(line)
            if c is not None:
                cur_x.append(c[0])
                cur_y.append(c[1])
        else:
            if cur_x:
                rings.append((cur_x, cur_y))
                cur_x, cur_y = [], []
    if cur_x:
        rings.append((cur_x, cur_y))
    return build_edges(rings, bbox_from_vertices=False)


def parse_multipoly(
    text: str, admin_sep: str | None = ";"
) -> PolygonSet:
    """osmassignpoly dialect -> ordered PolygonSet.

    admin_sep=None reproduces running without --use-admin-levels
    (whole headline is the name, admin_level stays 0).
    """
    names: list[str] = []
    admins: list[int] = []
    polys: list[EdgeSet] = []

    cur = None  # (name, admin, rings) of the open polygon dataset
    cur_x, cur_y = [], []
    endn = 2

    def close_ring():
        nonlocal cur_x, cur_y
        if cur_x and cur is not None:
            cur[2].append((cur_x, cur_y))
        cur_x, cur_y = [], []

    def close_poly():
        nonlocal cur
        if cur is not None:
            names.append(cur[0])
            admins.append(cur[1])
            polys.append(build_edges(cur[2], bbox_from_vertices=True))
            cur = None

    for line in text.splitlines():
        if not line.strip():
            continue  # poly_file skips empty lines (osmassignpoly.c:1305-1308)
        if line[:1] in (" ", "\t"):
            endn = 0
            c = _parse_coord_line(line)
            if c is not None:
                cur_x.append(c[0])
                cur_y.append(c[1])
        else:
            close_ring()
            stripped = line.rstrip("\r\n")
            if stripped.startswith("END"):
                endn += 1
            if endn >= 2:
                close_poly()
                if not stripped.startswith("END") and stripped:
                    # new headline
                    name, admin = stripped, 0
                    if admin_sep is not None:
                        pos = stripped.find(admin_sep)
                        if pos >= 0:
                            name = stripped[:pos]
                            admin = _leading_int(
                                stripped[pos + len(admin_sep):]
                            )
                    cur = (name, admin, [])
                    endn = 0
    close_ring()
    close_poly()
    return PolygonSet(names, np.asarray(admins), polys)


def write_multipoly(polyset_spec, admin_sep: str = ";") -> str:
    """Serialize [(name, admin_level, [(xs_deg, ys_deg), ...]), ...]
    (degree floats) into the multi-polygon text dialect — used to
    feed the SAME fixture to the compiled reference binaries.
    Inner (hole) rings get `!`-prefixed ring ids per convention.
    """
    out = []
    for name, admin, rings in polyset_spec:
        out.append(f"{name}{admin_sep}{admin}" if admin is not None else name)
        for ri, (xs, ys) in enumerate(rings, start=1):
            out.append(str(ri) if ri == 1 else f"!{ri}")
            for x, y in zip(xs, ys):
                out.append(f"   {x:.7f}   {y:.7f}")
            out.append("END")
        out.append("END")
    return "\n".join(out) + "\n"
