"""Unit tests for the numpy PIP kernel (no Spark, no reference bin)."""

import numpy as np

from osmgraft.geo.fixedpoint import (
    deg_to_fix_round,
    deg_to_fix_trunc,
    format_fix7,
)
from osmgraft.geo.pip import (
    PolygonSet,
    assign_polygons,
    build_edges,
    crossings,
    query_inside,
)
from osmgraft.geo.polyfile import parse_border, parse_multipoly

SC = 10_000_000


def sq(x1, y1, x2, y2):
    """closed square ring in fixed point"""
    return (
        [x1 * SC, x2 * SC, x2 * SC, x1 * SC, x1 * SC],
        [y1 * SC, y1 * SC, y2 * SC, y2 * SC, y1 * SC],
    )


def test_fixedpoint_conversions():
    assert deg_to_fix_trunc(11.0) == 110000000
    assert deg_to_fix_round(11.0) == 110000000
    # -b= truncation vs .poly rounding differ on negatives
    assert deg_to_fix_trunc(-0.00000005) == 0
    assert deg_to_fix_round(-0.00000005) == 0
    assert deg_to_fix_trunc(-1.00000005) == -10000000
    # trunc(x*1e7+0.5): -10000000.5+0.5 = -10000000.0 -> -10000000
    assert deg_to_fix_round(-1.00000005) == -10000000
    assert format_fix7(491000000) == "49.1000000"
    assert format_fix7(-5) == "-0.0000005"
    assert format_fix7(0) == "0.0000000"


def test_square_basic():
    es = build_edges([sq(10, 40, 20, 50)])
    # vertical edges dropped -> only 2 horizontal edges remain
    assert es.n_edges == 2
    px = np.array([15, 5, 25, 15, 15], dtype=np.int64) * SC
    py = np.array([45, 45, 45, 35, 55], dtype=np.int64) * SC
    np.testing.assert_array_equal(
        query_inside(px, py, es), [True, False, False, False, False]
    )


def test_half_open_x_range():
    """x1 <= x < x2: west edge inclusive, east edge exclusive."""
    es = build_edges([sq(10, 40, 20, 50)])
    west = query_inside(np.array([10 * SC]), np.array([45 * SC]), es)
    east = query_inside(np.array([20 * SC]), np.array([45 * SC]), es)
    assert west[0] and not east[0]


def test_on_south_edge_and_north_edge():
    es = build_edges([sq(10, 40, 20, 50)])
    # point exactly ON the south edge: edge y == point y -> the
    # south edge does not count (y1 > y fails); the north edge does
    # -> 1 crossing -> inside
    south = query_inside(np.array([15 * SC]), np.array([40 * SC]), es)
    assert south[0]
    # point exactly ON the north edge: no edge north of it -> outside
    # ... but bbox check: y == by2 passes; crossings = 0 -> outside
    north = query_inside(np.array([15 * SC]), np.array([50 * SC]), es)
    assert not north[0]


def test_hole_even_odd():
    es = build_edges([sq(0, 0, 30, 30), sq(10, 10, 20, 20)])
    px = np.array([15, 5, 15], dtype=np.int64) * SC
    py = np.array([15, 5, 25], dtype=np.int64) * SC
    # center is inside the hole -> outside; ring area -> inside
    np.testing.assert_array_equal(
        query_inside(px, py, es), [False, True, True]
    )


def test_auto_close_unclosed_ring():
    xs = [0, 30 * SC, 15 * SC]  # triangle, not closed
    ys = [0, 0, 30 * SC]
    es = build_edges([(xs, ys)])
    assert query_inside(np.array([15 * SC]), np.array([10 * SC]), es)[0]
    assert not query_inside(np.array([1]), np.array([25 * SC]), es)[0]


def test_diagonal_cross_product_exactness():
    # diagonal edge from (0,0) to (10,10) (scaled): point exactly on
    # the line is NOT south of it -> not a crossing
    xs = [0, 10 * SC, 10 * SC, 0]
    ys = [0, 10 * SC, 0, 0]
    es = build_edges([(xs, ys)])
    on_line = crossings(np.array([5 * SC]), np.array([5 * SC]), es)
    just_south = crossings(np.array([5 * SC]), np.array([5 * SC - 1]), es)
    assert on_line[0] == 0
    assert just_south[0] == 1


def test_parse_border_text():
    poly = (
        "test\n1\n   11.0   49.0\n   12.0   49.0\n   12.0   50.0\n"
        "   11.0   50.0\nEND\nEND\n"
    )
    es = parse_border(poly)
    assert es.n_edges == 2  # verticals dropped, auto-close added
    assert query_inside(
        np.array([115 * SC // 10]), np.array([495 * SC // 10]), es
    )[0]


def test_multipoly_parse_and_assign():
    text = (
        "Alpha;2\n1\n   11.0   49.0\n   12.0   49.0\n   12.0   50.0\n"
        "   11.0   50.0\nEND\nEND\n"
        "Beta;6\n1\n   11.2   49.2\n   11.8   49.2\n   11.8   49.8\n"
        "   11.2   49.8\nEND\nEND\n"
    )
    ps = parse_multipoly(text)
    assert ps.names == ["Alpha", "Beta"]
    assert list(ps.admin_levels) == [2, 6]
    px = np.array([11.5 * SC, 11.1 * SC, 10.0 * SC], dtype=np.int64)
    py = np.array([49.5 * SC, 49.1 * SC, 48.0 * SC], dtype=np.int64)
    r, s = assign_polygons(px, py, ps)
    assert list(r) == [0, 0, -1]  # Alpha, Alpha, none
    assert list(s) == [1, -1, -1]  # Beta only where inside both


def test_assign_tiebreak_order_dependent():
    """3 nested polys in file order with admins [5, 3, 4]:
    5 -> region; 3 -> demote 5 to sub, region=3; 4 -> 4>3 but 4<5
    so sub stays 5 (osmassignpoly.c:1758-1783)."""
    polys = [build_edges([sq(0, 0, 30, 30)]) for _ in range(3)]
    ps = PolygonSet(["A5", "B3", "C4"], np.array([5, 3, 4]), polys)
    r, s = assign_polygons(
        np.array([15 * SC]), np.array([15 * SC]), ps
    )
    assert ps.names[r[0]] == "B3"
    assert ps.names[s[0]] == "A5"


def test_assign_equal_admin_first_wins():
    polys = [build_edges([sq(0, 0, 30, 30)]) for _ in range(2)]
    ps = PolygonSet(["First", "Second"], np.array([4, 4]), polys)
    r, s = assign_polygons(np.array([15 * SC]), np.array([15 * SC]), ps)
    assert ps.names[r[0]] == "First"
    assert s[0] == -1  # equal level is never a subregion


def test_vertex_bbox_vs_edge_bbox():
    """multipoly keeps vertex bbox; border keeps edge bbox."""
    # a spike: vertical-only extreme x vertex
    xs = [0, 10 * SC, 10 * SC, 0]
    ys = [0, 0, 5 * SC, 5 * SC]
    es_v = build_edges([(xs, ys)], bbox_from_vertices=True)
    es_e = build_edges([(xs, ys)], bbox_from_vertices=False)
    assert es_v.bbox == (0, 0, 10 * SC, 5 * SC)
    assert es_e.bbox == (0, 0, 10 * SC, 5 * SC)
