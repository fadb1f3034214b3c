"""way_cell_cover: exact supercover vs an INDEPENDENT rational-
arithmetic reference (segment x half-open cell intersection via
fractions.Fraction), plus boundary/corner edge cases and plan shape.
"""

from __future__ import annotations

import random
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from osmgraft.geo.cells import LAT_OFFSET, LON_OFFSET, _lon_bits
from osmgraft.operators.linecover import way_cell_cover


# ----------------------------------------------------------------
# independent reference: exact rational segment/half-open-box test
# ----------------------------------------------------------------


def _interval_x_in(lo, hi, p0, p1):
    """t-interval (as (lo_t, lo_closed, hi_t, hi_closed)) where the
    linear map p(t) = p0 + t*(p1-p0), t in [0,1], satisfies
    lo <= p(t) < hi.  Returns None when empty."""
    d = p1 - p0
    if d == 0:
        return (
            (Fraction(0), True, Fraction(1), True)
            if lo <= p0 < hi
            else None
        )
    # solve lo <= p0 + t*d and p0 + t*d < hi
    ta = Fraction(lo - p0, d)
    tb = Fraction(hi - p0, d)
    if d > 0:
        cand = (ta, True, tb, False)  # [ta, tb)
    else:
        cand = (tb, False, ta, True)  # (tb, ta]
    lo_t, lo_c, hi_t, hi_c = cand
    if lo_t < 0:
        lo_t, lo_c = Fraction(0), True
    elif lo_t == 0:
        lo_c = lo_c and True
    if hi_t > 1:
        hi_t, hi_c = Fraction(1), True
    if lo_t > hi_t:
        return None
    if lo_t == hi_t and not (lo_c and hi_c):
        return None
    return lo_t, lo_c, hi_t, hi_c


def _intersect(a, b):
    if a is None or b is None:
        return False
    lo_t = max(a[0], b[0])
    hi_t = min(a[2], b[2])
    lo_c = (a[1] if a[0] == lo_t else True) and (
        b[1] if b[0] == lo_t else True
    )
    hi_c = (a[3] if a[2] == hi_t else True) and (
        b[3] if b[2] == hi_t else True
    )
    if lo_t > hi_t:
        return False
    if lo_t == hi_t:
        return lo_c and hi_c
    return True


def ref_cover(segments, shift):
    """Exact half-open supercover of a list of integer segments
    ((x0,y0),(x1,y1)) in offset space, by brute-force cell testing
    with rational arithmetic.  Independent of the operator's
    column-sweep formula."""
    s = 1 << shift
    cells = set()
    for (x0, y0), (x1, y1) in segments:
        cells.add((x0 >> shift, y0 >> shift))
        cells.add((x1 >> shift, y1 >> shift))
        for cu in range(min(x0, x1) >> shift, (max(x0, x1) >> shift) + 1):
            for cv in range(
                min(y0, y1) >> shift, (max(y0, y1) >> shift) + 1
            ):
                ix = _interval_x_in(cu * s, (cu + 1) * s, x0, x1)
                iy = _interval_x_in(cv * s, (cv + 1) * s, y0, y1)
                if _intersect(ix, iy):
                    cells.add((cu, cv))
    return cells


def _run_operator(spark, way_points, shift):
    """way_points: {way_id: [(u, v), ...]} in OFFSET space."""
    rows = []
    nodes = []
    nid = 0
    for wid, pts in way_points.items():
        refs = []
        for u, v in pts:
            nodes.append((nid, v - LAT_OFFSET, u - LON_OFFSET))
            refs.append(nid)
            nid += 1
        rows.append((wid, refs))
    ways = spark.createDataFrame(rows, "way_id long, refs array<long>")
    ndf = spark.createDataFrame(nodes, "doc_id long, lat_i long, lon_i long")
    out = way_cell_cover(ways, ndf, shift=shift)
    bits = _lon_bits(shift)
    got = {}
    for r in out.collect():
        got.setdefault(r.way_id, set()).add(
            (r.cell & ((1 << bits) - 1), r.cell >> bits)
        )
    return got


def _segs(pts):
    return list(zip(pts, pts[1:]))


def test_random_differential(spark):
    rng = random.Random(20260818)
    shift = 4  # S=16: tiny cells, lots of boundary traffic
    ways = {}
    for wid in range(40):
        k = rng.randint(1, 5)
        ways[wid] = [
            (
                LON_OFFSET + rng.randint(0, 120),
                LAT_OFFSET + rng.randint(0, 120),
            )
            for _ in range(k)
        ]
    got = _run_operator(spark, ways, shift)
    for wid, pts in ways.items():
        want = ref_cover(_segs(pts), shift) if len(pts) > 1 else set()
        for u, v in pts:
            want.add((u >> shift, v >> shift))
        assert got[wid] == want, f"way {wid}: {got[wid] ^ want}"


def test_boundary_cases(spark):
    shift = 4
    s = 1 << shift
    u0, v0 = LON_OFFSET, LAT_OFFSET
    cases = {
        # diagonal exactly through the lattice corner: must NOT
        # touch the off-diagonal cells
        1: [(u0, v0), (u0 + 2 * s, v0 + 2 * s)],
        # horizontal run exactly along a gridline: bottom-closed ->
        # only the upper (containing) row
        2: [(u0, v0 + s), (u0 + 3 * s - 1, v0 + s)],
        # vertical segment crossing rows
        3: [(u0 + 5, v0), (u0 + 5, v0 + 2 * s + 3)],
        # endpoint exactly on a column boundary
        4: [(u0 + 1, v0 + 1), (u0 + 2 * s, v0 + 1)],
        # single-node way
        5: [(u0 + 7, v0 + 7)],
        # duplicate consecutive nodes (zero-length segment)
        6: [(u0 + 3, v0 + 3), (u0 + 3, v0 + 3)],
    }
    got = _run_operator(spark, cases, shift)
    for wid, pts in cases.items():
        want = ref_cover(_segs(pts), shift) if len(pts) > 1 else set()
        for u, v in pts:
            want.add((u >> shift, v >> shift))
        assert got[wid] == want, f"way {wid}"
    base = (u0 >> shift, v0 >> shift)
    # corner case: exactly the 3 diagonal cells
    assert got[1] == {
        (base[0], base[1]),
        (base[0] + 1, base[1] + 1),
        (base[0] + 2, base[1] + 2),
    }
    # gridline run: row v0+s only (half-open bottom edge)
    assert got[2] == {
        (base[0], base[1] + 1),
        (base[0] + 1, base[1] + 1),
        (base[0] + 2, base[1] + 1),
    }


def test_shift_guard(spark):
    with pytest.raises(ValueError):
        way_cell_cover(None, None, shift=31)


def test_corridor_semantics_and_plan(spark):
    from osmgraft.operators.graph import synth_ways
    from osmgraft.operators.linecover import cell_corridor_join
    from osmgraft.suite import doc_points, load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").select("doc_id")
    ways = synth_ways(docs, docs.count()).where(
        F.col("way_id") % 20 == 0
    )
    nodes = doc_points(spark, sf)
    shift = 20
    cover = way_cell_cover(ways, nodes, shift=shift)
    out = cell_corridor_join(cover, nodes, shift=shift, radius=1)

    # corpus side joins through a broadcast of the dilated cover
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    # brute-force reference: Chebyshev cell distance <= 1
    bits = _lon_bits(shift)
    cov = {}
    for r in cover.collect():
        cov.setdefault(r.way_id, set()).add(
            (r.cell % (1 << bits), r.cell >> bits)
        )
    pts = {
        r.doc_id: (
            (r.lon_i + LON_OFFSET) >> shift,
            (r.lat_i + LAT_OFFSET) >> shift,
        )
        for r in nodes.collect()
    }
    want = {
        (w, d)
        for w, cells in cov.items()
        for d, (pu, pv) in pts.items()
        if any(
            max(abs(pu - cu), abs(pv - cv)) <= 1 for cu, cv in cells
        )
    }
    got = {(r.way_id, r.doc_id) for r in out.collect()}
    assert got == want
    # pairs are already unique (no distinct needed downstream)
    assert out.count() == len(got)


def test_plan_no_cartesian_no_udf(spark):
    from osmgraft.operators.graph import synth_ways
    from osmgraft.suite import doc_points, load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").select("doc_id")
    ways = synth_ways(docs, docs.count())
    out = way_cell_cover(ways, doc_points(spark, sf), shift=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_way_length_decomposition_and_semantics(spark):
    """The 16-bit-halves (c*dx) div 2^32 equals true 128-bit
    division (python bigints), and way_length matches a python
    replay on synthetic ways incl. equator/high-lat segments."""
    from osmgraft.geo.bboxtags import cosr_table
    from osmgraft.operators.linecover import way_length

    cosr = cosr_table()

    # pure decomposition check at the extremes
    import random

    rng = random.Random(7)
    for _ in range(2000):
        c = rng.choice(
            [0, 1, 65535, 65536, 4294967295]
            + [rng.randrange(0, 4294967296) for _ in range(3)]
        )
        dx = rng.choice(
            [0, 1, 65535, 65536, 3_600_000_000]
            + [rng.randrange(0, 3_600_000_001) for _ in range(3)]
        )
        a = c * (dx // 65536)
        got = a // 65536 + ((a % 65536) * 65536 + c * (dx % 65536)) // 4294967296
        assert got == (c * dx) // 4294967296, (c, dx)

    def py_len(pts):
        import math

        tot = 0
        for (y0, x0), (y1, x1) in zip(pts, pts[1:]):
            i = min(abs(y0 + y1) // 2 // 1_000_000, 900)
            c = cosr[i]
            dx, dy = abs(x1 - x0), abs(y1 - y0)
            dxs = (c * dx) // 4294967296
            tot += int(
                math.floor(math.sqrt(float(dxs) * dxs + float(dy) * dy))
            )
        return tot

    ways_pts = {
        # equator: cosr[0]=2^32-1 -> dxs = dx-1 for dx>0 quirk kept
        1: [(0, 0), (0, 10_000_000)],
        # 60N: cos ~ 0.5
        2: [(600_000_000, 0), (600_000_000, 10_000_000)],
        # mixed diagonal near the pole cap index clamp
        3: [(899_500_000, 5), (900_000_000, 10_000_000)],
        4: [(100_000, 100_000), (-100_000, -100_000), (0, 0)],
    }
    rows, nodes, nid = [], [], 0
    for wid, pts in ways_pts.items():
        refs = []
        for lat, lon in pts:
            nodes.append((nid, lat, lon))
            refs.append(nid)
            nid += 1
        rows.append((wid, refs))
    out = {
        r.way_id: (r.n_segs, r.len_units)
        for r in way_length(
            spark.createDataFrame(
                rows, "way_id long, refs array<long>"
            ),
            spark.createDataFrame(
                nodes, "doc_id long, lat_i long, lon_i long"
            ),
        ).collect()
    }
    for wid, pts in ways_pts.items():
        assert out[wid] == (len(pts) - 1, py_len(pts)), wid
    # 60N east-west run is about half the equator run
    assert 0.49 < out[2][1] / out[1][1] < 0.51


def test_way_signed_area(spark):
    """Known polygons (winding signs) + random-ring python
    shoelace differential; open ways are excluded."""
    import random

    from osmgraft.operators.linecover import way_signed_area

    def shoelace2(pts):
        return sum(
            pts[i][1] * pts[i + 1][0] - pts[i + 1][1] * pts[i][0]
            for i in range(len(pts) - 1)
        )

    rng = random.Random(11)
    ways_pts = {
        # CCW unit-ish square in (lon, lat): 2A = 2*s^2 > 0
        1: [(0, 0), (0, 1000), (1000, 1000), (1000, 0), (0, 0)],
        # same square CW: negative
        2: [(0, 0), (1000, 0), (1000, 1000), (0, 1000), (0, 0)],
        # degenerate (collinear): zero
        3: [(0, 0), (0, 500), (0, 1000), (0, 0)],
        # open way: excluded from output
        4: [(0, 0), (0, 1000), (1000, 1000)],
    }
    for wid in range(10, 18):
        k = rng.randint(3, 7)
        ring = [
            (
                rng.randint(-(10**9), 10**9),
                rng.randint(-(1_800_000_000), 1_800_000_000),
            )
            for _ in range(k)
        ]
        ways_pts[wid] = ring + [ring[0]]

    rows, nodes, nid = [], [], 0
    for wid, pts in ways_pts.items():
        refs = []
        for lat, lon in pts[:-1] if pts[0] == pts[-1] else pts:
            nodes.append((nid, lat, lon))
            refs.append(nid)
            nid += 1
        if pts[0] == pts[-1]:
            refs.append(refs[0])
        rows.append((wid, refs))
    out = {
        r.way_id: (r.n_edges, r.two_a)
        for r in way_signed_area(
            spark.createDataFrame(
                rows, "way_id long, refs array<long>"
            ),
            spark.createDataFrame(
                nodes, "doc_id long, lat_i long, lon_i long"
            ),
        ).collect()
    }
    assert 4 not in out
    assert out[1] == (4, 2_000_000)
    assert out[2] == (4, -2_000_000)
    assert out[3][1] == 0
    for wid, pts in ways_pts.items():
        if wid == 4:
            continue
        # shoelace with (lon, lat) = (x, y): sum of x_i*y2 - x2*y_i
        want = sum(
            (pts[i][1] - pts[0][1]) * (pts[i + 1][0] - pts[0][0])
            - (pts[i + 1][1] - pts[0][1]) * (pts[i][0] - pts[0][0])
            for i in range(len(pts) - 1)
        )
        assert out[wid][1] == want, wid
