"""Round-4 second-block operators: HITS, Moran's I, Fellegi-Sunter
linkage, contingency lift, Haar transform, winsorized stats,
marching-squares contours, trace EDR — each checked against a
literal Python replay or a hand-computed truth on data small
enough to verify by eye."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


# ----------------------------------------------------------- HITS


def _hits_replay(edges, iters):
    hosts = sorted({s for s, _ in edges} | {d for _, d in edges})
    auth = {h: 1 for h in hosts}
    hub = {h: 1 for h in hosts}
    for _ in range(iters):
        auth = {
            h: sum(hub[s] for s, d in edges if d == h)
            for h in hosts
        }
        hub = {
            h: sum(auth[d] for s, d in edges if s == h)
            for h in hosts
        }
    return {h: (auth[h], hub[h]) for h in hosts}


def test_hits_matches_replay(spark):
    from osmgraft.operators.linkgraph import hits_scores

    rng = random.Random(11)
    edges = sorted(
        {
            (f"h{rng.randrange(12)}", f"h{rng.randrange(12)}")
            for _ in range(40)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src string, dst string")
    for iters in (1, 2):
        got = {
            r.host: (r.auth, r.hub)
            for r in hits_scores(df, iters=iters).collect()
        }
        assert got == _hits_replay(edges, iters)


def test_hits_hub_vs_authority_separation(spark):
    """A pure directory (links out, never linked) must score as
    hub-only; a pure destination as authority-only."""
    from osmgraft.operators.linkgraph import hits_scores

    edges = [("dir", "page1"), ("dir", "page2"), ("dir", "page3")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.host: (r.auth, r.hub)
        for r in hits_scores(df, iters=2).collect()
    }
    assert got["dir"][0] == 0 and got["dir"][1] > 0
    assert got["page1"][0] > 0 and got["page1"][1] == 0


def test_hits_shift_rescales(spark):
    from osmgraft.operators.linkgraph import hits_scores

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    plain = {
        r.host: (r.auth, r.hub)
        for r in hits_scores(df, iters=1, shift=0).collect()
    }
    shifted = {
        r.host: (r.auth, r.hub)
        for r in hits_scores(df, iters=1, shift=1).collect()
    }
    # auth is shifted straight off the plain sum; hub re-reads the
    # SHIFTED auth, so only the auth halving is a direct identity
    assert all(
        shifted[h][0] == plain[h][0] >> 1 for h in plain
    )
    assert any(
        shifted[h][1] != plain[h][1] for h in plain
    )


# ------------------------------------------------------- Moran's I


def _morans_replay(pts, shift):
    from collections import Counter

    cells = Counter(
        (
            (lat + 900_000_000) >> shift,
            (lon + 1_800_000_000) >> shift,
        )
        for lat, lon in pts
    )
    n = len(cells)
    s = sum(cells.values())
    mean = s // n
    dev = {c: x - mean for c, x in cells.items()}
    num = 0
    w = 0
    for (y, x), d in dev.items():
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (y + dy, x + dx)
            if nb in dev:
                w += 1
                num += d * dev[nb]
    den = sum(d * d for d in dev.values())
    return n, w, num, den, mean, s % n


def _run_morans(spark, pts, shift):
    from osmgraft.operators.autocorr import morans_i_grid

    df = spark.createDataFrame(pts, "lat_i long, lon_i long")
    r = morans_i_grid(df, shift=shift).collect()[0]
    return (
        r.n_cells, r.w_pairs, r.num, r.den, r.mean_floor, r.resid
    )


def test_morans_random_replay(spark):
    rng = random.Random(7)
    pts = [
        (rng.randrange(-5_000_000, 5_000_000),
         rng.randrange(-5_000_000, 5_000_000))
        for _ in range(300)
    ]
    assert _run_morans(spark, pts, 20) == _morans_replay(pts, 20)


def test_morans_sign_discriminates(spark):
    """A hot 2x2 cluster on an empty-ish field -> positive num;
    a checkerboard of hot/cold cells -> negative num."""
    side = 1 << 20
    cluster = []
    for cy in range(4):
        for cx in range(4):
            hot = cy < 2 and cx < 2
            for k in range(40 if hot else 1):
                cluster.append(
                    (cy * side + 7 - 900_000_000,
                     cx * side + 7 - 1_800_000_000)
                )
    n, w, num, den, *_ = _run_morans(spark, cluster, 20)
    assert n == 16 and num > 0
    board = []
    for cy in range(4):
        for cx in range(4):
            hot = (cy + cx) % 2 == 0
            for k in range(40 if hot else 1):
                board.append(
                    (cy * side + 7 - 900_000_000,
                     cx * side + 7 - 1_800_000_000)
                )
    n, w, num, den, *_ = _run_morans(spark, board, 20)
    assert num < 0 < den


# -------------------------------------------- Fellegi-Sunter tiers


def test_fs_linkage_weights_and_nulls(spark):
    from osmgraft.operators.linkage import fs_linkage

    rows = [
        (1, True, True, True),     # 38+11+9 = 58 -> match
        (2, True, False, None),    # 38-13+0 = 25 -> possible
        (3, False, False, False),  # -7-13-21 = -41 -> nonmatch
        (4, None, None, None),     # 0 -> possible (>= 5 is false) ->
    ]                              # actually 0 < 5 -> nonmatch
    df = spark.createDataFrame(
        rows,
        "pid long, cell_agree boolean, len_agree boolean,"
        " lang_agree boolean",
    )
    got = {
        r.pid: (r.score, r.tier)
        for r in fs_linkage(
            df,
            fields=[
                ("cell_agree", 38, -7),
                ("len_agree", 11, -13),
                ("lang_agree", 9, -21),
            ],
            match_at=40,
            possible_at=5,
        ).collect()
    }
    assert got == {
        1: (58, "match"),
        2: (25, "possible"),
        3: (-41, "nonmatch"),
        4: (0, "nonmatch"),
    }


# ------------------------------------------------ contingency lift


def test_contingency_lift_exact(spark):
    from osmgraft.operators.affinity import contingency_lift

    rows = (
        [("h1", "r1")] * 6
        + [("h1", "r2")] * 2
        + [("h2", "r1")] * 2
        + [("h2", "r2")] * 2
    )
    df = spark.createDataFrame(rows, "host string, region string")
    got = {
        (r.row, r.col): (
            r.n_obs, r.n_row, r.n_col, r.n_total,
            r.lift_num, r.lift_den, r.over,
        )
        for r in contingency_lift(df, "host", "region").collect()
    }
    # h1/r1: obs 6, row 8, col 8, total 12 -> 72 vs 64 over
    assert got[("h1", "r1")] == (6, 8, 8, 12, 72, 64, True)
    # h1/r2: obs 2, row 8, col 4 -> 24 vs 32 under
    assert got[("h1", "r2")] == (2, 8, 4, 12, 24, 32, False)
    assert got[("h2", "r1")] == (2, 4, 8, 12, 24, 32, False)
    assert got[("h2", "r2")] == (2, 4, 4, 12, 24, 16, True)


# ------------------------------------------------------------ Haar


def _haar_replay(vals):
    out = {}
    cur = list(vals)
    level = 0
    while len(cur) > 1:
        level += 1
        a = []
        for k in range(len(cur) // 2):
            a.append(cur[2 * k] + cur[2 * k + 1])
            out[(level, k, "d")] = cur[2 * k] - cur[2 * k + 1]
        cur = a
    out[(level, 0, "a")] = cur[0]
    return out


def test_haar_matches_replay_and_pads(spark):
    from osmgraft.operators.wavelet import haar_transform

    series = [("k1", 0, 5), ("k1", 1, 3), ("k1", 3, 7),
              ("k2", 2, 100)]
    df = spark.createDataFrame(series, "key string, idx long, v long")
    got = {
        (r.key, r.level, r.idx, r.kind): r.coef
        for r in haar_transform(df, 8, key="key").collect()
    }
    for key, vals in (
        ("k1", [5, 3, 0, 7, 0, 0, 0, 0]),
        ("k2", [0, 0, 100, 0, 0, 0, 0, 0]),
    ):
        want = _haar_replay(vals)
        for (lvl, idx, kind), coef in want.items():
            assert got[(key, lvl, idx, kind)] == coef
    # 7 detail + 1 approx per key
    assert len(got) == 16


def test_haar_rejects_non_power_of_two(spark):
    import pytest

    from osmgraft.operators.wavelet import haar_transform

    df = spark.createDataFrame(
        [("k", 0, 1)], "key string, idx long, v long"
    )
    with pytest.raises(ValueError):
        haar_transform(df, 6)


# ------------------------------------------------------- winsorize


def _winsor_replay(vals, pct):
    sv = sorted(vals)
    n = len(sv)
    cut = n * pct // 100
    lo = sv[cut]
    hi = sv[n - cut - 1]
    return (
        n, lo, hi,
        sum(max(lo, min(hi, v)) for v in vals),
        sum(vals),
    )


def test_winsorized_stats_replay(spark):
    from osmgraft.operators.events import winsorized_stats

    rng = random.Random(3)
    vals = [rng.randrange(1000) for _ in range(57)]
    vals[0] = 10**9  # the 100 MB page
    rows = [("h", v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, v long, id long")
    r = winsorized_stats(df, pct=10).collect()[0]
    n, lo, hi, wsum, raw = _winsor_replay(vals, 10)
    assert (r.n, r.lo_val, r.hi_val, r.wsum, r.rawsum) == (
        n, lo, hi, wsum, raw
    )
    assert r.wsum < r.rawsum  # the outlier got clamped


# -------------------------------------------------------- contours


def test_contour_cases_single_corner(spark):
    """One inside corner touches 4 blocks with bits 1/2/4/8."""
    from osmgraft.operators.tiles import contour_cases

    df = spark.createDataFrame(
        [(5, 5, 9)], "latb long, lonb long, n long"
    )
    got = {
        (r.latb, r.lonb): r.mcase
        for r in contour_cases(df, threshold=3).collect()
    }
    assert got == {
        (5, 5): 1, (5, 4): 2, (4, 5): 4, (4, 4): 8,
    }


def test_contour_cases_plateau_emits_only_coastline(spark):
    """A dense 4x4 plateau: interior blocks are case 15 and
    dropped; only the boundary ring survives."""
    from osmgraft.operators.tiles import contour_cases

    rows = [(y, x, 10) for y in range(4) for x in range(4)]
    df = spark.createDataFrame(rows, "latb long, lonb long, n long")
    got = {
        (r.latb, r.lonb): r.mcase
        for r in contour_cases(df, threshold=5).collect()
    }
    assert all(1 <= c <= 14 for c in got.values())
    # interior blocks (0<=y<3, 0<=x<3 fully inside) are absent
    for y in range(3):
        for x in range(3):
            assert (y, x) not in got
    # corner block below-left of (0,0) has exactly bit 8
    assert got[(-1, -1)] == 8


# ------------------------------------------------------------- EDR


def _edr_replay(a, b, eps2):
    n, m = len(a), len(b)
    big = 10**9
    f = {(0, 0): 0 if _d2(a[0], b[0]) <= eps2 else 1}
    order = sorted(
        ((i, j) for i in range(n) for j in range(m)),
        key=lambda t: t[0] + t[1],
    )
    for i, j in order:
        if (i, j) == (0, 0):
            continue
        c = 0 if _d2(a[i], b[j]) <= eps2 else 1
        best = min(
            f.get((i - 1, j), big) + 1,
            f.get((i, j - 1), big) + 1,
            f.get((i - 1, j - 1), big) + c,
        )
        f[(i, j)] = best
    return f[(n - 1, m - 1)]


def _d2(p, q):
    return (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2


def test_trace_edr_replay(spark):
    from osmgraft.operators.linecover import trace_edr_pairs

    eps2 = 100**2
    base = [(k * 50, k * 30) for k in range(5)]
    glitch = [
        (x + (5000 if k == 2 else 0), y)
        for k, (x, y) in enumerate(base)
    ]
    offset = [(x + 70, y + 60) for x, y in base]  # inside eps
    traces = {1: base, 2: glitch, 3: offset}
    rows = [
        (tid, s, lat, lon)
        for tid, pts in traces.items()
        for s, (lat, lon) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "trace_id long, step long, lat_i long, lon_i long"
    )
    got = {
        (r.trace_a, r.trace_b): r.edr
        for r in trace_edr_pairs(
            df, shift=20, eps2=eps2, n_steps=5
        ).collect()
    }
    for a, b in ((1, 2), (1, 3), (2, 3)):
        assert got[(a, b)] == _edr_replay(
            traces[a], traces[b], eps2
        ), (a, b)
    # the glitch costs EDR exactly 1 vs the identical-path base
    assert got[(1, 2)] == 1
    # the uniformly-offset twin is free (every step within eps)
    assert got[(1, 3)] == 0


# ------------------------------------------------------ morphology


def test_raster_morphology_single_and_block(spark):
    from osmgraft.operators.tiles import raster_morphology

    one = spark.createDataFrame(
        [(0, 0, 9)], "latb long, lonb long, n long"
    )
    got = {
        (r.latb, r.lonb): (r.n_nbrs, r.inside, r.eroded)
        for r in raster_morphology(one, threshold=3).collect()
    }
    assert len(got) == 9  # full 3x3 dilation support
    assert got[(0, 0)] == (1, True, False)
    assert got[(1, 1)] == (1, False, False)

    block = spark.createDataFrame(
        [(y, x, 9) for y in range(3) for x in range(3)],
        "latb long, lonb long, n long",
    )
    got = {
        (r.latb, r.lonb): (r.n_nbrs, r.inside, r.eroded)
        for r in raster_morphology(block, threshold=3).collect()
    }
    assert len(got) == 25  # 5x5 dilation of the 3x3 block
    assert got[(1, 1)] == (9, True, True)  # center erodes
    assert got[(0, 0)] == (4, True, False)  # corner does not
    assert got[(-1, -1)] == (1, False, False)


# ---------------------------------------------------- Markov cells


def test_markov_predictor_counts_and_ties(spark):
    from osmgraft.operators.linecover import trace_markov_predictor

    # two traces through cells A(0,0) B(0,1) C(1,1) at shift 20;
    # from A: ->B twice, ->C once => best B; tie case from B
    side = 1 << 20

    def pt(cy, cx):
        return (cy * side + 5 - 900_000_000,
                cx * side + 5 - 1_800_000_000)

    t1 = [pt(0, 0), pt(0, 1), pt(0, 0), pt(0, 1), pt(1, 1)]
    t2 = [pt(0, 0), pt(1, 1), pt(0, 0), pt(0, 1), pt(0, 0)]
    rows = [
        (tid, s, lat, lon)
        for tid, tr in ((1, t1), (2, t2))
        for s, (lat, lon) in enumerate(tr)
    ]
    df = spark.createDataFrame(
        rows, "trace_id long, step long, lat_i long, lon_i long"
    )
    out = {
        r.src: (r.best_next, r.n_best, r.n_total)
        for r in trace_markov_predictor(df, shift=20).collect()
    }
    lon_bits = max(int(3_600_000_000 >> 20).bit_length(), 1)
    pack = 1 << lon_bits

    def cell(cy, cx):
        lat, lon = pt(cy, cx)
        return (
            ((lat + 900_000_000) >> 20) * pack
            + ((lon + 1_800_000_000) >> 20)
        )

    a, b, c = cell(0, 0), cell(0, 1), cell(1, 1)
    # from A: B,B,B? t1: A->B, A->B; t2: A->C, A->?; count A->B 3
    # enumerate: t1 transitions A->B, B->A, A->B, B->C;
    #            t2: A->C, C->A, A->B, B->A
    assert out[a] == (b, 3, 4)
    # from B: ->A twice, ->C once
    assert out[b] == (a, 2, 3)
    # from C: ->A once
    assert out[c] == (a, 1, 1)


def test_markov_tiebreak_smallest_cell(spark):
    from osmgraft.operators.linecover import trace_markov_predictor

    side = 1 << 20

    def pt(cy, cx):
        return (cy * side + 5 - 900_000_000,
                cx * side + 5 - 1_800_000_000)

    # from A go once to C (higher id) then once to B (lower id)
    rows = [
        (1, 0, *pt(0, 0)), (1, 1, *pt(1, 1)),
        (2, 0, *pt(0, 0)), (2, 1, *pt(0, 1)),
    ]
    df = spark.createDataFrame(
        rows, "trace_id long, step long, lat_i long, lon_i long"
    )
    out = {
        r.src: (r.best_next, r.n_best, r.n_total)
        for r in trace_markov_predictor(df, shift=20).collect()
    }
    lon_bits = max(int(3_600_000_000 >> 20).bit_length(), 1)
    pack = 1 << lon_bits
    a = ((pt(0, 0)[0] + 900_000_000) >> 20) * pack + (
        (pt(0, 0)[1] + 1_800_000_000) >> 20
    )
    b = ((pt(0, 1)[0] + 900_000_000) >> 20) * pack + (
        (pt(0, 1)[1] + 1_800_000_000) >> 20
    )
    assert out[a][0] == b  # tie broken toward the smaller cell id
    assert out[a][1:] == (1, 2)


# ------------------------------------------------------------- EMD


def test_histogram_emd_shift_vs_teleport(spark):
    from osmgraft.operators.text import histogram_emd

    def corpus(lengths):
        return spark.createDataFrame(
            [(i, "x" * ln) for i, ln in enumerate(lengths)],
            "doc_id long, text string",
        )

    base = [50] * 4  # all in bucket 0
    shift = [150] * 4  # all in bucket 1
    tele = [350] * 4  # all in bucket 3
    # equal totals -> den = 16; shift moves mass 1 bucket,
    # teleport moves it 3: EMD terms triple
    def emd(a, b):
        rows = histogram_emd(corpus(a), corpus(b)).collect()
        assert all(r.emd_den == 16 for r in rows)
        return sum(r.emd_term for r in rows)

    assert emd(base, shift) == 16  # |4*4| at bucket 0 boundary
    assert emd(base, tele) == 48  # three boundaries crossed
    assert emd(base, base) == 0


# ----------------------------------------------- Douglas-Peucker


def _dp_replay(pts, eps2):
    kept = {0, len(pts) - 1}

    def rec(i, j):
        if j <= i + 1:
            return
        xi, yi = pts[i]
        xj, yj = pts[j]
        best = None
        for k in range(i + 1, j):
            xk, yk = pts[k]
            cr = (xj - xi) * (yk - yi) - (yj - yi) * (xk - xi)
            c2 = cr * cr
            if best is None or c2 > best[0]:
                best = (c2, k)
        len2 = (xj - xi) ** 2 + (yj - yi) ** 2
        if best[0] > eps2 * len2:
            kept.add(best[1])
            rec(i, best[1])
            rec(best[1], j)

    rec(0, len(pts) - 1)
    return kept


def test_simplify_dp_replay(spark):
    from osmgraft.operators.linecover import simplify_traces_dp

    eps2 = 100 ** 2
    traces = {
        1: [(0, 0), (10, 5), (20, -5), (30, 0), (40, 0)],  # flat
        2: [(0, 0), (10, 5000), (20, 0), (30, -4000), (40, 0)],
        3: [(0, 0), (10, 10), (20, 2000), (30, 30), (40, 40)],
    }
    rows = [
        (tid, s, y, x)
        for tid, pts in traces.items()
        for s, (x, y) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "trace_id long, step long, lat_i long, lon_i long"
    )
    got = {}
    for r in simplify_traces_dp(df, eps2=eps2, passes=3).collect():
        got.setdefault(r.trace_id, set()).add(r.step)
    for tid, pts in traces.items():
        xy = [(x, y) for x, y in pts]
        assert got[tid] == _dp_replay(xy, eps2), tid
    assert got[1] == {0, 4}          # within tolerance: endpoints
    assert 2 in got[3] and len(got[3]) == 3  # the spike survives


# -------------------------------------------------- link prediction


def test_link_prediction_path_graph(spark):
    from osmgraft.operators.linkgraph import link_prediction_scores

    # path a-b-c-d: CN(a,c)=1 via b, CN(b,d)=1 via c, no others
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r.a, r.b): (r.cn, r.deg_a, r.deg_b, r.pa, r.is_edge)
        for r in link_prediction_scores(df).collect()
    }
    assert got[("a", "c")] == (1, 1, 2, 2, False)
    assert got[("b", "d")] == (1, 2, 1, 2, False)
    assert set(got) == {("a", "c"), ("b", "d")}

    # triangle + pendant: existing edges get flagged
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r.a, r.b): (r.cn, r.is_edge)
        for r in link_prediction_scores(df).collect()
    }
    assert got[("a", "b")] == (1, True)  # common neighbor c
    assert got[("a", "d")] == (1, False)
    assert got[("b", "d")] == (1, False)


def test_link_prediction_degree_cap(spark):
    from osmgraft.operators.linkgraph import link_prediction_scores

    # star hub h with 4 leaves: every leaf pair has CN 1 via h;
    # capping below the hub degree removes all wedges
    edges = [("h", f"l{i}") for i in range(4)]
    df = spark.createDataFrame(edges, "src string, dst string")
    full = link_prediction_scores(df).collect()
    assert len(full) == 6  # C(4,2) leaf pairs
    capped = link_prediction_scores(df, max_degree=3).collect()
    assert capped == []


# --------------------------------------------------- weighted median


def _wmedian_replay(rows):
    # rows: (v, w, id); lower weighted median
    tot = sum(w for _, w, _ in rows)
    cum = 0
    for v, w, _ in sorted(rows, key=lambda t: (t[0], t[2])):
        cum += w
        if 2 * cum >= tot:
            return v, tot


def test_weighted_median_replay(spark):
    from osmgraft.operators.events import weighted_median

    rng = random.Random(13)
    rows = [
        ("k", rng.randrange(100), 1 + rng.randrange(9), i)
        for i in range(41)
    ]
    df = spark.createDataFrame(
        rows, "key string, v long, wgt long, id long"
    )
    r = weighted_median(df).collect()[0]
    v, tot = _wmedian_replay([(v, w, i) for _, v, w, i in rows])
    assert (r.wmedian, r.total_w) == (v, tot)
    # one heavy row dominates
    df = spark.createDataFrame(
        [("k", 5, 1, 0), ("k", 7, 100, 1), ("k", 9, 1, 2)],
        "key string, v long, wgt long, id long",
    )
    r = weighted_median(df).collect()[0]
    assert r.wmedian == 7


# -------------------------------------------------------- seq grams


def test_sequence_ngrams_tail_regression(spark):
    """Grams must come from leads materialized BEFORE the null
    filter — a re-evaluated window would shift across the
    dropped tail and mint short phantom grams."""
    from osmgraft.operators.events import sequence_ngrams

    rows = [
        (1, t, 10, et, t)
        for t, et in enumerate(["a", "b", "c", "d"])
    ] + [(2, t, 20, et, t + 10) for t, et in enumerate(["a", "b"])]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long,"
        " event_type string, _x long",
    )
    got = {
        r.gram: r.n_runs
        for r in sequence_ngrams(df, n=3, t_col="ts").collect()
    }
    assert got == {"a>b>c": 1, "b>c>d": 1}  # user 2 too short


# --------------------------------------------------------- survival


def test_survival_table_spans(spark):
    from osmgraft.operators.events import survival_table

    spans = [
        (1, 0, 5), (2, 0, 3), (3, 2, 5), (4, 6, 6),
    ]
    df = spark.createDataFrame(
        spans, "user_id long, first_day long, last_day long"
    )
    got = {
        r.day: (r.at_risk, r.deaths)
        for r in survival_table(df).collect()
    }
    # day 0: users 1,2 at risk; day 2: +user3 -> 3; day 3: user2
    # dies (still at risk that day); day 4: 2 left; day 5: both
    # die; day 6: user4 alone
    assert got[0] == (2, 0)
    assert got[2] == (3, 0)
    assert got[3] == (3, 1)
    assert got[4] == (2, 0)
    assert got[5] == (2, 2)
    assert got[6] == (1, 1)
    assert 7 not in got  # curve closed, zero-at-risk rows dropped


# ---------------------------------------------------- D8 directions


def test_flow_directions_small_raster(spark):
    from osmgraft.operators.tiles import flow_directions

    cells = [
        (0, 0, 9), (0, 1, 5), (1, 0, 5), (1, 1, 1),  # bowl to 1,1
        (5, 5, 3),                                    # isolated pit
        (3, 0, 4), (3, 1, 4),                         # plateau pair
    ]
    df = spark.createDataFrame(
        cells, "latb long, lonb long, n long"
    )
    got = {
        (r.latb, r.lonb): (r.dir_dy, r.dir_dx, r.inflow)
        for r in flow_directions(df).collect()
    }
    assert got[(0, 0)] == (1, 1, 0)      # steepest descent to 1
    assert got[(0, 1)] == (1, 0, 0)
    assert got[(1, 0)] == (0, 1, 0)
    assert got[(1, 1)] == (0, 0, 3)      # the sink collects 3
    assert got[(5, 5)] == (0, 0, 0)      # isolated pit survives
    # plateau: neighbors equal -> both are pits (strictly lower)
    assert got[(3, 0)] == (0, 0, 0)
    assert got[(3, 1)] == (0, 0, 0)


def test_flow_directions_tiebreak(spark):
    from osmgraft.operators.tiles import flow_directions

    # two equally-low neighbors: row-major (dy, dx) ascending wins
    cells = [(0, 0, 9), (-1, -1, 1), (1, 1, 1)]
    df = spark.createDataFrame(
        cells, "latb long, lonb long, n long"
    )
    got = {
        (r.latb, r.lonb): (r.dir_dy, r.dir_dx)
        for r in flow_directions(df).collect()
    }
    assert got[(0, 0)] == (-1, -1)


# ------------------------------------------------------- ANN recall


def test_ann_recall_identical_vectors(spark):
    """Identical vectors share every hyperplane signature, so the
    banded candidate set must contain every exact neighbor:
    recall is full by construction."""
    from osmgraft.operators.dedup import (
        embed_ann_banded,
        embed_knn_exact,
    )

    base = [float(j + 1) for j in range(8)]
    rows = [(i, base) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = embed_knn_exact(
        df, F.col("vec_id") % 2 == 0, k=3
    ).select("query_id", "neighbor_id")
    ann = embed_ann_banded(
        df, band_bits=4, n_bands=2, dim=8
    ).select("a", "b")
    j = exact.join(
        ann,
        (F.least("query_id", "neighbor_id") == F.col("a"))
        & (F.greatest("query_id", "neighbor_id") == F.col("b")),
        "left",
    )
    out = j.groupBy("query_id").agg(
        F.count("*").alias("n_exact"),
        F.sum(F.col("a").isNotNull().cast("long")).alias("n_hit"),
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r.n_exact == 3 and r.n_hit == 3


# ---------------------------------------------------- MVCC snapshot


def test_snapshot_read_time_travel(spark):
    from osmgraft.operators.merge import snapshot_read

    log = [
        # (id, ver, text, deleted)
        (1, 0, "a0", False), (1, 2, "a2", False),
        (2, 0, "b0", False), (2, 1, "", True),   # dead at 1
        (3, 0, "c0", False), (3, 1, "", True), (3, 3, "c3", False),
        (4, 5, "d5", False),                      # born late
    ]
    df = spark.createDataFrame(
        log, "doc_id long, ver long, text string, deleted boolean"
    )

    def state(t):
        return {
            r.doc_id: r.text
            for r in snapshot_read(df, as_of=t).collect()
        }

    assert state(0) == {1: "a0", 2: "b0", 3: "c0"}
    assert state(1) == {1: "a0"}            # 2 and 3 tombstoned
    assert state(2) == {1: "a2"}
    assert state(3) == {1: "a2", 3: "c3"}   # 3 resurrected
    assert state(5) == {1: "a2", 3: "c3", 4: "d5"}


# ----------------------------------------------------- bitmap index


def test_category_bitmaps_and_overlap(spark):
    from osmgraft.operators.bitmapix import (
        bitmap_overlap,
        category_bitmaps,
    )

    rows = [
        ("t1", 0), ("t1", 0), ("t1", 3),
        ("t2", 3), ("t2", 5),
        ("t3", 62),
    ]
    df = spark.createDataFrame(rows, "tile string, host long")
    bms = category_bitmaps(df, "tile", "host", n_cats=63)
    got = {r.grp: (r.bm, r.n_cats_set) for r in bms.collect()}
    assert got["t1"] == ((1 << 0) | (1 << 3), 2)
    assert got["t2"] == ((1 << 3) | (1 << 5), 2)
    assert got["t3"] == (1 << 62, 1)

    pairs = spark.createDataFrame(
        [("t1", "t2"), ("t1", "t3")],
        "grp_a string, grp_b string",
    )
    ov = {
        (r.grp_a, r.grp_b): (r.n_both, r.n_either, r.n_only_a)
        for r in bitmap_overlap(bms, pairs).collect()
    }
    assert ov[("t1", "t2")] == (1, 3, 1)  # share host 3
    assert ov[("t1", "t3")] == (0, 3, 2)


def test_category_bitmaps_rejects_wide_domain(spark):
    import pytest

    from osmgraft.operators.bitmapix import category_bitmaps

    df = spark.createDataFrame([("t", 0)], "tile string, host long")
    with pytest.raises(ValueError):
        category_bitmaps(df, "tile", "host", n_cats=64)


# ------------------------------------------------------ k-anonymity


def test_k_anonymous_cells_levels_and_mass(spark):
    from osmgraft.operators.tiles import k_anonymous_cells

    cells = (
        [(0, 0, 50)]                      # publishes at level 0
        + [(0, 1, 3), (1, 0, 4), (1, 1, 5)]  # merge -> 12 at lvl 1
        + [(64, 64, 1)]                   # stays lonely -> lvl 2
    )
    df = spark.createDataFrame(
        cells, "latb long, lonb long, n long"
    )
    out = k_anonymous_cells(df, k=10, levels=2, step=2).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.level, []).append(r)
    assert [(r.latb, r.lonb, r.n_pub, r.suppressed)
            for r in by_level[0]] == [(0, 0, 50, False)]
    assert [(r.latb, r.lonb, r.n_pub, r.suppressed)
            for r in by_level[1]] == [(0, 0, 12, False)]
    assert [(r.latb, r.lonb, r.n_pub, r.suppressed)
            for r in by_level[2]] == [(4, 4, 1, True)]
    # mass conservation: nothing silently dropped
    assert sum(r.n_pub for r in out) == sum(n for _, _, n in cells)


# ---------------------------------------------------- apportionment


def test_apportion_budget_exact_sum_and_ties(spark):
    from osmgraft.operators.export import apportion_budget

    strata = [("a", 1), ("b", 1), ("c", 1)]
    df = spark.createDataFrame(strata, "stratum string, n long")
    got = {
        r.stratum: r.quota
        for r in apportion_budget(df, budget=10).collect()
    }
    # 10/3: floors 3,3,3; one leftover unit -> smallest key
    assert got == {"a": 4, "b": 3, "c": 3}

    rng = random.Random(31)
    strata = [(f"s{i}", 1 + rng.randrange(100)) for i in range(17)]
    df = spark.createDataFrame(strata, "stratum string, n long")
    for b in (0, 1, 500, 12345):
        rows = apportion_budget(df, budget=b).collect()
        assert sum(r.quota for r in rows) == b
        total = sum(n for _, n in strata)
        for r in rows:
            n = dict(strata)[r.stratum]
            assert b * n // total <= r.quota <= b * n // total + 1


# --------------------------------------------------- cluster purity


def test_cluster_purity_majorities(spark):
    from osmgraft.operators.clustering import cluster_purity

    asg = spark.createDataFrame(
        [(i, i % 2, 0) for i in range(10)],
        "vec_id long, cluster long, dist2 long",
    )
    # cluster 0 = even ids: labels 7,7,7,2,2 -> major 7
    # cluster 1 = odd ids: labels 5,5,9,9,1 -> tie 5/9 -> 5
    labels = [
        (0, 7), (2, 7), (4, 7), (6, 2), (8, 2),
        (1, 5), (3, 5), (5, 9), (7, 9), (9, 1),
    ]
    lab = spark.createDataFrame(labels, "vec_id long, label long")
    got = {
        r.cluster: (r.major_label, r.n_major, r.n_total, r.n_labels)
        for r in cluster_purity(asg, lab).collect()
    }
    assert got[0] == (7, 3, 5, 2)
    assert got[1] == (5, 2, 5, 3)


# ------------------------------------------------------------- Gini


def _gini_replay(vals):
    sv = sorted(vals)
    n = len(sv)
    tot = sum(sv)
    num = 2 * sum((i + 1) * x for i, x in enumerate(sv)) \
        - (n + 1) * tot
    return n, tot, num, n * tot


def test_gini_parts_replay_and_extremes(spark):
    from osmgraft.operators.indexing import gini_parts

    rng = random.Random(17)
    vals = [rng.randrange(1000) for _ in range(101)]
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v long, id long"
    )
    r = gini_parts(df).collect()[0]
    assert (r.n, r.total, r.gini_num, r.gini_den) == _gini_replay(
        vals
    )
    # perfectly equal -> num 0; single hoarder -> num/den -> 1-1/n
    eq = spark.createDataFrame(
        [(5, i) for i in range(10)], "v long, id long"
    )
    r = gini_parts(eq).collect()[0]
    assert r.gini_num == 0
    hoard = spark.createDataFrame(
        [(0, i) for i in range(9)] + [(90, 9)], "v long, id long"
    )
    r = gini_parts(hoard).collect()[0]
    assert r.gini_num * 10 == r.gini_den * 9  # G = 0.9 exactly


# ------------------------------------------------- cover compaction


def test_cover_compaction_collapse_and_conserve(spark):
    from osmgraft.operators.tiles import cover_compaction

    # one complete 4x4 block (collapses two levels) + a lone cell
    cells = [(y, x) for y in range(4) for x in range(4)] + [(9, 9)]
    df = spark.createDataFrame(cells, "latb long, lonb long")
    got = {
        (r.level, r.latb, r.lonb)
        for r in cover_compaction(df, levels=2).collect()
    }
    assert got == {(2, 0, 0), (0, 9, 9)}

    # a 2x2 family plus one extra child of another parent:
    # family collapses to level 1, the orphan stays at level 0
    cells = [(0, 0), (0, 1), (1, 0), (1, 1), (0, 2)]
    df = spark.createDataFrame(cells, "latb long, lonb long")
    got = {
        (r.level, r.latb, r.lonb)
        for r in cover_compaction(df, levels=2).collect()
    }
    assert got == {(1, 0, 0), (0, 0, 2)}
    # covered area conserved: sum of 4^level cell equivalents
    area = sum(4 ** lvl for lvl, _, _ in got)
    assert area == 5


# -------------------------------------------------- trace surprisal


def test_trace_surprisal_rails_vs_maverick(spark):
    from osmgraft.operators.linecover import trace_surprisal

    side = 1 << 20

    def pt(cy, cx):
        return (cy * side + 5 - 900_000_000,
                cx * side + 5 - 1_800_000_000)

    # 9 commuters ride A->B->C; 1 maverick goes A->D->C
    rows = []
    for tid in range(9):
        path = [pt(0, 0), pt(0, 1), pt(0, 2)]
        rows += [
            (tid, s, lat, lon)
            for s, (lat, lon) in enumerate(path)
        ]
    rows += [
        (99, s, lat, lon)
        for s, (lat, lon) in enumerate(
            [pt(0, 0), pt(1, 1), pt(0, 2)]
        )
    ]
    df = spark.createDataFrame(
        rows, "trace_id long, step long, lat_i long, lon_i long"
    )
    got = {
        r.trace_id: (r.n_trans, r.cost_total)
        for r in trace_surprisal(df, shift=20).collect()
    }
    # commuter: step1 cost bits(10)-bits(9), step2 bits(9)-bits(9)
    assert got[0] == (2, (10).bit_length() - (9).bit_length())
    # maverick: bits(10)-bits(1) + bits(1)-bits(1)
    assert got[99] == (2, (10).bit_length() - 1)
    assert got[99][1] > got[0][1]
