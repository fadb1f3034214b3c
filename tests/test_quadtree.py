"""Adaptive quadtree tiling (tiles.quadtree_rollup): structural
invariants — population conservation, capacity at non-leaf nodes,
prefix-freeness (no node is an ancestor of another), and hotspot
refinement vs sparse coarseness."""

from __future__ import annotations

from osmgraft.geo.cells import LAT_OFFSET, LON_OFFSET, _lon_bits
from osmgraft.operators.tiles import quadtree_rollup

CAP, LEAF, LEVELS = 8, 20, 6
TOP = LEVELS - 1


def _bands(row):
    # unpack a (level, qcell) node back to its leaf-shift band box
    lvl, cell = row["level"], row["qcell"]
    shift = LEAF + TOP - lvl
    lb = _lon_bits(shift)
    latb, lonb = cell >> lb, cell & ((1 << lb) - 1)
    k = TOP - lvl
    return (latb << k, (latb + 1) << k, lonb << k, (lonb + 1) << k)


def _run(spark, pts):
    df = spark.createDataFrame(
        pts, "doc_id long, lat_i long, lon_i long"
    )
    return quadtree_rollup(
        df, cap=CAP, leaf_shift=LEAF, levels=LEVELS
    ).collect()


def test_quadtree_invariants(spark):
    # hotspot: 200 docs inside ONE leaf cell; sparse: 6 docs spread
    # over a far-away coarse cell
    hot = [(i, 400000000 + i % 7, 300000000 + i % 5) for i in range(200)]
    sparse = [
        (1000 + i, -500000000 + i * 3000000, -700000000 + i * 2000000)
        for i in range(6)
    ]
    rows = _run(spark, hot + sparse)

    assert sum(r["n_docs"] for r in rows) == 206

    # capacity: every node NOT at leaf level obeys the cap
    for r in rows:
        if r["level"] < TOP:
            assert r["n_docs"] <= CAP, r

    # the hotspot exceeds cap at every level -> must sit at leaf
    hot_nodes = [r for r in rows if r["n_docs"] > CAP]
    assert hot_nodes and all(r["level"] == TOP for r in hot_nodes)

    # the 6 sparse docs fit the cap at level 0 -> exactly coarse
    sparse_nodes = [r for r in rows if r["level"] == 0]
    assert sum(r["n_docs"] for r in sparse_nodes) == 6

    # prefix-free: expand every node to its leaf-band box; boxes
    # must be pairwise disjoint (an ancestor's box would contain
    # its descendant's)
    boxes = [_bands(r) for r in rows]
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            a, b = boxes[i], boxes[j]
            overlap = (
                a[0] < b[1]
                and b[0] < a[1]
                and a[2] < b[3]
                and b[2] < a[3]
            )
            assert not overlap, (rows[i], rows[j])


def test_quadtree_offsets_match_cell_encode(spark):
    # a single doc lands in the leaf cell cell_encode would give
    # when every level splits is impossible with 1 doc -> level 0
    rows = _run(spark, [(1, 123456789, -987654321)])
    assert len(rows) == 1
    r = rows[0]
    assert r["level"] == 0 and r["n_docs"] == 1
    shift = LEAF + TOP
    latb = (123456789 + LAT_OFFSET) >> shift
    lonb = (-987654321 + LON_OFFSET) >> shift
    assert r["qcell"] == (latb << _lon_bits(shift)) | lonb


def test_incremental_equals_scratch_with_split_and_merge(spark):
    from pyspark.sql import functions as F

    from osmgraft.operators.tiles import quadtree_rollup_incremental

    # region X: exactly CAP docs (coarse node); adding 3 pushes it
    # over -> must SPLIT. region Y: CAP+4 docs (split); deleting 5
    # brings it under -> must MERGE back to the coarse node.
    base = []
    for k in range(CAP):
        base.append((100 + k, 400000000 + k * 9000, 300000000 + k * 11000))
    for k in range(CAP + 4):
        base.append((200 + k, -500000000 + k * 9000, -700000000 + k * 11000))
    base_df = spark.createDataFrame(
        base, "doc_id long, lat_i long, lon_i long"
    )
    adds = [
        (900 + j, 400000000 + j * 5000, 300000000 + j * 7000, False)
        for j in range(3)
    ]
    dels = [
        (200 + k, -500000000, -700000000, True) for k in range(5)
    ]
    ch_df = spark.createDataFrame(
        adds + dels,
        "doc_id long, lat_i long, lon_i long, deleted boolean",
    )

    inc = {
        (r["level"], r["qcell"]): (r["n_docs"], r["min_doc"])
        for r in quadtree_rollup_incremental(
            base_df, ch_df, cap=CAP, leaf_shift=LEAF, levels=LEVELS
        ).collect()
    }
    post = base_df.filter(~F.col("doc_id").isin([d[0] for d in dels])).unionByName(
        spark.createDataFrame(
            [(d, la, lo) for d, la, lo, _ in adds],
            "doc_id long, lat_i long, lon_i long",
        )
    )
    scratch = {
        (r["level"], r["qcell"]): (r["n_docs"], r["min_doc"])
        for r in quadtree_rollup(
            post, cap=CAP, leaf_shift=LEAF, levels=LEVELS
        ).collect()
    }
    assert inc == scratch
    # the split happened: region X no longer fits one level-0 node
    x_nodes = [
        lv for (lv, _), (n, md) in inc.items() if md in (100, 900)
    ]
    assert any(lv > 0 for lv in x_nodes)
    # the merge happened: region Y is back to a single level-0 node
    y_nodes = [
        (lv, n) for (lv, _), (n, md) in inc.items() if 200 <= md < 300
    ]
    assert y_nodes == [(0, CAP - 1)]
