"""Round-3 pipeline operators: tile pyramid (q54), dedup keep-list
(q55), chunk-level corpus dedup (q56) — structural properties the
oracle hash check can't see (level consistency, plan shape,
keeper rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.geo.cells import DEFAULT_SHIFT
from osmgraft.operators.dedup import dedup_keep_list
from osmgraft.operators.text import chunk_dedup_stats
from osmgraft.operators.tiles import tile_pyramid


def _pts(spark, n=3000):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        (470000000 + (F.col("id") * 2246822519) % 40000000)
        .cast("long").alias("lat_i"),
        (100000000 + (F.col("id") * 2654435761) % 40000000)
        .cast("long").alias("lon_i"),
    )


# ---------------------------------------------------------------
# tile_pyramid
# ---------------------------------------------------------------


def test_pyramid_levels_conserve_counts(spark):
    pts = _pts(spark)
    pyr = tile_pyramid(pts, levels=4).cache()
    per_level = {
        r["level"]: r["n"]
        for r in pyr.groupBy("level")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    assert per_level == {lvl: 3000 for lvl in range(4)}
    # coarser levels have (weakly) fewer cells
    cells = {
        r["level"]: r["c"]
        for r in pyr.groupBy("level")
        .agg(F.countDistinct("cell").alias("c"))
        .collect()
    }
    assert cells[0] >= cells[1] >= cells[2] >= cells[3]
    pyr.unpersist()


def test_pyramid_level0_matches_tile_rollup(spark):
    from osmgraft.operators.spatial import with_cell
    from osmgraft.operators.tiles import tile_rollup

    pts = _pts(spark, 1000)
    lvl0 = (
        tile_pyramid(pts, levels=2)
        .filter(F.col("level") == 0)
        .select("cell", "n_docs", "min_doc", "max_doc")
    )
    base = tile_rollup(with_cell(pts, shift=DEFAULT_SHIFT))
    assert lvl0.exceptAll(base).count() == 0
    assert base.exceptAll(lvl0).count() == 0


def test_pyramid_parent_aggregates_children(spark):
    """Every level-1 cell's count equals the sum of its (<=4)
    level-0 children — the defining pyramid invariant."""
    pts = _pts(spark, 2000)
    pyr = tile_pyramid(pts, levels=2).cache()
    from osmgraft.geo.cells import _lon_bits

    b0, b1 = _lon_bits(DEFAULT_SHIFT), _lon_bits(DEFAULT_SHIFT + 1)
    child = pyr.filter(F.col("level") == 0).select(
        F.shiftleft(
            F.shiftright(F.shiftright("cell", b0), 1), b1
        ).bitwiseOR(
            F.shiftright(
                F.col("cell").bitwiseAND(F.lit((1 << b0) - 1)), 1
            )
        ).alias("parent"),
        "n_docs",
    )
    rolled = child.groupBy("parent").agg(
        F.sum("n_docs").alias("n_docs")
    )
    parent = pyr.filter(F.col("level") == 1).select(
        F.col("cell").alias("parent"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )
    assert rolled.exceptAll(parent).count() == 0
    assert parent.exceptAll(rolled).count() == 0
    pyr.unpersist()


def test_pyramid_is_single_shuffle(spark):
    plan = tile_pyramid(_pts(spark), levels=4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------
# dedup_keep_list
# ---------------------------------------------------------------


def _corpus(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta epsilon"),  # longest of 1-2-3
        (3, "alpha beta gamma"),
        (10, "unique text one"),
        (20, "twin text xyz"),
        (21, "twin text xyz"),  # tie on length -> keep 20
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairs(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (20, 21)], ["a", "b"]
    )


def test_keep_list_longest_wins_singletons_keep(spark):
    out = {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in dedup_keep_list(_corpus(spark), _pairs(spark))
        .collect()
    }
    assert out[1] == (1, False)
    assert out[2] == (1, True)      # longest member
    assert out[3] == (1, False)
    assert out[10] == (10, True)    # singleton keeps itself
    assert out[20] == (20, True)    # length tie -> lowest doc_id
    assert out[21] == (20, False)
    # exactly one keeper per cluster
    assert sorted(
        c for c, k in out.values() if k
    ) == [1, 10, 20]


# ---------------------------------------------------------------
# chunk_dedup_stats
# ---------------------------------------------------------------


def test_chunk_dedup_flags_copies_and_truncations(spark):
    w = lambda n, tag: " ".join(  # noqa: E731
        f"{tag}{i}" for i in range(n)
    )
    rows = [
        (1, w(16, "a")),   # 2 chunks, copied by 2 -> ratio 1
        (2, w(16, "a")),
        (3, w(24, "b")),   # 3 chunks; doc 4 shares the first 2
        (4, w(16, "b")),
        (5, w(16, "c")),   # no dup -> ratio 0
        (6, w(7, "d")),    # <8 tokens -> no chunks, no row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (
            r["n_chunks"], r["n_dup_chunks"], r["dup_chunk_ratio"]
        )
        for r in chunk_dedup_stats(df).collect()
    }
    assert out[1] == (2, 2, 1.0)
    assert out[2] == (2, 2, 1.0)
    assert out[3] == (3, 2, round(2 / 3, 6))
    assert out[4] == (2, 2, 1.0)
    assert out[5] == (2, 0, 0.0)
    assert 6 not in out


def test_semantic_dedup_drops_scaled_copies(spark):
    """q57 end-to-end on sf0.001: every planted scaled copy
    (+100000 / +200000) is dropped, every original is kept, and
    each copy clusters back to its original id."""
    from osmgraft.suite_ml import q57_semantic_dedup

    rows = q57_semantic_dedup(spark, "/root/testdata/sf0.001")
    out = {
        r["vec_id"]: (r["cluster"], r["keep"]) for r in rows.collect()
    }
    originals = [v for v in out if v < 100000]
    copies = [v for v in out if v >= 100000]
    assert copies, "plant produced no copies"
    for v in copies:
        base = v % 100000
        assert out[v] == (base, False), (v, out[v])
    for v in originals:
        assert out[v][1] is True
        assert out[v][0] == v


def test_chunk_dedup_no_python_udf(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(32)))],
        ["doc_id", "text"],
    )
    plan = chunk_dedup_stats(df)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
