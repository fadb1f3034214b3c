"""Plan-shape regression guards: the physical plans that make the
engine scale must not silently regress.

These assert the properties argued in README 'Plan-shape
principles': column pruning to the scan, filter pushdown, exactly
one Python stage in the flagship, no shuffles where none are
needed, and broadcast (not shuffled) joins for small sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    from osmgraft.pages import synth_pages

    p = str(tmp_path_factory.mktemp("pages") / "pages")
    synth_pages(spark, 2000, partitions=4).write.parquet(p)
    return spark.read.parquet(p)


def test_flagship_plan_shape(pages):
    from osmgraft.operators.flagship import flagship_assign

    plan = _formatted(flagship_assign(pages))
    # column pruning: the binary html column must never be read
    assert "html" not in plan
    assert "ReadSchema: struct<url:string,text:string>" in plan
    # the cheap prefilter reaches the parquet scan
    assert "StringContains(text,City)" in plan
    # exactly ONE Python stage — the vectorized PIP kernel (the
    # inlined-Catalyst PIP variant measured >10x slower: codegen
    # blowup + deterministic filter pushdown duplicating the chain;
    # see spatial.JVM_EDGE_LIMIT)
    assert plan.count("ArrowEvalPython (") == 1
    # zero shuffles: broadcast polygons, partition-local points
    assert "Exchange" not in plan


def test_flagship_single_extraction(pages):
    """The geocode term extraction appears in exactly one Project
    operator — no Filter on derived columns re-runs it."""
    from osmgraft.operators.flagship import flagship_assign

    plan = _formatted(flagship_assign(pages))
    # the packed-map lookup string appears once per derived column
    # within ONE Project node and nowhere else (notably: not inside
    # any Filter condition)
    for line in plan.splitlines():
        if line.startswith("Condition") and "split(" in line:
            raise AssertionError(
                f"geocode extraction leaked into a Filter: {line[:120]}"
            )


def test_bbox_filter_pushdown(spark):
    from osmgraft.suite import q01_bbox_filter

    plan = _formatted(q01_bbox_filter(spark, "/root/testdata/sf0.001"))
    # derived-column filter can't push to parquet, but the scan must
    # prune to the one needed column
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_knn_zero_shuffle(spark):
    """The broadcast kNN never shuffles: the gazetteer lives inside
    the Arrow kernel (per-point top-k is row-local), so the plan is
    scan -> project -> MapInPandas with no Exchange at all."""
    from osmgraft.suite import q05_knn_city

    plan = _plan(q05_knn_city(spark, "/root/testdata/sf0.001"))
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_assign_regions_no_shuffle(spark):
    from osmgraft.fixtures import fixture_polyset
    from osmgraft.operators import spatial
    from osmgraft.suite import doc_points

    pts = doc_points(spark, "/root/testdata/sf0.001")
    # default (Arrow kernel) path: one python stage, no shuffle
    plan = _plan(spatial.assign_regions(pts, fixture_polyset()))
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1

    # opt-in JVM path: zero python stages, still no shuffle
    old = spatial.JVM_EDGE_LIMIT
    try:
        spatial.JVM_EDGE_LIMIT = 10_000
        plan = _plan(spatial.assign_regions(pts, fixture_polyset()))
    finally:
        spatial.JVM_EDGE_LIMIT = old
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan


def test_union_dedup_single_shuffle(spark):
    from osmgraft.suite import q08_union_dedup

    plan = _plan(q08_union_dedup(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange hashpartitioning") == 1


def test_jaccard_composed_plan_has_no_gram_selfjoin(spark):
    """round-2 scale fix guard: q17's exact Jaccard must run on LSH
    candidate pairs only — no join keyed on a gram column anywhere
    in the physical plan (the all-pairs gram self-join is quadratic
    per hot gram at corpus scale)."""
    import re

    from osmgraft.operators.dedup import (
        jaccard_on_candidates,
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"one two three four five w{i}") for i in range(50)],
        "doc_id long, text string",
    )
    out = jaccard_on_candidates(docs, minhash_lsh_pairs(docs))
    plan = _plan(out)
    for m in re.finditer(r"(?i)join[^\n]*", plan):
        assert "gram" not in m.group(0).lower(), m.group(0)


def test_minhash_plan_uses_partial_aggregation(spark):
    """the signature agg must have a map-side partial phase (the
    shuffle carries per-doc mins, not exploded grams)."""
    from osmgraft.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"a b c d e f w{i}") for i in range(50)],
        "doc_id long, text string",
    )
    plan = _plan(minhash_lsh_pairs(docs))
    # HashAggregate appears in partial+final pairs around the
    # exchange; at minimum a partial_min must exist upstream
    assert "partial_min" in plan or "HashAggregate" in plan
    first_agg = plan.rindex("HashAggregate")
    assert "Exchange" in plan[:first_agg] or "Exchange" in plan


def test_ann_small_sides_are_broadcast(spark):
    """banded-ANN signatures stay in-row (no shuffle before the
    band self-join) and IVF's centroid side is broadcast, never
    shuffled."""
    from osmgraft.operators.dedup import embed_ann_ivf

    emb = spark.createDataFrame(
        [(i, [float((i * 31 + d) % 7) for d in range(8)])
         for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(
        embed_ann_ivf(
            emb,
            centroid_filter=F.col("vec_id") % 10 == 0,
            query_filter=F.col("vec_id") % 25 == 0,
        )
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_decontaminate_broadcasts_eval_shingles(spark):
    """q53: the eval-set shingles must reach the corpus via a
    BroadcastHashJoin — the corpus side is never shuffled before
    the per-doc aggregate's own exchange."""
    from osmgraft.operators.text import decontaminate_flags

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(30)))
         for i in range(300)],
        "doc_id long, text string",
    )
    plan = _plan(
        decontaminate_flags(docs, F.col("doc_id") % 97 == 0)
    )
    assert "BroadcastHashJoin" in plan
    # exactly one exchange bringing per-doc partial counts together
    # (plus the broadcast exchange); no SortMergeJoin anywhere
    assert "SortMergeJoin" not in plan


def test_stratified_sample_is_map_only(spark):
    """q62: deterministic sampling must stay a pushdown-friendly
    filter — no Exchange, no Python stage."""
    from osmgraft.operators.text import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(100)],
        "doc_id long, lang string",
    )
    plan = _plan(stratified_sample(docs, {"en": 0.5}, seed=1))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_corpus_filter_single_exchange(spark):
    """q61: all heuristics ride the scan; the fingerprint window is
    the only exchange and there is no Python stage."""
    from osmgraft.operators.text import corpus_filter_verdict

    docs = spark.createDataFrame(
        [(i, f"the w{i} x{i} " * 30) for i in range(200)],
        "doc_id long, text string",
    )
    plan = _plan(corpus_filter_verdict(docs))
    assert plan.count("Exchange") == 1
    assert "Python" not in plan


def test_running_total_no_global_window(spark):
    """q63: the prefix sum must stay a range shuffle + mapInPandas;
    a SUM() OVER (ORDER BY) would funnel every row through one
    task (Window + Exchange SinglePartition)."""
    from osmgraft.operators.indexing import with_running_total

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    plan = _plan(
        with_running_total(df, ["k"], "v", num_partitions=8)
    )
    # the lazy localCheckpoint truncates the plan at the range
    # shuffle (test_running_total covers the distribution); what
    # must never appear downstream is a global Window
    assert "Window" not in plan
    assert "SinglePartition" not in plan
    assert "MapInPandas" in plan


def test_tile_quality_one_equi_join_partial_agg(spark):
    """q64: one co-keyed equi-join on doc_id feeding an algebraic
    cell rollup — no nested-loop/cartesian join, and the count/sum
    aggregate map-side (partial) before the cell shuffle."""
    from osmgraft.suite import q64_tile_quality

    plan = _plan(q64_tile_quality(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert joins == 1, plan
    assert "partial_count" in plan or "partial" in plan


def test_incremental_dedup_plan_no_gram_selfjoin(spark):
    """q88 guard: the batch-vs-index probe must join band rows and
    candidate lists only — no join keyed on a gram column (the
    quadratic-per-hot-gram shape), and no cartesian product."""
    import re

    from osmgraft.operators.dedup import incremental_near_dups

    corpus = spark.createDataFrame(
        [(i, f"one two three four five w{i}") for i in range(40)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100 + i, f"one two three four five w{i} x")
         for i in range(10)],
        "doc_id long, text string",
    )
    plan = _plan(incremental_near_dups(corpus, batch))
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"(?i)join[^\n]*", plan):
        assert "gram" not in m.group(0).lower(), m.group(0)


def test_pq_encode_corpus_side_map_only(spark):
    """q89 guard: encoding joins the corpus rows against a
    BROADCAST grouped codebook; the only exchange in the plan is
    the tiny codebook-side aggregation (bounded by m*k rows) —
    the corpus itself is never shuffled."""
    from osmgraft.operators.pq import pq_encode

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(16)])
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(pq_encode(emb, m=4, k=4, dim=16))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # every Exchange sits on the codebook branch (below the
    # broadcast), none on the corpus probe side: the plan's last
    # join input (the streamed corpus side) has no Exchange after
    # the broadcast marker
    assert plan.count("Exchange hashpartitioning") <= 2


def test_adc_lut_is_broadcast(spark):
    """q90/q93 guard: the per-query LUT reaches candidates via a
    broadcast (nested-loop or hash) join — the corpus code rows
    must not shuffle to meet the queries."""
    from osmgraft.operators.pq import ivf_pq_topk, pq_adc_topk

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(16)])
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(
        pq_adc_topk(emb, F.col("vec_id") % 8 == 0, m=4, k=4,
                    dim=16)
    )
    assert "BroadcastNestedLoopJoin" in plan or (
        "BroadcastHashJoin" in plan
    )
    assert "CartesianProduct" not in plan
    plan2 = _plan(
        ivf_pq_topk(emb, F.col("vec_id") % 8 == 0, kc=4, m=4,
                    k=4, dim=16)
    )
    assert "CartesianProduct" not in plan2
    assert "BroadcastHashJoin" in plan2


def test_hll_registers_single_partial_agg_shuffle(spark):
    """q91 guard: the sketch is ONE map-side-combined groupBy —
    exactly one exchange, with a partial aggregate upstream of
    it."""
    from osmgraft.operators.sketches import hll_registers

    df = spark.createDataFrame(
        [("g", f"key-{i}") for i in range(100)],
        "grp string, k string",
    )
    plan = _plan(hll_registers(df, "grp", "k"))
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan or "HashAggregate" in plan


def test_star_rollup_broadcasts_dims(spark):
    """q118: both dimension joins must be broadcast — the fact
    side never shuffles for the join."""
    from osmgraft.suite import QUERIES

    df = QUERIES["q118_star_rollup"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_sq8_plan_broadcasts_query_side(spark):
    """q149: the query-code and query-vector sides ride broadcast
    joins; no CartesianProduct anywhere; encode stays map-only up
    to the candidate window (the only Exchanges are the per-query
    windows and the tiny bounds agg)."""
    from osmgraft.operators.sq import sq8_topk

    emb = spark.createDataFrame(
        [(i, [float((i * 17 + d) % 11) for d in range(8)])
         for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(sq8_topk(emb, F.col("vec_id") % 20 == 0, k=2, n_cand=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_interval_join_is_keyed_never_cartesian(spark):
    """q150: the range predicate must ride a user-keyed equi-join
    (SortMergeJoin/ShuffledHashJoin/BroadcastHashJoin), never a
    cartesian/broadcast-nested-loop over the full event table."""
    from osmgraft.operators.events import interval_pairs

    ev = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 10}:00:0{i % 6}", i % 7,
          "error" if i % 3 == 0 else "click")
         for i in range(200)],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df = interval_pairs(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "click"),
        tolerance_s=600,
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_stencil_operators_single_aggregation(spark):
    """q215/q216 guard: the contour/morphology stencils are the
    explode-vote trick — ONE hash-partitioned aggregation
    exchange, no sort-merge join, no cartesian (the offsets table
    rides as a broadcast of literal rows)."""
    from osmgraft.operators.tiles import (
        contour_cases,
        raster_morphology,
    )

    cells = spark.createDataFrame(
        [(y, x, 10) for y in range(4) for x in range(4)],
        "latb long, lonb long, n long",
    )
    for df in (
        contour_cases(cells, threshold=3),
        raster_morphology(cells, threshold=3),
    ):
        plan = _plan(df)
        assert plan.count("Exchange hashpartitioning") == 1
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan


def test_bitmap_index_single_shuffle(spark):
    """q227 guard: the bitmap build is one map-side-combined
    bit_or groupBy — per-group state one long, one exchange."""
    from osmgraft.operators.bitmapix import category_bitmaps

    df = spark.createDataFrame(
        [("t", i % 7) for i in range(100)],
        "tile string, host long",
    )
    plan = _plan(category_bitmaps(df, "tile", "host", 23))
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_sequence_ngrams_no_join(spark):
    """q223 guard: grams come from leads in ONE per-key window —
    no self-join of the event stream."""
    from osmgraft.operators.events import sequence_ngrams

    df = spark.createDataFrame(
        [(i, i, i % 5, f"e{i % 3}") for i in range(50)],
        "event_id long, ts long, user_id long, event_type string",
    )
    plan = _plan(sequence_ngrams(df, n=3, t_col="ts"))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_snapshot_read_no_join(spark):
    """q226 guard: the MVCC read is filter + one per-id window —
    no join against anything."""
    from osmgraft.operators.merge import snapshot_read

    df = spark.createDataFrame(
        [(1, 0, "a", False), (1, 1, "b", False)],
        "doc_id long, ver long, text string, deleted boolean",
    )
    plan = _plan(snapshot_read(df, as_of=1))
    assert "Join" not in plan


def test_survival_no_subject_explosion(spark):
    """q224 guard: at-risk comes from the delta trick — the plan
    never joins subjects against a calendar (no range join, no
    explode of user x day)."""
    from osmgraft.operators.events import survival_table

    df = spark.createDataFrame(
        [(i, 0, 5) for i in range(50)],
        "user_id long, first_day long, last_day long",
    )
    plan = _plan(survival_table(df))
    assert "Generate explode" not in plan
    assert "CartesianProduct" not in plan
