"""HLL register sketches (operators/sketches.py): merge-equals-
union exactness, partitioning invariance, register invariants,
and estimator sanity at a cardinality where the raw estimate is
in its calibrated range."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.sketches import (
    hll_merge,
    hll_registers,
    hll_summary,
)


def _keys(spark, lo: int, hi: int, grp: str = "g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("grp"),
        F.concat(F.lit("key-"), F.col("id")).alias("k"),
    )


def test_merge_equals_union_sketch(spark):
    a = _keys(spark, 0, 3000)
    b = _keys(spark, 2000, 6000)  # overlapping snapshots
    merged = {
        (r["grp"], r["reg"]): r["rho"]
        for r in hll_merge(
            hll_registers(a, "grp", "k"),
            hll_registers(b, "grp", "k"),
        ).collect()
    }
    direct = {
        (r["grp"], r["reg"]): r["rho"]
        for r in hll_registers(
            a.unionByName(b), "grp", "k"
        ).collect()
    }
    assert merged == direct


def test_partitioning_invariance(spark):
    a = _keys(spark, 0, 4000)
    one = {
        (r["reg"]): r["rho"]
        for r in hll_registers(
            a.repartition(1), "grp", "k"
        ).collect()
    }
    many = {
        (r["reg"]): r["rho"]
        for r in hll_registers(
            a.repartition(32), "grp", "k"
        ).collect()
    }
    assert one == many


def test_register_invariants(spark):
    regs = hll_registers(_keys(spark, 0, 5000), "grp", "k", p=6)
    rows = regs.collect()
    assert len(rows) <= 64
    for r in rows:
        assert 0 <= r["reg"] < 64
        assert 1 <= r["rho"] <= 43
    s = hll_summary(regs, p=6).collect()
    assert len(s) == 1
    assert s[0]["zeros"] + len(rows) == 64


def test_estimate_sanity(spark):
    # 5000 distinct keys duplicated 3x: duplicates must not move
    # the sketch; raw estimate within the HLL error envelope
    # (~1.04/sqrt(64) ~ 13% stderr; allow 4 sigma).
    base = _keys(spark, 0, 5000)
    dup = base.unionByName(base).unionByName(base)
    s = hll_summary(
        hll_registers(dup, "grp", "k", p=6), p=6
    ).collect()[0]
    assert s["zeros"] == 0
    assert abs(s["raw_est"] - 5000) / 5000 < 0.52
    # and identical to the dedup'd sketch
    s2 = hll_summary(
        hll_registers(base, "grp", "k", p=6), p=6
    ).collect()[0]
    assert s["raw_est"] == s2["raw_est"]


def test_groups_are_independent(spark):
    a = _keys(spark, 0, 1000, "g1")
    b = _keys(spark, 0, 1000, "g2")  # same keys, other group
    regs = hll_registers(a.unionByName(b), "grp", "k")
    g1 = {
        (r["reg"], r["rho"])
        for r in regs.filter(F.col("grp") == "g1").collect()
    }
    g2 = {
        (r["reg"], r["rho"])
        for r in regs.filter(F.col("grp") == "g2").collect()
    }
    assert g1 == g2  # same key set -> same registers per group


# ---------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------


def _words(spark, seed: int, n: int):
    # zipf-ish: word-j appears ~n/(j+1) times
    return spark.range(0, n).select(
        F.concat(
            F.lit(f"w{seed}-"),
            (F.col("id") % 7 * (F.col("id") % 11) % 13).cast(
                "string"
            ),
        ).alias("word")
    )


def test_countmin_never_undercounts(spark):
    from osmgraft.operators.sketches import (
        countmin_lookup,
        countmin_sketch,
    )

    words = _words(spark, 1, 3000)
    sketch = countmin_sketch(words, "word", d=4, w=64)
    probes = words.distinct()
    est = {
        r["key"]: r["est"]
        for r in countmin_lookup(
            sketch, probes, "word", d=4, w=64
        ).collect()
    }
    true = {
        r["word"]: r["cnt"]
        for r in words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)


def test_countmin_merge_equals_union_sketch(spark):
    from osmgraft.operators.sketches import (
        countmin_merge,
        countmin_sketch,
    )

    a = _words(spark, 1, 1000)
    b = _words(spark, 2, 1500)
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in countmin_merge(
            countmin_sketch(a, "word"),
            countmin_sketch(b, "word"),
        ).collect()
    }
    direct = {
        (r["row"], r["col"]): r["cnt"]
        for r in countmin_sketch(
            a.unionByName(b), "word"
        ).collect()
    }
    assert merged == direct


def test_countmin_partitioning_invariance(spark):
    from osmgraft.operators.sketches import countmin_sketch

    w = _words(spark, 3, 2000)
    one = {
        (r["row"], r["col"]): r["cnt"]
        for r in countmin_sketch(
            w.repartition(1), "word"
        ).collect()
    }
    many = {
        (r["row"], r["col"]): r["cnt"]
        for r in countmin_sketch(
            w.repartition(32), "word"
        ).collect()
    }
    assert one == many


def test_countmin_total_mass(spark):
    """Each hash row partitions all occurrences: the sum of cnt
    per row equals the number of input rows."""
    from osmgraft.operators.sketches import countmin_sketch

    n = 2500
    w = _words(spark, 4, n)
    per_row = {
        r["row"]: r["tot"]
        for r in countmin_sketch(w, "word", d=4, w=32)
        .groupBy("row")
        .agg(F.sum("cnt").alias("tot"))
        .collect()
    }
    assert per_row == {0: n, 1: n, 2: n, 3: n}


# ---------------------------------------------------------------
# corpus delta
# ---------------------------------------------------------------


def test_corpus_delta_classifies(spark):
    from osmgraft.operators.text import corpus_delta

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (4, "d")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["change"]
        for r in corpus_delta(old, new).collect()
    }
    assert got == {2: "modified", 3: "deleted", 4: "added"}


def test_corpus_delta_empty_when_identical(spark):
    from osmgraft.operators.text import corpus_delta

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)],
        "doc_id long, text string",
    )
    assert corpus_delta(df, df).count() == 0


# ---------------- heavy hitters (sketch-then-verify) ----------------


def _skewed(spark, n_hot=5, hot_cnt=200, n_cold=400, cold_cnt=3):
    hot = spark.range(n_hot * hot_cnt).select(
        F.concat(
            F.lit("hot-"), (F.col("id") % n_hot).cast("string")
        ).alias("key")
    )
    cold = spark.range(n_cold * cold_cnt).select(
        F.concat(
            F.lit("cold-"), (F.col("id") % n_cold).cast("string")
        ).alias("key")
    )
    return hot.unionByName(cold)


def test_heavy_hitters_exact_vs_plain_groupby(spark):
    from osmgraft.operators.sketches import heavy_hitters

    df = _skewed(spark)
    got = {
        (r["key"], r["cnt"])
        for r in heavy_hitters(df, "key", threshold=100).collect()
    }
    want = {
        (r["key"], r["cnt"])
        for r in df.groupBy("key")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= 100)
        .collect()
    }
    assert got == want
    assert len(got) == 5  # exactly the planted hot keys


def test_heavy_hitters_threshold_above_max_is_empty(spark):
    from osmgraft.operators.sketches import heavy_hitters

    df = _skewed(spark, hot_cnt=50)
    assert heavy_hitters(df, "key", threshold=10_000).count() == 0


def test_heavy_hitters_gate_prunes_cold_keys(spark):
    """The map-side InSet gate must reject (almost all) cold
    occurrences before the exact groupBy — with 400 cold keys in
    a 4x512 sketch the surviving false-positive set has to be a
    small fraction, else the two-phase plan buys nothing."""
    from osmgraft.operators.sketches import (
        _hash48,
        countmin_sketch,
    )

    df = _skewed(spark)
    threshold, d, w = 100, 4, 512
    sketch = countmin_sketch(df, "key", d=d, w=w)
    hot = sketch.filter(F.col("cnt") >= threshold).collect()
    cols = {i: [] for i in range(d)}
    for r in hot:
        cols[int(r["row"])].append(int(r["col"]))
    pred = None
    for i in range(d):
        ci = _hash48(F.concat(F.lit(f"{i}:"), F.col("key"))) % w
        p = ci.isin(cols[i]) if cols[i] else F.lit(False)
        pred = p if pred is None else pred & p
    survivors = df.filter(pred).select("key").distinct().count()
    assert survivors <= 20  # 5 hot + a handful of collisions


# ----------------------------------------------------------------
# KMV / theta sketches
# ----------------------------------------------------------------


def test_kmv_merge_equals_union_sketch(spark):
    from osmgraft.operators.sketches import kmv_merge, kmv_sketch

    a = _keys(spark, 0, 2000)
    b = _keys(spark, 1500, 4000)
    merged = {
        (r["grp"], r["rank"], r["h"])
        for r in kmv_merge(
            kmv_sketch(a, "grp", "k", k=48),
            kmv_sketch(b, "grp", "k", k=48),
            k=48,
        ).collect()
    }
    direct = {
        (r["grp"], r["rank"], r["h"])
        for r in kmv_sketch(
            a.unionByName(b), "grp", "k", k=48
        ).collect()
    }
    assert merged == direct


def test_kmv_small_set_is_exact_and_invariant(spark):
    from osmgraft.operators.sketches import kmv_sketch, kmv_summary

    small = _keys(spark, 0, 30)  # 30 < k
    sk = kmv_sketch(small.repartition(7), "grp", "k", k=64)
    rows = sk.collect()
    assert len(rows) == 30
    s = kmv_summary(sk, k=64).collect()[0]
    assert s["k_eff"] == 30 and s["raw_est"] == 30.0
    again = {
        (r["grp"], r["rank"], r["h"])
        for r in kmv_sketch(
            small.coalesce(1), "grp", "k", k=64
        ).collect()
    }
    assert again == {(r["grp"], r["rank"], r["h"]) for r in rows}


def test_kmv_estimates_calibrated(spark):
    from osmgraft.operators.sketches import (
        kmv_intersect,
        kmv_sketch,
        kmv_summary,
    )

    # |A| = 6000, |B| = 6000, |A ∩ B| = 2000, |A ∪ B| = 10000
    a = _keys(spark, 0, 6000)
    b = _keys(spark, 4000, 10000)
    k = 256
    ska = kmv_sketch(a, "grp", "k", k=k)
    skb = kmv_sketch(b, "grp", "k", k=k)
    est = kmv_summary(ska, k=k).collect()[0]["raw_est"]
    assert 0.8 * 6000 < est < 1.2 * 6000
    ix = kmv_intersect(ska, skb, k=k).collect()[0]
    assert ix["u_eff"] == k
    assert 0.6 * 2000 < ix["inter_est"] < 1.4 * 2000
    assert 0.6 * 0.2 < ix["jacc"] < 1.4 * 0.2
