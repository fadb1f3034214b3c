"""binned_quantiles (q105): certificate, mergeability, negatives."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.sketches import binned_quantiles


def _exact_pctl(vals: np.ndarray, p: int) -> int:
    vals = np.sort(vals)
    n = len(vals)
    rank = (p * n + 99) // 100  # ceil-rank, 1-based
    return int(vals[rank - 1])


@pytest.mark.parametrize("seed,shift", [(1, 4), (2, 0), (3, 7)])
def test_certificate_contains_exact_percentile(spark, seed, shift):
    rng = np.random.default_rng(seed)
    vals = rng.geometric(0.001, 20_000).astype(np.int64)  # long tail
    df = spark.createDataFrame(
        [(int(v),) for v in vals], "v long"
    )
    out = {
        r.p: r
        for r in binned_quantiles(df, "v", bin_shift=shift).collect()
    }
    for p in (50, 90, 99):
        exact = _exact_pctl(vals, p)
        r = out[p]
        assert r.lo <= exact <= r.hi, (p, exact, r)
        assert r.n_rows == len(vals)
        # cum_le really is the count of values <= hi
        assert r.cum_le == int((vals <= r.hi).sum())
    # bin_shift=0 degenerates to the exact distinct-value histogram
    if shift == 0:
        for p in (50, 90, 99):
            assert out[p].lo == out[p].hi == _exact_pctl(vals, p)


def test_mergeable_across_splits(spark):
    """Summing the two halves' bin histograms equals the whole-
    corpus sketch — the snapshot-merge contract."""
    rng = np.random.default_rng(9)
    vals = rng.integers(-500, 5000, 10_000)
    a, b = vals[:6000], vals[6000:]
    whole = spark.createDataFrame([(int(v),) for v in vals], "v long")
    half_a = spark.createDataFrame([(int(v),) for v in a], "v long")
    half_b = spark.createDataFrame([(int(v),) for v in b], "v long")
    merged = half_a.unionAll(half_b)  # union == summed bins
    got_whole = {
        (r.p, r.bin, r.lo, r.hi, r.cum_le, r.n_rows)
        for r in binned_quantiles(whole, "v").collect()
    }
    got_merged = {
        (r.p, r.bin, r.lo, r.hi, r.cum_le, r.n_rows)
        for r in binned_quantiles(merged, "v").collect()
    }
    assert got_whole == got_merged


def test_negative_values_keep_order(spark):
    vals = np.array([-100, -50, -1, 0, 1, 7, 8, 100, 1000, -3])
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    out = {r.p: r for r in binned_quantiles(df, "v").collect()}
    for p in (50, 90, 99):
        exact = _exact_pctl(vals, p)
        assert out[p].lo <= exact <= out[p].hi


def test_single_corpus_scan(spark):
    """The corpus parquet/scan subtree must appear once in the
    plan: total comes from max(cum), not a second count."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 97).cast("long").alias("v")
    )
    out = binned_quantiles(df, "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 1000") <= 1


def test_grouped_quantiles_match_global_per_group(spark):
    """Each group's grouped-sketch rows equal the global sketch
    run on that group alone (partitioned windows change nothing),
    and the certificate still brackets the exact ceil-rank value."""
    from pyspark.sql import functions as F

    from osmgraft.operators.sketches import (
        binned_quantiles,
        grouped_binned_quantiles,
    )

    df = spark.range(900).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        ((F.col("id") * 37) % 501 - 50).cast("long").alias("v"),
    )
    got = {
        (r.grp, r.p): (r.bin, r.lo, r.hi, r.cum_le, r.n_rows)
        for r in grouped_binned_quantiles(
            df, "grp", "v", (50, 90, 99), 3
        ).collect()
    }
    for g in ("0", "1", "2"):
        solo = {
            r.p: (r.bin, r.lo, r.hi, r.cum_le, r.n_rows)
            for r in binned_quantiles(
                df.where(F.col("grp") == g).select("v"),
                "v",
                (50, 90, 99),
                3,
            ).collect()
        }
        for p, row in solo.items():
            assert got[(g, p)] == row
        # exact ceil-rank value inside [lo, hi]
        vals = sorted(
            r.v
            for r in df.where(F.col("grp") == g).collect()
        )
        for p in (50, 90, 99):
            exact = vals[(p * len(vals) + 99) // 100 - 1]
            bin_, lo, hi, _, _ = got[(g, p)]
            assert lo <= exact <= hi
