"""Epoch-aware incremental refresh (manifest.refresh_committed):
a changefile rewrites only affected buckets, a killed refresh
resumes onto still-stale buckets only, and the final committed
state equals a from-scratch rebuild of the post-change world —
the storage half of tiles.tile_rollup_incremental (north_rule
resumability at daily-diff cadence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.manifest import (
    manifest_df,
    read_committed,
    refresh_committed,
    run_resumable,
    verify_manifest,
    with_bucket,
)
from osmgraft.operators.merge import change_apply

N_BUCKETS = 16


def _base(spark):
    pts = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 37 % 1000).alias("cell"),
        (F.col("id") % 7).alias("payload"),
    )
    return with_bucket(pts, "cell", N_BUCKETS)


def _changes(base):
    moved = base.filter(F.col("doc_id") % 331 == 0).select(
        "doc_id",
        ((F.col("cell") + 211) % 1000).alias("cell"),
        F.lit(99).alias("payload"),
        (F.col("doc_id") % 662 == 0).alias("deleted"),
    )
    return with_bucket(moved, "cell", N_BUCKETS)


def _rows(df):
    return set(
        (r.doc_id, r.cell, r.payload, r.bucket)
        for r in df.select("doc_id", "cell", "payload", "bucket")
        .collect()
    )


def test_refresh_kill_resume_equals_rebuild(spark, tmp_path):
    out = str(tmp_path / "out")
    base = _base(spark)
    run_resumable(
        base, out, n_buckets=N_BUCKETS, buckets_per_commit=4,
        input_lineage="src@snap1",
    )

    changes = _changes(base)
    new_world = change_apply(base, changes, ["doc_id"])
    # affected = old buckets of changed keys + new buckets
    old_b = base.join(
        changes.select("doc_id"), "doc_id", "left_semi"
    ).select("bucket")
    new_b = changes.filter(~F.col("deleted")).select("bucket")
    affected = sorted(
        r.bucket for r in old_b.unionByName(new_b).distinct().collect()
    )
    assert 0 < len(affected) < N_BUCKETS  # a real partial refresh

    # kill after one commit group
    done = refresh_committed(
        new_world, out, affected, input_lineage="src@snap2",
        buckets_per_commit=3, max_commits=1,
    )
    assert done == 1
    # resume: only still-stale buckets re-run
    refresh_committed(
        new_world, out, affected, input_lineage="src@snap2",
        buckets_per_commit=3,
    )
    # a third refresh attempt is a no-op
    assert (
        refresh_committed(
            new_world, out, affected, input_lineage="src@snap2"
        )
        == 0
    )

    assert _rows(read_committed(spark, out)) == _rows(new_world)
    assert verify_manifest(spark, out).isEmpty()

    # untouched buckets kept their snap1 manifest rows; affected
    # buckets' latest rows carry snap2
    latest = (
        manifest_df(spark, out)
        .groupBy("bucket")
        .agg(F.max_by("input_lineage", "committed_at").alias("lin"))
    )
    lin = {r.bucket: r.lin for r in latest.collect()}
    for b in range(N_BUCKETS):
        assert lin[b] == ("src@snap2" if b in affected else "src@snap1")
