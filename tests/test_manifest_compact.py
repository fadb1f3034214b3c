"""compact_committed: file count per bucket drops, content and
manifest stay byte-for-byte valid (verify_manifest is the audit)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from osmgraft.manifest import (
    compact_committed,
    read_committed,
    run_resumable,
    verify_manifest,
    with_bucket,
)

N_BUCKETS = 8


def _frag_write(spark, out):
    """Seed a committed table whose buckets hold many small files
    (several commit epochs of a deliberately over-partitioned df)."""
    pts = with_bucket(
        spark.range(0, 4000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") * 37 % 500).alias("cell"),
        ),
        "cell",
        N_BUCKETS,
    ).repartition(16)
    run_resumable(
        pts, out, n_buckets=N_BUCKETS, buckets_per_commit=2,
        input_lineage="seed",
    )
    return pts


def _n_files(out):
    return len(
        glob.glob(os.path.join(out, "data", "bucket=*", "*.parquet"))
    )


def test_compaction_reduces_files_preserves_content(spark, tmp_path):
    out = str(tmp_path / "out")
    pts = _frag_write(spark, out)
    before = _n_files(out)
    assert before > N_BUCKETS  # actually fragmented

    rows_before = sorted(
        (r.doc_id, r.cell, r.bucket)
        for r in read_committed(spark, out).collect()
    )
    passes = compact_committed(spark, out, buckets_per_pass=4)
    assert passes == 2

    after = _n_files(out)
    assert after < before
    assert after <= N_BUCKETS * 2  # ~1 file per bucket (+fs slack)

    rows_after = sorted(
        (r.doc_id, r.cell, r.bucket)
        for r in read_committed(spark, out).collect()
    )
    assert rows_after == rows_before
    # the manifest needed no change: content hashes still match
    assert verify_manifest(spark, out).isEmpty()
