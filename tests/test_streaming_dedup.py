"""Streaming first-seen-wins dedup (streaming/dedup.py): exactly one
keeper per distinct fingerprint, dedup state persists across stream
restarts, and with doc_id-ordered arrival the keeper set matches the
batch q15 operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.streaming.dedup import streaming_dedup


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _drain(spark, docs_dir, out_dir, ckpt):
    def sink(batch, _bid):
        batch.write.mode("append").parquet(out_dir)

    q = (
        streaming_dedup(spark, docs_dir)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return [
            (r.doc_id, r.is_first)
            for r in spark.read.parquet(out_dir).collect()
        ]
    except Exception:
        return []


def test_streaming_dedup_first_seen_wins(spark, tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    _write(spark, str(docs / "b1"), [
        (1, "alpha text"),
        (2, "alpha text"),       # same-batch dup
        (3, "beta text"),
    ])
    got = dict(_drain(spark, str(docs), out, ckpt))
    assert got == {1: True, 2: False, 3: True}

    # later micro-batch: cross-batch dup of 'alpha', new 'gamma';
    # the checkpointed state remembers fingerprints already seen
    _write(spark, str(docs / "b2"), [
        (0, "alpha text"),       # lower id arrives LATER -> dup
        (4, "gamma text"),
    ])
    got = dict(_drain(spark, str(docs), out, ckpt))
    assert got[0] is False       # arrival order wins, not id order
    assert got[4] is True


def test_streaming_keepers_match_batch_dedup(spark, tmp_path):
    """With arrival order following doc_id, the streaming keeper set
    equals the batch dedup_exact keepers (q15 rule: min doc_id)."""
    from osmgraft.operators.text import dedup_exact

    docs = tmp_path / "docs"
    docs.mkdir()
    rows = [
        (i, f"text {i % 5}") for i in range(20)
    ]  # 5 distinct contents, keeper = 0..4
    _write(spark, str(docs / "all"), rows)
    got = _drain(
        spark, str(docs), str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    stream_keepers = sorted(d for d, first in got if first)
    batch = dedup_exact(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    batch_keepers = sorted(r.keeper for r in batch.collect())
    assert stream_keepers == batch_keepers == [0, 1, 2, 3, 4]
    assert len(got) == 20


def test_streaming_probe_matches_batch_incremental(
    spark, tmp_path
):
    """streaming_near_dup_probe drained over the same batch docs
    must verify exactly the pairs/values of the batch
    incremental_near_dups (q88) after idempotent pair-dedup, and
    emit one row per shared band."""
    from osmgraft.operators.dedup import incremental_near_dups
    from osmgraft.streaming.dedup import streaming_near_dup_probe

    base = (
        "the quick brown fox jumps over the lazy dog and runs "
        "far away into the green forest tonight under the moon"
    )
    other = (
        "completely different words describing unrelated topics "
        "like databases query engines caching layers and formats"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    batch_rows = [
        (101, "dup " + base),
        (102, "fresh unseen content about sailing boats across "
              "wide oceans with steady winds and bright stars"),
        (103, other + " extra"),
    ]
    docs = tmp_path / "docs"
    _write(spark, str(docs), batch_rows)

    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def sink(b, _bid):
        b.write.mode("append").parquet(str(out))

    q = (
        streaming_near_dup_probe(spark, str(docs), corpus)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_rows = spark.read.parquet(str(out)).collect()
    assert len(got_rows) > 0
    # one row per shared band; pairs dedup to the batch result
    streamed = {
        (
            r["batch_doc"],
            r["corpus_doc"],
            r["inter"],
            round(r["jaccard"], 9),
        )
        for r in got_rows
    }
    batch_df = spark.createDataFrame(
        batch_rows, "doc_id long, text string"
    )
    want = {
        (
            r["batch_doc"],
            r["corpus_doc"],
            r["inter"],
            round(r["jaccard"], 9),
        )
        for r in incremental_near_dups(corpus, batch_df).collect()
    }
    assert streamed == want
    # duplicate-band rows are per-band distinct
    bands_per_pair = {}
    for r in got_rows:
        key = (r["batch_doc"], r["corpus_doc"])
        bands_per_pair.setdefault(key, set()).add(r["band_idx"])
        assert r["jaccard"] >= 0.5
    for key, bands in bands_per_pair.items():
        n_rows = sum(
            1
            for r in got_rows
            if (r["batch_doc"], r["corpus_doc"]) == key
        )
        assert n_rows == len(bands)  # no duplicated (pair, band)


def test_streaming_hll_equals_batch_sketch(spark, tmp_path):
    """streaming_hll_registers drained over two arrival batches
    must equal the batch sketch of all rows (max is split-
    invariant), and restarting from the checkpoint with more data
    only raises registers."""
    from osmgraft.operators.sketches import hll_registers
    from osmgraft.streaming.dedup import streaming_hll_registers

    def _write_keys(path, lo, hi, mode="overwrite"):
        spark.range(lo, hi).select(
            (F.col("id") % 3).cast("string").alias("grp"),
            F.concat(F.lit("key-"), F.col("id")).alias("k"),
        ).coalesce(1).write.mode(mode).parquet(path)

    docs = str(tmp_path / "keys")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_keys(docs, 0, 800)

    def sink(b, _bid):
        b.write.mode("overwrite").parquet(out)

    def drain():
        q = (
            streaming_hll_registers(spark, docs)
            .writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["grp"], r["reg"]): r["rho"]
            for r in spark.read.parquet(out).collect()
        }

    first = drain()
    batch1 = spark.range(0, 800).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.concat(F.lit("key-"), F.col("id")).alias("k"),
    )
    want1 = {
        (r["grp"], r["reg"]): r["rho"]
        for r in hll_registers(batch1, "grp", "k").collect()
    }
    assert first == want1

    # second arrival: restart from checkpoint, more keys
    _write_keys(docs, 800, 2000, mode="append")
    second = drain()
    batch2 = spark.range(0, 2000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.concat(F.lit("key-"), F.col("id")).alias("k"),
    )
    want2 = {
        (r["grp"], r["reg"]): r["rho"]
        for r in hll_registers(batch2, "grp", "k").collect()
    }
    assert second == want2
    for key, rho in first.items():
        assert second.get(key, 0) >= rho  # monotone


def test_streaming_countmin_equals_batch_sketch(spark, tmp_path):
    """streaming_countmin drained over two arrival batches must
    equal the batch sketch of all rows (sums are split-invariant),
    and restarting from the checkpoint with more data only grows
    cells — the never-undercount guarantee holds at every
    micro-batch boundary."""
    from osmgraft.operators.sketches import countmin_sketch
    from osmgraft.streaming.dedup import streaming_countmin

    def _keys(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(
                F.lit("w-"), (F.col("id") % 97).cast("string")
            ).alias("key")
        )

    docs = str(tmp_path / "keys")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _keys(0, 700).coalesce(1).write.mode("overwrite").parquet(docs)

    def sink(b, _bid):
        b.write.mode("overwrite").parquet(out)

    def drain():
        q = (
            streaming_countmin(spark, docs, d=3, w=64)
            .writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["row"], r["col"]): r["cnt"]
            for r in spark.read.parquet(out).collect()
        }

    first = drain()
    want1 = {
        (r["row"], r["col"]): r["cnt"]
        for r in countmin_sketch(_keys(0, 700), "key", d=3, w=64).collect()
    }
    assert first == want1

    _keys(700, 1600).coalesce(1).write.mode("append").parquet(docs)
    second = drain()
    want2 = {
        (r["row"], r["col"]): r["cnt"]
        for r in countmin_sketch(
            _keys(0, 1600), "key", d=3, w=64
        ).collect()
    }
    assert second == want2
    for key, cnt in first.items():
        assert second.get(key, 0) >= cnt  # cells only grow


def test_streaming_binned_hist_equals_batch_quantiles(
    spark, tmp_path
):
    """streaming_binned_hist drained over two arrival batches must
    equal the batch bin histogram exactly, and feeding the drained
    state through quantiles_from_bins must reproduce the batch
    binned_quantiles rows (certificate included)."""
    from osmgraft.operators.sketches import (
        bin_hist,
        binned_quantiles,
        quantiles_from_bins,
    )
    from osmgraft.streaming.dedup import streaming_binned_hist

    def _vals(lo, hi):
        # long-tailed-ish, includes negatives
        return spark.range(lo, hi).select(
            ((F.col("id") * F.col("id")) % 997 - 100)
            .cast("long")
            .alias("v")
        )

    def _write(path, lo, hi, mode="overwrite"):
        _vals(lo, hi).coalesce(1).write.mode(mode).parquet(path)

    docs = str(tmp_path / "vals")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write(docs, 0, 700)

    def sink(b, _bid):
        b.write.mode("overwrite").parquet(out)

    def drain():
        q = (
            streaming_binned_hist(spark, docs, bin_shift=3)
            .writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    hist1 = drain()
    want1 = {
        (r["bin"], r["_c"])
        for r in bin_hist(_vals(0, 700), "v", 3).collect()
    }
    assert {(r["bin"], r["_c"]) for r in hist1.collect()} == want1

    # restart from checkpoint with a second arrival
    _write(docs, 700, 2500, mode="append")
    hist2 = drain()
    want2 = {
        (r["bin"], r["_c"])
        for r in bin_hist(_vals(0, 2500), "v", 3).collect()
    }
    assert {(r["bin"], r["_c"]) for r in hist2.collect()} == want2

    # drained state -> certified percentiles == batch sketch rows
    got_q = {
        tuple(r)
        for r in quantiles_from_bins(
            hist2, (50, 90, 99), 3
        ).collect()
    }
    want_q = {
        tuple(r)
        for r in binned_quantiles(
            _vals(0, 2500), "v", (50, 90, 99), 3
        ).collect()
    }
    assert got_q == want_q


def test_streaming_kmv_equals_batch_sketch(spark, tmp_path):
    """streaming_kmv drained over two arrival batches (with a
    checkpoint restart between them) equals the batch KMV sketch
    of all arrived rows."""
    from osmgraft.operators.sketches import kmv_sketch
    from osmgraft.streaming.dedup import streaming_kmv

    def _write(path, lo, hi, mode="overwrite"):
        spark.range(lo, hi).select(
            (F.col("id") % 3).cast("string").alias("grp"),
            F.concat(F.lit("key-"), F.col("id") % 900)
            .alias("k"),
        ).coalesce(1).write.mode(mode).parquet(path)

    docs = str(tmp_path / "keys")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write(docs, 0, 500)

    def sink(b, _bid):
        b.write.mode("overwrite").parquet(out)

    def drain():
        q = (
            streaming_kmv(spark, docs, k=32)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["grp"], r["rank"], r["h"])
            for r in spark.read.parquet(out).collect()
        }

    def batch(hi):
        rows = spark.range(0, hi).select(
            (F.col("id") % 3).cast("string").alias("grp"),
            F.concat(F.lit("key-"), F.col("id") % 900)
            .alias("k"),
        )
        return {
            (r["grp"], r["rank"], r["h"])
            for r in kmv_sketch(rows, "grp", "k", k=32).collect()
        }

    assert drain() == batch(500)
    _write(docs, 500, 2000, mode="append")
    assert drain() == batch(2000)


def test_streaming_hour_counts_equals_batch_spikes(
    spark, tmp_path
):
    """streaming_hour_counts drained over two arrivals equals the
    batch hour_counts, and the finished spike flags match the
    batch event_spikes."""
    import datetime as dt

    from osmgraft.operators.events import (
        event_spikes,
        hour_counts,
        spikes_from_counts,
    )
    from osmgraft.streaming.dedup import streaming_hour_counts

    def _rows(lo, hi):
        base = dt.datetime(1970, 1, 5)
        return spark.createDataFrame(
            [
                (
                    "t" + str(i % 2),
                    base
                    + dt.timedelta(hours=(i * i) % 7, minutes=i % 60),
                )
                for i in range(lo, hi)
            ],
            "event_type string, ts timestamp",
        )

    docs = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _rows(0, 300).coalesce(1).write.mode("overwrite").parquet(docs)

    def sink(b, _bid):
        b.write.mode("overwrite").parquet(out)

    def drain():
        q = (
            streaming_hour_counts(spark, docs)
            .writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    drain()
    _rows(300, 900).coalesce(1).write.mode("append").parquet(docs)
    drained = drain()
    want_counts = {
        (r.event_type, r.hr, r.cnt)
        for r in hour_counts(_rows(0, 900)).collect()
    }
    assert {
        (r.event_type, r.hr, r.cnt) for r in drained.collect()
    } == want_counts
    got_flags = {
        tuple(r)
        for r in spikes_from_counts(drained).collect()
    }
    want_flags = {
        tuple(r) for r in event_spikes(_rows(0, 900)).collect()
    }
    assert got_flags == want_flags
