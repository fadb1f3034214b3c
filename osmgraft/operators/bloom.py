"""Bloom-filter membership at corpus scale — the crawl-frontier
"have we already got this document?" primitive.

The 100-TB shape: the committed side collapses into an m-bit
filter held as `m/32` (word_idx, bits) LONG rows (32 bits used per
word, so every shift stays below 63 and the same expression is
exact in engines with checked shifts) via ONE
aggregation (bit_or of single-bit masks — longs OR-commute, so
the result is bit-identical under any partitioning). The filter
table is a few KB..MB and BROADCASTS; the probe side — the 100 TB
side — is then map-only + a broadcast hash join per hash probe.
The new crawl never shuffles. Spark's own `DataFrame.stat.
bloomFilter` builds the same structure but materializes it on the
driver as an opaque JVM object; keeping it AS A DATAFRAME makes
it joinable, persistable to parquet alongside the corpus manifest,
and oracle-checkable.

Determinism: hash_i(key) = bigint('0x' + md5(i || ':' || key)
[:12]) — 48 bits, exact in both Spark (conv base 16) and DuckDB
('0x..' cast). False positives are deterministic too: same keys,
same m, same k -> same bit pattern in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hash_bits(key, i: int, n_bits: int):
    """48-bit md5-prefix hash of `key` for hash index `i`,
    reduced mod n_bits. Engine-portable integer arithmetic."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 12),
        16,
        10,
    ).cast("long")
    return h % F.lit(n_bits)


def bloom_build(
    df: DataFrame,
    key: str = "key",
    n_words: int = 1024,
    k: int = 4,
) -> DataFrame:
    """Aggregate `df[key]` into a Bloom filter of `n_words * 32`
    bits as (word_idx, bits) rows. One explode (k rows per key),
    one partial-agg shuffle bounded by n_words."""
    n_bits = n_words * 32
    bit = F.explode(
        F.array(
            *[_hash_bits(F.col(key), i, n_bits) for i in range(k)]
        )
    ).alias("bit")
    return (
        df.select(bit)
        .select(
            (F.col("bit") / 32).cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(cast(1 as bigint),"
                " cast(bit % 32 as int))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    key: str = "key",
    n_words: int = 1024,
    k: int = 4,
) -> DataFrame:
    """Test each probe row against the filter: `maybe_seen` is
    true iff ALL k bits are set. The filter is broadcast; the
    probe side explodes k-fold, joins broadcast-left-outer on
    word_idx, and re-collapses with a key-preserving aggregate —
    at scale that is map + broadcast join + one keyed shuffle of
    k-fold the probe (cheap columns only, the payload stays out).
    """
    n_bits = n_words * 32
    bit = F.explode(
        F.array(
            *[_hash_bits(F.col(key), i, n_bits) for i in range(k)]
        )
    ).alias("bit")
    probes = probe.select(key, bit).select(
        key,
        (F.col("bit") / 32).cast("long").alias("word_idx"),
        F.expr(
            "shiftleft(cast(1 as bigint),"
            " cast(bit % 32 as int))"
        ).alias("mask"),
    )
    joined = probes.join(
        F.broadcast(bloom), "word_idx", "left_outer"
    ).select(
        key,
        (
            F.coalesce(F.col("bits"), F.lit(0))
            .bitwiseAND(F.col("mask"))
            != 0
        )
        .cast("int")
        .alias("hit"),
    )
    return joined.groupBy(key).agg(
        (F.min("hit") == 1).alias("maybe_seen")
    )


def bloom_seen_report(
    committed: DataFrame,
    incoming: DataFrame,
    key: str = "key",
    n_words: int = 1024,
    k: int = 4,
) -> DataFrame:
    """End-to-end: build the filter from `committed`, probe
    `incoming`, and attach exact ground truth (broadcast semi-join
    on the committed key set) so false positives are visible:
    (key, maybe_seen, seen). A Bloom `maybe_seen=false` is always
    truth (no false negatives); `maybe_seen=true, seen=false` rows
    are the deterministic FP set whose rate sizes the filter."""
    bloom = bloom_build(committed, key=key, n_words=n_words, k=k)
    probed = bloom_probe(
        incoming, bloom, key=key, n_words=n_words, k=k
    )
    truth = committed.select(F.col(key).alias("_ck")).distinct()
    return (
        probed.join(
            F.broadcast(truth),
            probed[key] == truth["_ck"],
            "left_outer",
        )
        .select(
            key,
            "maybe_seen",
            F.col("_ck").isNotNull().alias("seen"),
        )
    )
