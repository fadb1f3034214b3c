"""Streaming exact dedup: first-seen-wins over a document stream —
the online twin of operators/text.dedup_exact (q15).

Each document hashes to a content fingerprint (md5, the same digest
as the batch operator); an applyInPandasWithState operator keyed by
fingerprint marks the first arrival `is_first = true` and every
later arrival (same batch or any later micro-batch) false. A
training-data ingest keeps only `is_first` rows, so duplicates are
dropped AS THE STREAM ARRIVES instead of in a nightly batch pass.

Determinism: within one micro-batch a fingerprint's rows are
ordered by doc_id, so the lowest doc_id of the batch wins — the
same keeper rule as the batch operator when arrival order follows
doc_id. Across batches, arrival order wins (that is the point of
online dedup).

Scale notes (100-TB stream): state is ONE long per distinct
fingerprint, partitioned by the groupBy(fp) shuffle — the standard
keyed-state layout. For unbounded corpora, either enable the
RocksDB state store (spark.sql.streaming.stateStore.providerClass)
so state spills off-heap, or age out fingerprints with the
processing-time timeout below (`ttl_minutes`), trading exactness
for bounded state the way production streaming dedups do.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import (
    GroupState,
    GroupStateTimeout,
)

DOCS_SCHEMA = "doc_id long, text string"
OUT_SCHEMA = "fp string, doc_id long, is_first boolean"
STATE_SCHEMA = "keeper long"


def _dedup_update(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        keeper = int(state.get[0])
        seen = True
    else:
        keeper = None
        seen = False
    out_ids: list[int] = []
    out_first: list[bool] = []
    for pdf in pdfs:
        for doc_id in sorted(int(d) for d in pdf["doc_id"]):
            if not seen:
                keeper = doc_id
                seen = True
                out_first.append(True)
            else:
                out_first.append(False)
            out_ids.append(doc_id)
    state.update((keeper,))
    yield pd.DataFrame(
        {
            "fp": [key[0]] * len(out_ids),
            "doc_id": out_ids,
            "is_first": out_first,
        }
    )


def streaming_dedup(
    spark: SparkSession,
    docs_dir: str,
    prefix: int | None = 40,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """First-seen-wins streaming dedup over a documents directory
    (same fingerprint as the batch q15 operator). Returns the
    update-mode stream of (fp, doc_id, is_first) verdicts."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )
    src = F.col("text")
    if prefix:
        src = F.substring(src, 1, prefix)
    hashed = stream.select(
        F.md5(src.cast("binary")).alias("fp"), "doc_id"
    )
    return hashed.groupBy("fp").applyInPandasWithState(
        _dedup_update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_near_dup_probe(
    spark: SparkSession,
    docs_dir: str,
    corpus: DataFrame,
    n_hashes: int = 12,
    band_rows: int = 2,
    n: int = 3,
    threshold: float = 0.5,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of operators/dedup.incremental_near_dups
    (q88): new documents ARRIVING AS A STREAM are near-dup-checked
    against a STATIC corpus LSH index with stream-static joins —
    the continuous form of the monthly-snapshot dedup.

    Stateless by construction so it runs in append mode with no
    watermark: the stream side computes its MinHash signature
    IN-ROW (12 array_min folds over the materialized gram array —
    the one place the in-row form is the right call, because a
    streaming groupBy would make the probe a stateful aggregation;
    the gram array is its own projection so the tokenize+shingle
    pipeline still runs once per row), explodes into band rows,
    and inner-joins the static index + static gram table. Exact
    Jaccard verifies in-row on the joined gram arrays.

    Emits ONE ROW PER (pair, shared band) — a pair sharing b bands
    appears b times; downstream sinks dedup idempotently on
    (batch_doc, corpus_doc), the manifest-upsert discipline. The
    verified values match the batch operator exactly (tested).

    Returns the append-mode stream of
    (batch_doc, corpus_doc, band_idx, inter, jaccard)."""
    from ..operators.dedup import minhash_bands, with_gram_array

    n_bands = n_hashes // band_rows
    idx = minhash_bands(
        corpus, n_hashes, band_rows, "doc_id", "text"
    )
    corpus_grams = with_gram_array(corpus, "text", n).select(
        F.col("doc_id").alias("corpus_doc"),
        F.col("_g").alias("_gb"),
    )
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )
    sg = with_gram_array(stream, "text", n)

    def _salted(i: int):
        # NOTE: must be a ONE-parameter lambda — F.transform
        # introspects arity, and a second parameter (even a
        # defaulted `i=i`) makes it pass (element, index) and
        # bind the salt to the index Column.
        return lambda g: F.md5(F.concat(F.lit(f"{i}:"), g))

    sigs = sg.select(
        "doc_id",
        "_g",
        *[
            F.array_min(
                F.transform("_g", _salted(i))
            ).alias(f"_s{i}")
            for i in range(n_hashes)
        ],
    )
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                *[
                    F.col(f"_s{b * band_rows + j}")
                    for j in range(band_rows)
                ],
            )
            for b in range(n_bands)
        ]
    )
    banded = sigs.select(
        F.col("doc_id").alias("batch_doc"),
        "_g",
        F.posexplode(bands).alias("band_idx", "band_val"),
    )
    cand = banded.join(idx, ["band_idx", "band_val"]).select(
        "batch_doc",
        "_g",
        F.col("doc").alias("corpus_doc"),
        "band_idx",
    )
    withg = cand.join(corpus_grams, "corpus_doc")
    inter = F.size(F.array_intersect("_g", "_gb")).cast("long")
    return (
        withg.withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.col("inter")
            / (
                F.size("_g") + F.size("_gb") - F.col("inter")
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            "batch_doc", "corpus_doc", "band_idx",
            "inter", "jaccard",
        )
    )


def streaming_hll_registers(
    spark: SparkSession,
    docs_dir: str,
    schema: str = "grp string, k string",
    p: int = 6,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of sketches.hll_registers (q91): the
    distinct-keys-per-group HLL register table maintained
    continuously over an arriving (grp, k) stream. A non-windowed
    groupBy(grp, reg).max(rho) is a legal streaming aggregation in
    UPDATE mode with no watermark — max is monotone, so each
    micro-batch only ever raises registers, and state is bounded
    by groups x 2^p longs regardless of stream length (the same
    reason the batch sketch is one map-side-combined shuffle).

    The drained register table equals the batch sketch of all
    arrived rows exactly (max over any arrival split is the same
    max — the hll_merge property), so snapshot sketches and the
    live stream sketch can be merged interchangeably."""
    from ..operators.sketches import _hash48

    m = 1 << p
    width = 48 - p
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )
    h = _hash48(F.col("k"))
    w = F.shiftright(h, p)
    rho = F.when(
        w == 0, F.lit(width + 1).cast("long")
    ).otherwise(
        F.lit(width + 1) - F.length(F.bin(w)).cast("long")
    )
    return (
        stream.select(
            "grp", (h % m).alias("reg"), rho.alias("rho")
        )
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("rho"))
    )


def streaming_countmin(
    spark: SparkSession,
    keys_dir: str,
    schema: str = "key string",
    d: int = 4,
    w: int = 512,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of sketches.countmin_sketch (q97): the
    frequency sketch maintained continuously over an arriving key
    stream. A non-windowed groupBy(row, col).count() is a legal
    streaming aggregation with no watermark — counts only ever
    grow, and state is bounded by d*w longs regardless of stream
    length (the same bound that makes the batch sketch one
    map-side-combined shuffle).

    The drained cell table equals the batch sketch of all arrived
    rows exactly (sums are split-invariant under any arrival
    order — the countmin_merge property), so snapshot sketches
    and the live stream sketch merge interchangeably, and point
    queries through countmin_lookup keep the never-undercount
    guarantee at every micro-batch boundary."""
    from ..operators.sketches import _hash48

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(keys_dir)
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("long").alias("row"),
                    (
                        _hash48(
                            F.concat(F.lit(f"{i}:"), F.col("key"))
                        )
                        % w
                    ).alias("col"),
                )
                for i in range(d)
            ]
        )
    ).alias("p")
    return (
        stream.select(pairs)
        .select("p.row", "p.col")
        .groupBy("row", "col")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def streaming_binned_hist(
    spark: SparkSession,
    values_dir: str,
    value_col: str = "v",
    schema: str = "v long",
    bin_shift: int = 4,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of sketches.bin_hist (the q105 quantile
    sketch's state): the binned value histogram maintained
    continuously over an arriving value stream. A non-windowed
    groupBy(bin).count() is a legal streaming aggregation with no
    watermark — counts only grow, and state is bounded by
    range/2^bin_shift rows regardless of stream length (the same
    bound that makes the batch sketch one map-side-combined
    shuffle).

    The drained bin table equals the batch histogram of all
    arrived rows exactly (sums are split-invariant), so it feeds
    sketches.quantiles_from_bins directly: certified [lo, hi]
    percentile brackets over the live stream at every micro-batch
    boundary, mergeable with snapshot histograms by summation."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(values_dir)
    )
    return (
        stream.select(
            F.shiftright(F.col(value_col).cast("long"), bin_shift)
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("_c"))
    )


def _kmv_update_factory(k: int):
    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import hashlib

        cur = list(state.get[0]) if state.exists else []
        s = set(int(h) for h in cur)
        for pdf in pdfs:
            for v in pdf["k"]:
                h = int(
                    hashlib.md5(str(v).encode()).hexdigest()[:12],
                    16,
                )
                s.add(h)
        best = sorted(s)[:k]
        state.update((best,))
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(best),
                "rank": list(range(1, len(best) + 1)),
                "h": best,
            }
        )

    return update


def streaming_kmv(
    spark: SparkSession,
    keys_dir: str,
    k: int = 64,
    schema: str = "grp string, k string",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of sketches.kmv_sketch (q110), completing
    the streaming side of the mergeable-sketch family (HLL,
    count-min, quantile histogram, now KMV): the k smallest
    distinct key hashes per group maintained continuously via
    applyInPandasWithState (min-k has no built-in streaming
    aggregate). State is bounded at k longs per group, and min-k
    is split-invariant (dropping anything above the current kth is
    safe once the state holds k), so the drained sketch equals the
    batch kmv_sketch of all arrived rows exactly — across any
    arrival split and across checkpoint restarts (tested). The
    per-batch output re-emits the group's full (rank, h) sketch,
    the overwrite-sink discipline.

    The md5-prefix hash is computed in pandas with hashlib —
    byte-identical to the Spark/DuckDB md5 of the same string."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(keys_dir)
    )
    return stream.groupBy("grp").applyInPandasWithState(
        _kmv_update_factory(k),
        "grp string, rank long, h long",
        "hashes array<long>",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def streaming_hour_counts(
    spark: SparkSession,
    events_dir: str,
    schema: str = "event_type string, ts timestamp",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of events.hour_counts (the q117 spike
    detector's state): per-(type, hour) counts maintained
    continuously — a non-windowed groupBy count, no watermark
    needed, state bounded by types x active hours.  The drained
    table equals the batch hour_counts of all arrived rows exactly
    (sums are split-invariant), so it feeds
    events.spikes_from_counts for live anomaly flags at every
    micro-batch boundary."""
    from ..operators.events import hour_counts

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    return hour_counts(stream)
