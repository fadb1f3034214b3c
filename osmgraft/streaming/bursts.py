"""Streaming retry-burst collapse — the online twin of
operators/events.collapse_bursts.

The batch operator sees the whole series, so every burst is closed
by construction; a stream only ever knows a burst is over when the
NEXT same-key event arrives more than the window after it. The
streaming form therefore emits exactly the CLOSED bursts: when an
incoming event starts a new run, the previous run's (first_us,
last_us, n_raw) row is emitted; the still-open run rides in state —
one (burst_idx, first_us, last_us, n_raw) tuple per (user_id,
event_type), O(distinct keys) regardless of stream length. Batch
equivalence: the emitted rows are precisely collapse_bursts minus
each key's final (still-open) burst — proved in
tests/test_streaming_bursts.py.

Ordering contract: per key, events must arrive in nondecreasing us
order across micro-batches (within a batch the operator sorts) —
same contract, same reason as cusum.py: a late event would need
full event-time retraction machinery, out of scope for an
at-least-once producer-retry cleaner.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import (
    GroupState,
    GroupStateTimeout,
)

EVENTS_SCHEMA = (
    "user_id long, event_type string, event_id long, us long"
)
OUT_SCHEMA = (
    "user_id long, event_type string, burst long, "
    "first_us long, last_us long, n_raw long"
)
STATE_SCHEMA = "burst long, first_us long, last_us long, n_raw long"


def make_update(window_us: int):
    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            burst, first_us, last_us, n_raw = state.get
        else:
            burst, first_us, last_us, n_raw = 0, None, None, 0
        rows = pd.concat(list(pdfs)).sort_values(["us", "event_id"])
        closed = []
        for us in rows["us"]:
            us = int(us)
            if first_us is None:
                burst, first_us, last_us, n_raw = 1, us, us, 1
            elif us - last_us > window_us:
                closed.append((burst, first_us, last_us, n_raw))
                burst, first_us, last_us, n_raw = (
                    burst + 1, us, us, 1,
                )
            else:
                last_us, n_raw = us, n_raw + 1
        state.update((burst, first_us, last_us, n_raw))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "event_type": key[1],
                    "burst": [c[0] for c in closed],
                    "first_us": [c[1] for c in closed],
                    "last_us": [c[2] for c in closed],
                    "n_raw": [c[3] for c in closed],
                }
            )

    return update


def burst_monitor(
    spark: SparkSession,
    events_dir: str,
    window_s: int = 60,
) -> DataFrame:
    """Streaming closed-burst emitter over a (user_id, event_type,
    event_id, us) parquet feed; attach a writeStream (update
    mode)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        make_update(window_s * 1_000_000),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
