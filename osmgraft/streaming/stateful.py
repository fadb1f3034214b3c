"""Custom stateful streaming operator via applyInPandasWithState:
per-cell cumulative activity with first/last-seen tracking — state
the built-in windowed aggregates can't express (it never closes: a
running lifetime profile per tile cell, emitted incrementally).

This is the harness the task spec names for custom stateful
operators; the state value is a tiny fixed-size tuple per cell, so
state size is O(distinct cells) regardless of stream length.
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

EVENTS_SCHEMA = "event_id long, ts timestamp, cell long, value double"

OUT_SCHEMA = (
    "cell long, n_events long, sum_value double, "
    "first_seen timestamp, last_seen timestamp"
)
STATE_SCHEMA = (
    "n_events long, sum_value double, first_seen timestamp, "
    "last_seen timestamp"
)


def _update(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n = 0
    s = 0.0
    first = None
    last = None
    if state.exists:
        n, s, first, last = state.get
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        lo = pdf["ts"].min()
        hi = pdf["ts"].max()
        first = lo if first is None or lo < first else first
        last = hi if last is None or hi > last else last
    state.update((n, s, first, last))
    yield pd.DataFrame(
        {
            "cell": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "first_seen": [first],
            "last_seen": [last],
        }
    )


def cell_lifetime_stats(
    spark: SparkSession, events_dir: str
) -> DataFrame:
    """Streaming per-cell lifetime profile: every micro-batch emits
    the updated cumulative stats for the cells it touched."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    return stream.groupBy("cell").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
