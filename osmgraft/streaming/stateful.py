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


# ----------------------------------------------------------------
# streaming OD flow deltas (the streaming twin of events.od_matrix)
# ----------------------------------------------------------------

OD_EVENTS_SCHEMA = (
    "event_id long, user_id long, ts timestamp, region string"
)
OD_OUT_SCHEMA = "from_region string, to_region string, n_trips long"
OD_STATE_SCHEMA = "last_ts timestamp, last_eid long, last_region string"


def _od_update(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_region = None
    if state.exists:
        _, _, last_region = state.get
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(
        ["ts", "event_id"], kind="mergesort", ignore_index=True
    )
    regions = [
        "OUT" if r is None or (isinstance(r, float) and pd.isna(r))
        else r
        for r in pdf["region"]
    ]
    seq = ([last_region] if last_region is not None else []) + regions
    counts: dict[tuple, int] = {}
    for a, b in zip(seq, seq[1:]):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    if regions:
        tail = pdf.iloc[len(pdf) - 1]
        state.update(
            (tail["ts"], int(tail["event_id"]), regions[-1])
        )
    if counts:
        yield pd.DataFrame(
            [
                {"from_region": a, "to_region": b, "n_trips": n}
                for (a, b), n in counts.items()
            ]
        )


def od_flow_stream(located_events: DataFrame) -> DataFrame:
    """Streaming OD flow DELTAS: per micro-batch, the increment of
    (from_region, to_region) trip counts per user, with the last
    seen region carried as keyed state so trips spanning batch
    boundaries are counted exactly once. Summing the emitted
    deltas over any prefix of batches equals events.od_matrix on
    the rows arrived so far (assuming per-user in-order arrival
    across batches; within a batch rows are re-sorted by
    (ts, event_id)). State is one tiny tuple per user —
    O(#users), independent of stream length."""
    return located_events.groupBy("user_id").applyInPandasWithState(
        _od_update,
        OD_OUT_SCHEMA,
        OD_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
