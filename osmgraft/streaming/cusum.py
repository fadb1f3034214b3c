"""Streaming CUSUM mean-shift monitor — the online twin of
operators/events.cusum_mean_shift.

The batch operator derives the baseline mean from the whole series
(scaled by the series length so the mean never floats); a STREAM
cannot know its own future total, so the streaming form is the
classic known-target CUSUM: the caller supplies the reference mean
as an exact rational target_num/target_den (e.g. last month's
per-day rate), and the statistic is the literal recurrence

    S_t = max(0, S_{t-1} + x_t*den - num - allowance*den)

carried as ONE long per key in applyInPandasWithState — state size
is O(distinct keys), independent of stream length. Every input row
emits its (cusum_scaled, is_alarm) verdict.

Ordering contract: per key, rows must arrive in nondecreasing
`day` order across micro-batches (the natural shape for a daily
rollup feed; within a batch the operator sorts). An out-of-order
day would need the retraction machinery of full event-time
processing — out of scope for a monitoring statistic whose input
is itself a finalized daily aggregate.

tests/test_streaming_cusum.py proves batch equivalence against the
recurrence and state survival across a checkpointed restart.
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

COUNTS_SCHEMA = "event_type string, day long, n_events long"
OUT_SCHEMA = (
    "event_type string, day long, n_events long, "
    "cusum_scaled long, is_alarm boolean"
)
STATE_SCHEMA = "s long"


def make_update(
    target_num: int,
    target_den: int,
    allowance: int,
    threshold: int,
):
    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        s = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdfs)).sort_values("day")
        out_s = []
        out_alarm = []
        for x in rows["n_events"]:
            z = (
                int(x) * target_den
                - target_num
                - allowance * target_den
            )
            s = max(0, s + z)
            out_s.append(s)
            out_alarm.append(s > threshold * target_den)
        state.update((s,))
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "day": rows["day"].to_numpy(),
                "n_events": rows["n_events"].to_numpy(),
                "cusum_scaled": out_s,
                "is_alarm": out_alarm,
            }
        )

    return update


def cusum_monitor(
    spark: SparkSession,
    counts_dir: str,
    target_num: int,
    target_den: int = 1,
    allowance: int = 1,
    threshold: int = 5,
) -> DataFrame:
    """Streaming per-key CUSUM against the rational target mean
    target_num/target_den; attach a writeStream (update mode)."""
    stream = (
        spark.readStream.schema(COUNTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .option("recursiveFileLookup", "true")
        .parquet(counts_dir)
    )
    return stream.groupBy("event_type").applyInPandasWithState(
        make_update(target_num, target_den, allowance, threshold),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
