"""Stateful streaming Viterbi map matching: trace steps arrive as
a stream (possibly out of order, possibly split across
micro-batches and restarts) and each trace's minimum-cost segment
path is emitted the moment its last step's DP completes — the
online twin of operators/linecover.viterbi_map_match.

Two stages:

1. stateless candidate extraction — each arriving point joins the
   broadcast snap_cell_index (operators/linecover) on its in-row
   cell and reduces the bounded candidate-segment list to its
   top-k (array_sort on (dist2, way_id, seg_idx) structs, the same
   total order as the batch rank); scoring is the pinned IEEE
   double op sequence, so candidate sets and distances are
   bit-identical to the batch operator.  Points with no candidate
   within one cell side emit nothing — a dead step therefore never
   completes its trace, exactly the batch "dead step kills the
   trace" rule.

2. keyed DP — groupBy(trace_id).applyInPandasWithState buffers
   out-of-order steps and advances the Viterbi frontier over every
   contiguous prefix; state is (next_step, dp, buffer) with the dp
   and buffer JSON-serialized (json round-trips doubles via repr,
   so restart resumes with bit-identical costs).  When step
   n_steps-1 folds in, the (total_cost, path) argmin — ties broken
   by the path string, as in batch — is emitted in append mode and
   the state is cleared.

Scale: state per live trace is O(k) floats + the out-of-order
buffer; the groupBy shuffle partitions traces across executors —
the standard keyed-state layout (RocksDB state store for unbounded
trace churn)."""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import (
    GroupState,
    GroupStateTimeout,
)

PTS_SCHEMA = "trace_id long, step long, lat_i long, lon_i long"
OUT_SCHEMA = "trace_id long, total_cost double, path string"
STATE_SCHEMA = "next_step integer, dp string, buf string"


def _candidates_stream(
    spark: SparkSession,
    points_dir: str,
    cell_index: DataFrame,
    shift: int,
    k: int,
    max_files_per_trigger: int,
) -> DataFrame:
    from ..operators.linecover import point_cell_col

    s = 1 << shift
    stream = (
        spark.readStream.schema(PTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(points_dir)
    )
    pts = stream.select(
        "trace_id",
        "step",
        F.col("lon_i").alias("px"),
        F.col("lat_i").alias("py"),
        point_cell_col("lat_i", "lon_i", shift).alias("cell"),
    )
    joined = pts.join(F.broadcast(cell_index), "cell")

    def score(e):
        d = lambda c: c.cast("double")  # noqa: E731
        apx = d(F.col("px") - e["ax"])
        apy = d(F.col("py") - e["ay"])
        abx = d(e["bx"] - e["ax"])
        aby = d(e["by"] - e["ay"])
        bpx = d(F.col("px") - e["bx"])
        bpy = d(F.col("py") - e["by"])
        dot = apx * abx + apy * aby
        len2 = abx * abx + aby * aby
        ap2 = apx * apx + apy * apy
        bp2 = bpx * bpx + bpy * bpy
        return (
            F.when((dot <= 0) | (len2 == 0), ap2)
            .when(dot >= len2, bp2)
            .otherwise(ap2 - (dot / len2) * dot)
        )

    scored = F.transform(
        F.col("segs"),
        lambda e: F.struct(
            score(e).alias("dist2"),
            e["way_id"].alias("way_id"),
            e["seg_idx"].alias("seg_idx"),
        ),
    )
    topk = F.slice(
        F.array_sort(
            F.filter(
                scored, lambda c: c["dist2"] <= F.lit(float(s) * s)
            )
        ),
        1,
        k,
    )
    return joined.select(
        "trace_id", "step", topk.alias("cands")
    ).where(F.size("cands") > 0)


def _make_dp_update(n_steps: int, penalty: float):
    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            next_step, dp_j, buf_j = state.get
            if next_step >= n_steps:  # already emitted
                return
            dp = json.loads(dp_j)
            buf = {int(s): c for s, c in json.loads(buf_j).items()}
        else:
            next_step, dp, buf = 0, [], {}
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                cands = [
                    [float(c["dist2"]), int(c["way_id"]),
                     int(c["seg_idx"])]
                    for c in row["cands"]
                ]
                buf[int(row["step"])] = cands
        done = None
        while next_step in buf and next_step < n_steps:
            cands = buf.pop(next_step)
            if next_step == 0:
                dp = [
                    [d2, w, s, f"{w}-{s}"] for d2, w, s in cands
                ]
            else:
                new = []
                for d2, w, s in cands:
                    best = None
                    for cost, pw, _ps, path in dp:
                        trans = 0.0 if w == pw else penalty
                        nc = (cost + trans) + d2
                        np_ = f"{path}>{w}-{s}"
                        if best is None or (nc, np_) < best:
                            best = (nc, np_)
                    new.append([best[0], w, s, best[1]])
                dp = new
            next_step += 1
        if next_step >= n_steps and dp:
            done = min((cost, path) for cost, _w, _s, path in dp)
            state.update((n_steps, "[]", "{}"))
            yield pd.DataFrame(
                {
                    "trace_id": [key[0]],
                    "total_cost": [done[0]],
                    "path": [done[1]],
                }
            )
        else:
            state.update(
                (
                    next_step,
                    json.dumps(dp),
                    json.dumps({str(s): c for s, c in buf.items()}),
                )
            )

    return update


def streaming_viterbi(
    spark: SparkSession,
    points_dir: str,
    cell_index: DataFrame,
    n_steps: int,
    k: int = 3,
    shift: int = 20,
    switch_penalty: float = float(1 << 38),
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of viterbi_map_match — emits (trace_id,
    total_cost, path) once per completed trace, equal to the batch
    result on the same points (tested across batch splits and a
    restart)."""
    cands = _candidates_stream(
        spark, points_dir, cell_index, shift, k, max_files_per_trigger
    )
    return cands.groupBy("trace_id").applyInPandasWithState(
        _make_dp_update(n_steps, float(switch_penalty)),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
