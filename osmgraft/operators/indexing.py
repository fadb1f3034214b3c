"""Distributed dense global index (the scale-safe replacement for
a single-partition `row_number() OVER (ORDER BY ...)`).

The geobase build (and any .ogb/.o5m single-stream sink) needs a
total ordering with a dense 1-based index. A global window forces
every row through ONE task; this utility builds the same index in
two distributed passes:

  1. repartitionByRange on the order columns + sort within
     partitions (the total order, distributed), with the partition
     id BAKED INTO THE DATA at checkpoint time;
  2. count rows per stored pid (tiny collect: one long per
     partition — a manifest, not data);
  3. mapInPandas adds offset[stored pid] + local position.

The pid travels as a column rather than TaskContext.partitionId():
the task-context index is the CONSUMING stage's partition number,
which gets renumbered when this result is read under a union
(branch partitions concatenate, so the second branch's tasks see
shifted ids and every offset lookup would silently miss — caught
round 5 by --object-type-offset step mode, whose pseudo-nodes are
consumed exactly that way).

The order columns must form a TOTAL order (include a tiebreaker):
then the index is deterministic regardless of where the range
sampler places partition boundaries."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def with_running_total(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed prefix sum: the INCLUSIVE running total of
    `value_col` over the total order `order_cols` — the scale-safe
    replacement for `SUM(v) OVER (ORDER BY ...)`, whose unbounded
    frame funnels every row through one task. Same three-pass shape
    as with_global_index: range-partition on the order, collect one
    partial sum per partition (a manifest, not data), then a
    mapInPandas cumsum seeded with each partition's offset.

    Feeds sequence packing (q63): which fixed-token training window
    each document starts in is pure arithmetic on this column."""
    parts = (
        df.repartitionByRange(
            *([num_partitions] if num_partitions else []),
            *[F.col(c) for c in order_cols],
        )
        .sortWithinPartitions(*order_cols)
        # pid baked into the data BEFORE the checkpoint pins it:
        # the count pass (first action) materializes branch-local
        # ids; TaskContext would lie under union consumption
        .withColumn("_gpid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sums = {
        r._pid: r._s
        for r in parts.groupBy(
            F.col("_gpid").alias("_pid")
        )
        .agg(F.sum(value_col).alias("_s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [f for f in parts.schema.fields if f.name != "_gpid"]
        + [StructField(out_col, LongType())]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = None
        for pdf in it:
            if base is None:
                base = offsets.get(
                    int(pdf["_gpid"].iloc[0]) if len(pdf) else -1, 0
                )
            pdf = pdf.drop(columns=["_gpid"])
            cs = pdf[value_col].cumsum() + base
            pdf[out_col] = cs
            if len(cs):
                base = int(cs.iloc[-1])
            yield pdf

    return parts.mapInPandas(gen, schema)


def with_global_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = "idx",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    parts = (
        df.repartitionByRange(
            *( [num_partitions] if num_partitions else [] ),
            *[F.col(c) for c in order_cols],
        )
        .sortWithinPartitions(*order_cols)
        # pin the partitioning AND bake the pid into the data: the
        # count pass (first action) materializes the checkpoint
        # with branch-local partition ids; TaskContext.partitionId
        # would be the CONSUMING stage's index, which unions
        # renumber (see module docstring)
        .withColumn("_gpid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r._pid: r._n
        for r in parts.groupBy(
            F.col("_gpid").alias("_pid")
        )
        .agg(F.count("*").alias("_n"))
        .collect()
    }
    # offsets keyed by stored pid from the count pass — partitions
    # absent from `counts` are empty and never consult an offset
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [f for f in parts.schema.fields if f.name != "_gpid"]
        + [StructField(index_col, LongType())]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = None
        for pdf in it:
            if pos is None:
                pos = offsets.get(
                    int(pdf["_gpid"].iloc[0]) if len(pdf) else -1, 0
                )
            pdf = pdf.drop(columns=["_gpid"])
            pdf[index_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    return parts.mapInPandas(gen, schema)


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    ps: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """EXACT order statistics at corpus scale — the honest version
    of approx_percentile (whose sketch-merge result depends on
    partition order, so it can never be oracle-checked).

    Two-phase: (1) one map-side-combined groupBy(value) collapses
    the corpus into a histogram bounded by the number of DISTINCT
    values — for integer token/length columns that is thousands of
    rows regardless of corpus size; (2) a running cumulative over
    that tiny histogram (the SinglePartition exchange here carries
    the histogram, not the corpus — audited in PLANS.md) picks the
    classic ceil-rank statistic with pure integer arithmetic:

        p-th percentile = min value whose cumulative count
                          >= ceil(p * N / 100)  =  (p*N + 99) div 100

    Returns ONE row: (n_rows, p50, p90, ... per requested p)."""
    from pyspark.sql import Window

    v = F.col(value_col)
    hist = df.groupBy(v.alias("_v")).agg(
        F.count("*").cast("long").alias("_c")
    )
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    tot = df.agg(F.count("*").cast("long").alias("n_rows"))
    joined = cum.crossJoin(F.broadcast(tot))
    return joined.groupBy("n_rows").agg(
        *[
            F.min(
                F.when(
                    F.col("_cum")
                    >= F.expr(f"({p} * n_rows + 99) div 100"),
                    F.col("_v"),
                )
            )
            .cast("long")
            .alias(f"p{p}")
            for p in ps
        ]
    )


def key_skew_report(
    df: DataFrame, key_cols: list, out_rows: str = "n_rows"
) -> DataFrame:
    """Shuffle-skew diagnostics: the log2 frequency spectrum of a
    prospective join/groupBy key — for each bucket b =
    floor(log2(key count)), how many keys live there, how many
    rows they carry, and the single hottest key as the named
    suspect.  The report every partitioning decision in this
    engine starts from (salting, AQE skew thresholds, broadcast
    choices) made a first-class operator instead of an ad-hoc
    notebook query.

    All integer: the bucket is length(bin(n)) - 1 — floor(log2)
    computed on the binary STRING, no float log anywhere, so the
    report is engine-reproducible (the DuckDB twin uses
    printf('%b')).

    Shape: one map-side-combined groupBy on the key, then a
    groupBy on the ~64 possible buckets with a max_by argmax —
    output bounded by 64 rows whatever the corpus.
    """
    counts = df.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("_n")
    )
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return (
        counts.select(
            key_str.alias("_key"),
            "_n",
            (F.length(F.bin(F.col("_n"))) - 1)
            .cast("long")
            .alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("_n").cast("long").alias(out_rows),
            F.max("_n").cast("long").alias("max_count"),
            F.max_by(F.col("_key"), F.struct("_n", "_key")).alias(
                "hottest_key"
            ),
        )
    )


def gini_parts(
    values: DataFrame, v_col: str = "v", id_col: str = "id"
) -> DataFrame:
    """Gini coefficient of a non-negative value distribution as
    its exact integer parts (the standard sorted-rank closed
    form, public):

        G = (2 * sum_i i * x_(i) - (n + 1) * sum(x)) / (n * sum(x))

    with x_(i) the i-th smallest value under the deterministic
    (value, id) order. Output one row (n, total, gini_num,
    gini_den); the dimensionless coefficient is the caller's
    division. Companion diagnostic to the log2 key-skew spectrum
    (q203): skew says WHERE the mass piles up, Gini scores HOW
    unequal the whole layout is — the single number a partitioning
    reviewer tracks across snapshots.

    Shape: one rank window over the INPUT table — meant for
    bounded group/cell rollups (the q232 use feeds grid cells),
    where the funnel is histogram-sized, never corpus-sized —
    then a 1-row final aggregate."""
    from pyspark.sql import Window

    w = Window.orderBy(v_col, id_col)
    ranked = values.select(
        F.col(v_col).cast("long").alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
        (
            F.lit(2) * F.sum(F.col("i") * F.col("x"))
            - (F.count("*") + 1) * F.sum("x")
        )
        .cast("long")
        .alias("gini_num"),
        (F.count("*") * F.sum("x")).cast("long").alias("gini_den"),
    )
