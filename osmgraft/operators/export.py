"""Training-data export: deterministic corpus shuffle + sharding.

The last step of a webtext pipeline before the trainer reads it:
give every document a pseudo-random but REPRODUCIBLE position in a
fixed number of shards. The permutation is a keyed hash, not a
`rand()` — so it is invariant under partitioning, retries, and
resume (the same discipline as text.stratified_sample), and any
two engines agree on it bit-for-bit.

Scale shape: shard membership is a pure hash of the key (map-only,
no global pass); the within-shard position is a rank over the same
hash, one keyed shuffle on `shard` — each shard sorts
independently, so parallelism equals n_shards and there is no
global sort / SinglePartition funnel. Size n_shards to the
trainer's reader parallelism (thousands at 100 TB), not to the
cluster."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def shard_plan(
    df: DataFrame,
    n_shards: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shuf",
) -> DataFrame:
    """(doc_id, shard, pos, n_tokens): shard = md5-prefix of the
    salted key mod n_shards; pos = 1-based rank of the hash within
    the shard (md5 strings are unique per key, doc_id breaks the
    impossible tie deterministically anyway). Reordering epochs =
    changing `salt` — a free re-shuffle, no data movement until
    the export itself."""
    hx = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))
    )
    s = df.select(
        F.col(key_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " "))
        .cast("long")
        .alias("n_tokens"),
        hx.alias("_hx"),
    ).withColumn(
        "shard",
        (
            F.conv(F.substring("_hx", 1, 12), 16, 10).cast("long")
            % n_shards
        ).cast("long"),
    )
    w = Window.partitionBy("shard").orderBy("_hx", "doc_id")
    return s.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
        "n_tokens",
    )


def shard_summary(
    df: DataFrame,
    n_shards: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shuf",
) -> DataFrame:
    """Per-shard balance audit: (shard, n_docs, n_tokens_total).
    Hash sharding balances docs to ~N/n_shards without any
    planning pass; the token skew this reports is what a
    token-aware packer (q63) would smooth."""
    return (
        shard_plan(df, n_shards, key_col, text_col, salt)
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_total"),
        )
    )


def weighted_systematic_sample(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    target_n: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement by
    SYSTEMATIC selection over the weight prefix sum — the exact,
    engine-agnostic replacement for rand()-based weighted samplers
    (probability proportional to size, e.g. pick documents
    proportionally to token count for a mixing plan).

    Rule: with W = sum(w), stride = W div target_n, row i covering
    the half-open weight interval (cum_i - w_i, cum_i] is selected
    iff the interval contains a multiple of stride:

        hits_i = cum_i div stride - (cum_i - w_i) div stride

    Pure integer arithmetic over a total order -> reproducible
    across partitioning, retries, and engines (the DuckDB oracle
    runs the identical formula), which rand()-based samplers are
    not. Inclusion probability is min(1, w/stride); rows with
    w >= stride are ALWAYS selected (the PPS certainty region) and
    `hits` reports their multiplicity for weighted estimators.
    Selected count is within 1 of W div stride >= target_n.

    Plan: one agg for W (a driver scalar, manifest-style), then
    indexing.with_running_total's three-pass prefix sum (range
    partition on the order, per-partition offsets, Arrow cumsum) —
    no SinglePartition window, no corpus sort funnel."""
    from .indexing import with_running_total

    if target_n <= 0:
        raise ValueError("target_n must be positive")
    w_total = df.agg(
        F.sum(F.col(weight_col).cast("long"))
    ).collect()[0][0]
    if w_total is None or w_total < target_n:
        raise ValueError("total weight must be >= target_n")
    stride = w_total // target_n
    cum = with_running_total(
        df, order_cols, weight_col, out_col="cum_w",
        num_partitions=num_partitions,
    )
    hits = F.expr(f"cum_w div {stride}") - F.expr(
        f"(cum_w - {weight_col}) div {stride}"
    )
    return cum.withColumn("hits", hits.cast("long")).where(
        F.col("hits") >= 1
    )


def spatial_shard_plan(
    pts: DataFrame,
    n_shards: int = 8,
    shift: int = 20,
    order: int = 12,
) -> DataFrame:
    """Spatially-contiguous training shards: documents are ranked
    along the Hilbert curve (geo/hilbert.py — every curve step is
    between adjacent cells) and cut into n_shards equal-size
    ranges, so each shard is a compact geographic region with
    |size difference| <= 1 — the geo-locality counterpart of
    shard_plan's hash shuffle (a geo-trained model reads spatial
    neighborhoods together; a hash shard scatters them).

    shard = (pos * n_shards) div N over the dense curve rank,
    computed with indexing.with_global_index's three-pass range
    partition — no global sort funnel, no SinglePartition.
    Returns (doc_id, hd, shard)."""
    from ..geo.cells import LAT_OFFSET, LON_OFFSET
    from ..geo.hilbert import with_hilbert
    from .indexing import with_global_index

    n = pts.count()
    cells = pts.select(
        "doc_id",
        F.shiftright(F.col("lon_i") + F.lit(LON_OFFSET), shift)
        .alias("_cu"),
        F.shiftright(F.col("lat_i") + F.lit(LAT_OFFSET), shift)
        .alias("_cv"),
    )
    hd = with_hilbert(cells, "_cu", "_cv", order=order).drop(
        "_cu", "_cv"
    )
    ranked = with_global_index(
        hd, ["hd", "doc_id"], index_col="pos", start=0
    )
    return ranked.select(
        "doc_id",
        "hd",
        F.expr(f"(pos * {n_shards}) div {n}").alias("shard"),
    )


def rendezvous_shards(
    docs: DataFrame,
    n_shards: int = 16,
    drop_shard: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Highest-random-weight (rendezvous) shard assignment — the
    consistent-placement scheme whose guarantee matters at fleet
    scale: when a shard leaves, ONLY the rows that lived on it move
    (1/n of the data), versus `id % n` where a topology change
    reshuffles nearly everything. Weight = md5(shard || ':' || id),
    assignment = the weight-minimizing shard (ties impossible in
    practice, broken by shard id in the struct order anyway).

    Entirely map-side: the shard list is a literal array and the
    argmin is an in-row array_min over transform — zero shuffles,
    zero joins; the plan is a projection over the scan, which is
    exactly what lets a 10^12-row placement pass run at input
    bandwidth.

    With drop_shard set, also emits the assignment over the
    surviving shards and a `moved` flag; tests assert moved ==
    (shard = drop_shard) — the minimal-movement property, row for
    row.
    """

    def argmin_shard(shard_ids: list[int]):
        arr = F.array(
            *[F.lit(s).cast("long") for s in shard_ids]
        )
        return F.array_min(
            F.transform(
                arr,
                lambda s: F.struct(
                    F.md5(
                        F.concat_ws(
                            ":",
                            s.cast("string"),
                            F.col(id_col).cast("string"),
                        )
                    ).alias("h"),
                    s.alias("s"),
                ),
            )
        )["s"]

    all_ids = list(range(n_shards))
    out = docs.select(
        F.col(id_col),
        argmin_shard(all_ids).cast("long").alias("shard"),
    )
    if drop_shard is None:
        return out
    survivors = [s for s in all_ids if s != drop_shard]
    return docs.select(
        F.col(id_col),
        argmin_shard(all_ids).cast("long").alias("shard"),
        argmin_shard(survivors).cast("long").alias("shard_after"),
    ).withColumn(
        "moved", F.col("shard") != F.col("shard_after")
    )


def apportion_budget(
    strata: DataFrame,
    budget: int,
    key_col: str = "stratum",
    n_col: str = "n",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer
    budget across strata proportional to their sizes — the exact
    quota planner behind stratified sampling and shard sizing
    (public apportionment method; the one that never strands more
    than one unit per stratum and sums EXACTLY to the budget,
    unlike independent rounding). Ties in the remainder rank break
    toward the smaller stratum key, deterministic.

        base_s = B * n_s div N;  leftover = B - sum(base)
        top-`leftover` strata by (remainder DESC, key ASC) get +1

    Shape: one 1-row total broadcast back onto the STRATA table
    (bounded — strata are groups, not rows), one rank window over
    that same bounded table. Output (stratum, n, quota) with
    sum(quota) == budget by construction."""
    from pyspark.sql import Window

    b = int(budget)
    base = strata.select(
        F.col(key_col).alias("stratum"),
        F.col(n_col).cast("long").alias("n"),
    )
    tot = base.agg(F.sum("n").cast("long").alias("ntot"))
    # loud failure on ntot == 0 (all-zero strata): Spark's
    # non-ANSI div would otherwise yield NULL quotas SILENTLY
    # where DuckDB raises — same convention as winsorized_stats /
    # category_bitmaps. An empty strata table stays empty-in/
    # empty-out (the join produces no rows to divide).
    guarded = F.when(
        F.col("ntot") > 0, F.col("ntot")
    ).otherwise(
        F.raise_error(
            F.lit(
                "apportion_budget: total stratum size is 0 "
                "(all strata have n = 0) — quotas undefined"
            )
        )
    )
    quotas = (
        base.join(F.broadcast(tot))
        .withColumn("ntot", guarded)
        .select(
            "stratum",
            "n",
            F.expr(f"({b} * n) div ntot").cast("long").alias("q0"),
            F.expr(f"({b} * n) % ntot").cast("long").alias("rem"),
        )
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("stratum"))
    leftover = quotas.join(
        F.broadcast(
            quotas.agg(
                (F.lit(b) - F.sum("q0")).cast("long").alias("L")
            )
        )
    )
    return (
        leftover.withColumn("_rk", F.row_number().over(w))
        .select(
            "stratum",
            "n",
            (
                F.col("q0")
                + (F.col("_rk") <= F.col("L")).cast("long")
            )
            .cast("long")
            .alias("quota"),
        )
    )
