"""Host link-graph analytics — crawl prioritization over the web
corpus. The per-tile keep-rate map (q64) tells the crawler WHERE
good documents cluster spatially; host PageRank tells it WHICH
hosts to fetch next. Together they are the feedback half of a
crawl loop.

Determinism by construction: ranks are BIGINTs in fixed-point
(`scale` = 1.0 of initial mass) and every update uses only long
add / multiply / integer-divide. Long sums commute exactly, so the
result is bit-identical regardless of partitioning, aggregation
order, or engine — the same trick as the 1e-7 fixed-point
coordinates (geo/fixedpoint.py, reference osmconvert.c lat/lon
model). A float PageRank could differ in the last ulps between
runs and could never be hash-compared against an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank over a distinct (src, dst) host edge list, `iters`
    synchronous iterations, damping = damping_num/damping_den
    (exact rational, applied in integer arithmetic).

    Update per host h:
        rank'(h) = (1-d)*scale  +  d * sum_{e: src->h} rank(src) div out_deg(src)

    computed as  base + (damping_num * s) div damping_den  with
    base = scale*(den-num) div den — longs end to end. Mass lost to
    integer truncation and dangling hosts is NOT redistributed
    (the simplified public formulation); ranking order is
    unaffected for crawl-prioritization use.

    Scale plan: per iteration, one shuffle of the edge list keyed
    on dst with map-side partial SUM, plus a join of edges against
    the ranks table. Ranks carry ONE row per host (millions at web
    scale vs billions of edges) — the small side; AQE broadcasts it
    when it fits. The out-degree join is fused into the same edge
    shuffle. The loop is a driver-side for over `iters` lazy
    DataFrames: nothing materializes until the caller acts, and
    iters is small (3-10) so plan depth stays modest.
    """
    src_h = edges.select(F.col("src").alias("host"))
    dst_h = edges.select(F.col("dst").alias("host"))
    hosts = src_h.union(dst_h).distinct()
    deg = edges.groupBy("src").agg(
        F.count("*").cast("long").alias("out_deg")
    )
    edges_deg = edges.join(deg, "src")
    base = scale * (damping_den - damping_num) // damping_den
    ranks = hosts.select(
        "host", F.lit(scale).cast("long").alias("rank")
    )
    for _ in range(iters):
        contribs = edges_deg.join(
            ranks, edges_deg["src"] == ranks["host"]
        ).select(
            F.col("dst").alias("host"),
            F.expr("rank div out_deg").alias("c"),
        )
        sums = contribs.groupBy("host").agg(
            F.sum("c").alias("s")
        )
        ranks = hosts.join(sums, "host", "left").select(
            "host",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * coalesce(s, 0L))"
                    f" div {damping_den}"
                )
            )
            .cast("long")
            .alias("rank"),
        )
    return ranks
