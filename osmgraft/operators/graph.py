"""OSM object-graph operators: way->node ref resolution, clipping
decisions, complete-ways pull-back, broken-ref cleanup, all-to-nodes
geometry aggregation, and the relation transitive closure.

Reference semantics (SURVEY.md §2.3/§2.5):

  J1  way->nodes ref resolution       osmconvert.c:6759-6788
  G3  way clip decision (>=1 inside)  osmconvert.c:11537-11560
  G4  complete-ways pull-back         osmconvert.c:11305-11365
  P8  --drop-broken-refs              osmconvert.c:11683-11687
  G5  all-to-nodes way center         osmconvert.c:11561-11702
  G7  is_area (first ref == last)     osmconvert.c:11607
  A3  bbox aggregation                osmconvert.c:11573-11604
  R1  relation closure, <=12 passes   osmconvert.c:9083-9132

Scale notes: the ways/relations side is exploded on refs and joined
to the node table on the ref id — an equi join Catalyst plans as
sort-merge (or broadcast when one side is small). Both the
bbox-aggregate and the argmin re-join group on way_id, so with AQE
the exchange introduced by the first groupBy is reused by the second
join (same key). The iterative closure is a driver loop of
broadcast-able semi-joins over a shrinking frontier with
localCheckpoint to cut lineage — the Spark realization of the
reference's <=12 tempfile rewinds.

The synthetic ways/relations world is a pure integer function of
doc_id (like suite.py's points), reproducible in DuckDB SQL —
see suite_graph.py for the paired oracles.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, functions as F

_LOG = logging.getLogger("osmgraft")

HASH_MULT = 2_654_435_761
HASH_MOD = 1 << 32

# ---------------------------------------------------------------
# deterministic ways/relations synthesis (both dialects)
#
#   way exists for doc_id % 4 == 0, way_id = doc_id
#   k = 3 + way_id % 4 refs; ref_j (j = 1..k):
#       ((way_id*37 + j*1009) * 2654435761 % 2^32) % n_docs
#   way closed (area) iff way_id % 3 == 0: first ref appended again
#
#   relation exists for doc_id % 16 == 0, rel_id = doc_id
#   node member:  ((rel_id*53 + 7) * 2654435761 % 2^32) % n_docs
#   way member:   (rel_id % (n_docs // 4)) * 4
#   rel->rel edge: parent rel_id references child rel_id - 16
#       iff rel_id >= 16 and (rel_id // 16) % 7 != 0  (chains <= 6)
# ---------------------------------------------------------------


def _ref_expr(way_id: Column, j: Column, n_docs: int) -> Column:
    h = (way_id * F.lit(37) + j * F.lit(1009)) * F.lit(HASH_MULT)
    return (h % F.lit(HASH_MOD)) % F.lit(n_docs)


def synth_ways(docs: DataFrame, n_docs: int) -> DataFrame:
    """documents -> ways(way_id, refs array<long>, is_closed)."""
    w = docs.select(F.col("doc_id").alias("way_id")).filter(
        F.col("way_id") % 4 == 0
    )
    k = (F.lit(3) + F.col("way_id") % 4).cast("int")
    refs = F.transform(
        F.sequence(F.lit(1), k),
        lambda j: _ref_expr(F.col("way_id"), j.cast("long"), n_docs),
    )
    refs = F.when(
        F.col("way_id") % 3 == 0,
        F.concat(refs, F.array(F.element_at(refs, 1))),
    ).otherwise(refs)
    return w.select(
        "way_id",
        refs.alias("refs"),
        (F.col("way_id") % 3 == 0).alias("is_closed"),
    )


def synth_rels(docs: DataFrame, n_docs: int) -> DataFrame:
    """documents -> rels(rel_id, node_member, way_member, child_rel).

    child_rel is NULL when there is no rel->rel edge."""
    r = docs.select(F.col("doc_id").alias("rel_id")).filter(
        F.col("rel_id") % 16 == 0
    )
    nd = (
        (F.col("rel_id") * F.lit(53) + F.lit(7)) * F.lit(HASH_MULT)
        % F.lit(HASH_MOD)
    ) % F.lit(n_docs)
    wy = (F.col("rel_id") % F.lit(max(n_docs // 4, 1))) * F.lit(4)
    child = F.when(
        (F.col("rel_id") >= 16)
        & (F.expr("(rel_id div 16) % 7") != 0),
        F.col("rel_id") - 16,
    )
    return r.select(
        "rel_id",
        nd.alias("node_member"),
        wy.alias("way_member"),
        child.alias("child_rel"),
    )


# ---------------------------------------------------------------
# J1 + A3 + G5/G7: ref resolution, bbox agg, exact way centers
# ---------------------------------------------------------------


def way_geometry(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Resolve refs to coordinates and compute per-way bbox + the
    all-to-nodes center with exact C integer semantics
    (osmconvert.c:11561-11702):

      x_middle = x_max/2 + x_min/2   (C trunc division)
      y_middle = (y_max + y_min)/2
      closed way (first ref == last): center = middle
      open way: first ref (in order) minimizing the Manhattan
                distance |x - x_middle| + |y - y_middle|

    nodes must have (doc_id, lat_i, lon_i). One shuffle for the
    ref-resolution join, one for the way_id aggregate; the argmin
    re-join reuses the way_id partitioning (AQE exchange reuse).
    """
    ex = ways.select(
        "way_id", "is_closed", F.posexplode("refs").alias("j", "ref")
    )
    res = ex.join(
        nodes.select(
            F.col("doc_id").alias("ref"), "lat_i", "lon_i"
        ),
        "ref",
    )
    # SINGLE shuffle on way_id: collect the (small, <= --max-refs)
    # resolved coordinate list per way, then derive bbox, middle,
    # and the argmin entirely in-row with higher-order functions.
    # (The alternative — agg for the bbox, re-join the exploded
    # side, agg again for the argmin — costs three way_id shuffles.)
    agg = res.groupBy("way_id").agg(
        F.first("is_closed").alias("is_closed"),
        F.count("*").cast("long").alias("n_refs"),
        F.min("lon_i").alias("x_min"),
        F.max("lon_i").alias("x_max"),
        F.min("lat_i").alias("y_min"),
        F.max("lat_i").alias("y_max"),
        F.collect_list(F.struct("j", "lon_i", "lat_i")).alias("pts"),
    )
    # C integer division truncates toward zero; Spark `div` on longs
    # is Java long division (also trunc) — exact replica
    agg = agg.withColumn(
        "x_mid",
        F.expr("x_max div 2 + x_min div 2"),
    ).withColumn("y_mid", F.expr("(y_max + y_min) div 2"))

    # open ways: argmin (manhattan distance, ref order j) — min of
    # a struct orders lexicographically, reproducing the
    # reference's strictly-less scan keeping the FIRST minimizer
    nearest = F.array_min(
        F.transform(
            F.col("pts"),
            lambda p: F.struct(
                (
                    F.abs(p.lon_i - F.col("x_mid"))
                    + F.abs(p.lat_i - F.col("y_mid"))
                ).alias("dist"),
                p.j.alias("j"),
                p.lon_i.alias("lon_i"),
                p.lat_i.alias("lat_i"),
            ),
        )
    )
    out = agg.withColumn("m", nearest).select(
        "way_id",
        "n_refs",
        "is_closed",
        "x_min",
        "x_max",
        "y_min",
        "y_max",
        F.when(F.col("is_closed"), F.col("x_mid"))
        .otherwise(F.col("m.lon_i"))
        .alias("center_lon"),
        F.when(F.col("is_closed"), F.col("y_mid"))
        .otherwise(F.col("m.lat_i"))
        .alias("center_lat"),
    )
    return out


# ---------------------------------------------------------------
# G3 / G4 / P8: clipping decisions over the ref graph
# ---------------------------------------------------------------


def ways_touching(ways: DataFrame, inside_nodes: DataFrame) -> DataFrame:
    """G3: ways kept iff >=1 ref node is inside the border
    (osmconvert.c:11546-11556). inside_nodes: (doc_id). Exact
    semi-join — strictly more accurate than the reference's lossy
    hash bitset (osmconvert.c:412-416)."""
    ex = ways.select("way_id", F.explode("refs").alias("ref"))
    hit = ex.join(
        inside_nodes.select(F.col("doc_id").alias("ref")),
        "ref",
        "left_semi",
    )
    return hit.select("way_id").distinct()


def complete_ways_nodes(
    ways: DataFrame, inside_nodes: DataFrame, nodes: DataFrame
) -> DataFrame:
    """G4 --complete-ways: pull back ALL member nodes of any
    partially-inside way (osmconvert.c:11305-11365). Returns the
    full node set (doc_id, lat_i, lon_i): inside nodes plus every
    ref of a touching way. Two chained semi-joins, no rescans
    (the reference needs tempfile spools + input rewinds)."""
    kept = ways_touching(ways, inside_nodes)
    refs = (
        ways.join(kept, "way_id", "left_semi")
        .select(F.explode("refs").alias("doc_id"))
        .distinct()
    )
    wanted = refs.unionByName(
        inside_nodes.select("doc_id")
    ).distinct()
    return nodes.join(wanted, "doc_id", "left_semi")


def drop_broken_refs(
    ways: DataFrame, kept_nodes: DataFrame
) -> DataFrame:
    """P8 --drop-broken-refs: remove refs pointing at excluded
    nodes; ways left with 0 refs vanish (osmconvert.c:11683-11687).

    Implemented as explode -> semi-join -> re-collect (order
    preserved via posexplode + sort in collect)."""
    ex = ways.select(
        "way_id", F.posexplode("refs").alias("j", "ref")
    )
    kept = ex.join(
        kept_nodes.select(F.col("doc_id").alias("ref")),
        "ref",
        "left_semi",
    )
    return (
        kept.groupBy("way_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "ref"))),
                lambda s: s.ref,
            ).alias("refs")
        )
        .withColumn("n_kept_refs", F.size("refs").cast("long"))
    )


# ---------------------------------------------------------------
# G6/R3: relation geometry aggregation, <=12 fixed-point passes
# ---------------------------------------------------------------


def rel_geometry(
    members: DataFrame,
    positions: DataFrame,
    max_passes: int = 12,
) -> DataFrame:
    """G6 (posr_processing osmconvert.c:6917-7070): resolve each
    relation's position from its members' positions, iterating
    because rel->rel members resolve in later passes (<=12, R3).

    members: (rel_id long, j int, ref_id long, is_rel boolean,
              is_area boolean) — ref_id indexes `positions` for
    node/way members and other rel_ids for rel members.
    positions: (ref_id long, x long, y long) for non-rel members.

    Exact reference semantics:
      - a relation resolves in a pass only when every REL member is
        already resolved (unresolved rel member -> retry next pass,
        osmconvert.c:7019-7024); non-rel members with no position
        are simply skipped;
      - bbox over member positions; x_middle = x_max/2 + x_min/2
        (C trunc), y_middle = (y_max+y_min)/2;
      - is_area -> center = middle. NOT area -> the LAST member
        position in member order: the reference's nearest-to-middle
        scan never refreshes its probe pointer (posi_xy stays on the
        last member, osmconvert.c:6977-6989), so `new_distance`
        always equals the current distance and no update fires —
        we reproduce the de-facto behavior, not the dead code.
    """
    resolved = positions.select(
        F.col("ref_id").alias("rel_id"), "x", "y"
    ).limit(0)
    pending = members
    for _ in range(max_passes):
        rel_pos = resolved.select(
            F.col("rel_id").alias("ref_id"),
            F.col("x").alias("rx"),
            F.col("y").alias("ry"),
        )
        m = (
            pending.join(positions, "ref_id", "left")
            .join(rel_pos, "ref_id", "left")
            .withColumn("px", F.coalesce("x", "rx"))
            .withColumn("py", F.coalesce("y", "ry"))
        )
        agg = m.groupBy("rel_id").agg(
            F.first("is_area").alias("is_area"),
            F.max(F.col("is_rel") & F.col("px").isNull()).alias(
                "blocked"
            ),
            F.count(F.col("px")).alias("n"),
            F.min("px").alias("x_min"),
            F.max("px").alias("x_max"),
            F.min("py").alias("y_min"),
            F.max("py").alias("y_max"),
            # last member (by order j) with a valid position
            F.max_by(
                F.struct("px", "py"), F.when(F.col("px").isNotNull(), F.col("j"))
            ).alias("last"),
        )
        ready = agg.filter(~F.col("blocked") & (F.col("n") > 0))
        # 2 jobs/pass (round-2; was ~5): lazy checkpoints are
        # materialized by the counts that also drive the loop exits.
        new_pos = ready.select(
            "rel_id",
            F.when(
                F.col("is_area"),
                F.expr("x_max div 2 + x_min div 2"),
            )
            .otherwise(F.col("last.px"))
            .alias("x"),
            F.when(
                F.col("is_area"), F.expr("(y_max + y_min) div 2")
            )
            .otherwise(F.col("last.py"))
            .alias("y"),
        ).localCheckpoint(eager=False)
        if new_pos.count() == 0:
            break
        resolved = resolved.unionByName(new_pos).localCheckpoint(
            eager=False
        )
        pending = pending.join(
            new_pos.select("rel_id"), "rel_id", "left_anti"
        ).localCheckpoint(eager=False)
        if pending.count() == 0:
            break
    return resolved


# ---------------------------------------------------------------
# R1: relation transitive closure (upward), <=12 fixed-point passes
# ---------------------------------------------------------------


def rel_closure_up(
    rels: DataFrame, seed_rels: DataFrame, max_passes: int = 12
) -> DataFrame:
    """R1 (oo__rrprocessing osmconvert.c:9083-9132): a relation is
    flagged if any member relation is flagged; iterate until the
    fixed point or 12 passes, whichever first (the reference warns
    and stops at 12, osmconvert.c:10637-10643).

    rels must have (rel_id, child_rel). Driver loop of exact
    semi-joins over a shrinking frontier; localCheckpoint every pass
    keeps the lineage flat (SURVEY.md hard-parts list).
    """
    edges = (
        rels.select("rel_id", "child_rel")
        .filter(F.col("child_rel").isNotNull())
        .persist()
    )
    return _closure(edges, seed_rels, max_passes)


def rel_closure_down(
    rels: DataFrame, seed_rels: DataFrame, max_passes: int = 12
) -> DataFrame:
    """R2 (oo__inverserrprocessing osmfilter.c:5130-5179): kept
    relations pull the relations they REFERENCE (downward), then
    members and way-nodes are marked in later stages. Same loop as
    R1 with the edge direction flipped."""
    edges = (
        rels.select(
            F.col("child_rel").alias("rel_id"),
            F.col("rel_id").alias("child_rel"),
        )
        .filter(F.col("rel_id").isNotNull())
        .persist()
    )
    return _closure(edges, seed_rels, max_passes)


def _closure(
    edges: DataFrame, seed_rels: DataFrame, max_passes: int
) -> DataFrame:
    edges.count()  # materialize once; every pass probes this cache
    seed = seed_rels.select("rel_id").distinct().localCheckpoint()
    frontiers = [seed]  # each entry is individually checkpointed
    flagged = seed
    frontier = seed
    converged = False
    for _ in range(max_passes):
        # broadcast the (shrinking) frontier so the edge cache is
        # probed map-side — no shuffle of the big side per pass.
        # At cluster scale a too-large frontier falls back to a
        # shuffled semi-join automatically (broadcast is a hint).
        # ONE job per pass: the frontier is a LAZY localCheckpoint,
        # so the count() both materializes the checkpoint and
        # returns the emptiness test (round-2: was eager checkpoint
        # + isEmpty = 2 jobs/pass).
        # `flagged` stays a lazy union of checkpointed frontiers —
        # bounded depth (<= max_passes), no per-pass union job.
        parents = edges.join(
            F.broadcast(
                frontier.select(F.col("rel_id").alias("child_rel"))
            ),
            "child_rel",
            "left_semi",
        ).select("rel_id")
        frontier = (
            parents.join(F.broadcast(flagged), "rel_id", "left_anti")
            .distinct()
            .localCheckpoint(eager=False)
        )
        if frontier.count() == 0:
            converged = True
            break
        frontiers.append(frontier)
        flagged = flagged.unionByName(frontier)
    if not converged:
        # the reference warns and stops at its recursion cap
        # (osmconvert.c:10637-10643); mirror that with the size of
        # the still-growing frontier so truncation is visible.
        _LOG.warning(
            "relation closure stopped at %d passes with %d "
            "relations still on the frontier; result is truncated "
            "at that depth",
            max_passes,
            frontiers[-1].count(),
        )
    edges.unpersist()
    out = frontiers[0]
    for f in frontiers[1:]:
        out = out.unionByName(f)
    return out
