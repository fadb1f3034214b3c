"""Distributed k-means (Lloyd) over embedding vectors — the
trainer for an IVF index's coarse quantizer (dedup.embed_ann_ivf
consumes exactly such centroids), and the classic "Spark can't do
iterative ML" refutation done the engine's way: each Lloyd pass is
ONE declarative job, state between passes is a K-row centroid
table, and nothing per-vector ever reaches the driver.

Integer-exact like linkgraph.host_pagerank: embeddings quantize to
fixed-point longs (floor(x * 1e6) — IEEE double multiply + floor
is bit-identical in any engine), distances are exact bigint sums
of squares, and centroid updates are truncating integer division
(Spark `div` == DuckDB `//`, verified trunc-toward-zero on
negatives in tests) — so the assignment after N passes is
bit-reproducible across engines and partition orders, and the
oracle can replay the iterations unrolled in pure SQL.

Scale shape per pass: centroids are a BROADCAST K-row table; the
assignment is broadcast-nested-loop + per-vector min (map-only);
the update is one map-side-combined groupBy(cluster) with `dim`
sum columns (whole-stage codegen, no explode). Shuffle traffic
per pass = K * dim longs. The centroid table is pinned with a
lazy localCheckpoint per pass so pass N+1's plan does not re-run
pass N (the fixpoint discipline from graph.py / dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

QUANT = 1_000_000


def quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, q: array<long>) — fixed-point embedding, exact in
    any engine (float -> double widening is exact; double * 1e6
    and floor are IEEE-determined)."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * QUANT).cast(
                "long"
            ),
        ).alias("q"),
    )


def _dist2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector: broadcast nested loop over the
    K-row centroid table, exact integer dist2, ties -> lowest
    centroid id (min over (dist2, cid) structs). _d2 materializes
    as its own projection first — the HOF-CSE rule: an inlined
    aggregate-lambda referenced by two consumers re-evaluates the
    whole fold per consumer."""
    scored = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("_d2", _dist2(F.col("q"), F.col("cv")))
        .select("vec_id", "q", "cid", "_d2")
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("_d2", "cid")).alias("_b"),
        F.first("q").alias("q"),
    )
    return best.select(
        "vec_id",
        "q",
        F.col("_b.cid").alias("cluster"),
        F.col("_b._d2").alias("dist2"),
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The trained coarse quantizer after `n_iter` Lloyd passes:
    (cid, cv: array<long>) in fixed-point. Init: the quantized
    vectors of the `k` lowest vec_ids (deterministic first-K
    seeding — swap for k-means|| sampling at real scale; the pass
    structure is unchanged). A cluster that loses all members
    disappears — identical in the SQL replay."""
    vecs = quantize(emb, id_col, vec_col)
    cents = vecs.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cv")
    )
    for _ in range(n_iter):
        assigned = _assign(vecs, cents)
        sums = assigned.groupBy("cluster").agg(
            F.count("*").cast("long").alias("_n"),
            *[
                F.sum(F.element_at("q", i + 1))
                .cast("long")
                .alias(f"_s{i}")
                for i in range(dim)
            ],
        )
        cents = sums.select(
            F.col("cluster").alias("cid"),
            F.array(
                *[
                    F.expr(f"_s{i} div _n").cast("long")
                    for i in range(dim)
                ]
            ).alias("cv"),
        ).localCheckpoint(eager=False)
    return cents


def kmeans_centroid_vectors(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Trained centroids de-quantized to double vectors — the
    (cid, cv) table dedup.embed_ann_ivf consumes directly (long /
    1e6 -> double is exact; the probe cosines then agree
    bit-for-bit with an oracle replaying the same chain)."""
    return kmeans_centroids(
        emb, k, n_iter, dim, id_col, vec_col
    ).select(
        "cid",
        F.transform(
            "cv",
            lambda x: x.cast("double") / F.lit(float(QUANT)),
        ).alias("cv"),
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means, `n_iter` full passes, integer-exact: each
    pass assigns (broadcast K-row table, map-only) then updates
    (one groupBy(cluster) with per-dimension integer-sum columns,
    truncating-div means) — see kmeans_centroids.

    Returns the final assignment: (vec_id, cluster, dist2) where
    dist2 is the exact squared fixed-point distance to the final
    centroid the vector was assigned to."""
    vecs = quantize(emb, id_col, vec_col)
    cents = kmeans_centroids(emb, k, n_iter, dim, id_col, vec_col)
    return _assign(vecs, cents).select(
        "vec_id", "cluster", "dist2"
    )


def kmeans_summary(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Per-cluster rollup of the final assignment: size, inertia
    (sum of exact dist2), and the spread between the nearest and
    farthest member — the IVF-tuning view (hot clusters = probe
    cost, inertia = quantizer quality)."""
    a = kmeans_assign(emb, k=k, n_iter=n_iter, dim=dim)
    return a.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("dist2").cast("long").alias("inertia"),
        F.min("dist2").cast("long").alias("min_d2"),
        F.max("dist2").cast("long").alias("max_d2"),
    )


def cluster_purity(
    assign: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    label_col: str = "label",
) -> DataFrame:
    """Clustering quality against ground-truth labels: per
    cluster, the majority label (ties toward the SMALLEST label,
    deterministic), its support and the cluster size — purity's
    exact integer sufficient statistics (n_major/n_total summed
    over clusters IS the standard purity score; the division is
    report-layer territory). The evaluation harness for the
    k-means/IVF trainers above, the same measure-your-own-index
    pattern as the ANN recall evaluation (q222).

    Shape: one id equi-join against the label table, one
    partial-aggregable (cluster, label) count, one argmax-by-
    struct per cluster. No windows, no driver state.

    The tie-break is a MIN over struct((-count), label), so it
    works for ANY orderable label type (strings, dates, ints) —
    major_label keeps the label column's own type instead of
    silently NULLing non-numeric labels through a long cast."""
    j = assign.select(id_col, cluster_col).join(
        labels.select(id_col, label_col), id_col
    )
    counts = j.groupBy(cluster_col, label_col).agg(
        F.count("*").cast("long").alias("c")
    )
    return (
        counts.groupBy(cluster_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("c")).alias("nc"),
                    F.col(label_col).alias("lab"),
                )
            ).alias("b"),
            F.sum("c").cast("long").alias("n_total"),
            F.count("*").cast("long").alias("n_labels"),
        )
        .select(
            cluster_col,
            F.col("b.lab").alias("major_label"),
            (-F.col("b.nc")).cast("long").alias("n_major"),
            "n_total",
            "n_labels",
        )
    )
