"""Scalar quantization (SQ8) over embedding vectors — the simplest
storage-bound vector path: each dimension compresses to one byte
using per-dimension corpus min/max bounds, candidate search runs as
an integer dot product over the CODES table, and only the top
candidates are re-scored with the exact cosine. A dim-64 float
vector (256 B) becomes 64 B with ~no recall loss at this candidate
depth — the standard middle ground between raw floats and PQ
(operators/pq.py, 8 B/vector but lossier).

Reference parity: osmctools has no vector ops; this is the
LLM-pipeline extension surface (SURVEY.md §2 extensions), sibling
of embed_knn_exact / embed_ann_* / pq_* in operators/dedup.py and
operators/pq.py.

Integer-exact like clustering.py/pq.py: vectors quantize to
fixed-point longs (clustering.quantize), per-dimension bounds are
exact long min/max, the byte code is
floor(((q - mn) * 255) / (mx - mn)) — the numerator is < 2^31 and
the quotient of two such ints is never within double rounding
distance of an integer boundary unless it IS an integer (distance
>= 1/span >> ulp(255)), so floor over IEEE double division is exact
and identical in every engine — and both the candidate score
(sum of code products, <= 64 * 255^2) and the rescore dot/norms are
exact bigints. A SQL oracle can replay the whole chain.

Scale shape:
  - sq8_bounds: one algebraic agg -> 64 rows (2 longs each); the
    posexplode widens the scan by d BEFORE a map-side-combining
    groupBy on d keys, so the shuffle carries d rows per task.
  - sq8_encode: map-only — the d-row bounds table rides along as
    two literal arrays (the IVF-centroid pattern, dedup.py); zero
    shuffles; the codes table is the persisted artifact
    (64 B/vector).
  - sq8_topk: queries broadcast (small by contract), scoring is an
    in-row fold per (candidate, query) from a broadcast
    nested-loop join — no Q x N shuffle; the per-query candidate
    window shuffles Q x N scored 3-column rows keyed by query
    (same accepted shape as pq_adc_topk), and the exact rescore
    touches only Q x n_cand vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .clustering import quantize


def sq8_bounds(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(dim 1-based, mn, mx) — exact long bounds of the fixed-point
    corpus, one map-side-combining groupBy over d keys."""
    q = quantize(emb, vec_col=vec_col)
    return (
        q.select(F.posexplode("q").alias("dim0", "x"))
        .groupBy((F.col("dim0") + 1).alias("dim"))
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )


def sq8_encode(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes: array<long>) — map-only encode against the
    collected (tiny: d rows) bounds table."""
    spark = emb.sparkSession
    b = {
        r["dim"]: (r["mn"], r["mx"])
        for r in sq8_bounds(emb, vec_col).collect()
    }
    dims = sorted(b)
    mns = F.array(*[F.lit(b[d][0]).cast("long") for d in dims])
    spans = F.array(
        *[F.lit(b[d][1] - b[d][0]).cast("long") for d in dims]
    )
    q = quantize(emb, id_col=id_col, vec_col=vec_col)
    num = F.zip_with(
        F.col("q"), mns, lambda x, mn: (x - mn) * F.lit(255)
    )
    return q.select(
        "vec_id",
        F.zip_with(
            num,
            spans,
            lambda nm, sp: F.when(sp > 0, F.floor(nm / sp))
            .otherwise(F.lit(0))
            .cast("long"),
        ).alias("codes"),
    )


def _long_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq8_topk(
    emb: DataFrame,
    query_filter,
    k: int = 3,
    n_cand: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 candidate generation + exact rescore: per query, the
    n_cand corpus vectors with the highest integer code dot product
    (ties -> lowest id), re-scored with the exact fixed-point
    cosine; returns the final top-k per query as
    (query_id, neighbor_id, rank, sq8_score, cos_r)."""
    codes = sq8_encode(emb, id_col=id_col, vec_col=vec_col)
    qcodes = codes.join(
        emb.filter(query_filter).select(F.col(id_col).alias("vec_id")),
        "vec_id",
    ).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("qc")
    )
    scored = codes.crossJoin(F.broadcast(qcodes)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cand = scored.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _long_dot(F.col("codes"), F.col("qc")).alias("sq8_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sq8_score").desc(), F.col("neighbor_id")
    )
    cand = cand.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= n_cand
    )

    qv = quantize(emb, id_col=id_col, vec_col=vec_col)
    withn2 = qv.select(
        "vec_id", "q", _long_dot(F.col("q"), F.col("q")).alias("n2")
    )
    rescored = (
        cand.join(
            withn2.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("q").alias("nv"),
                F.col("n2").alias("nn2"),
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                withn2.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("q").alias("qv"),
                    F.col("n2").alias("qn2"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            "sq8_score",
            (
                _long_dot(F.col("nv"), F.col("qv"))
                / F.sqrt(F.col("qn2"))
                / F.sqrt(F.col("nn2"))
            ).alias("_c"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("_c").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "sq8_score",
            F.round("_c", 6).alias("cos_r"),
        )
    )
