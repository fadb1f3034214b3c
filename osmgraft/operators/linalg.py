"""Distributed linear algebra over embedding columns, integer-exact.

power_iteration_projection: the dominant eigenvector of the corpus
Gram matrix G = sum_rows x xT (the top PCA direction up to
centering), estimated by synchronous power iteration WITHOUT ever
materializing G — each round is the matvec identity

    y = G v = sum_rows x * (x . v)

i.e. one pass over the data: a per-row dot product (map-side after
broadcasting the d-vector v) and a per-dimension sum. G is d x d and
would be cheap here, but at d = 1024+ the d^2-per-row outer-product
expansion is the scale killer; the matvec form stays O(d) per row
per iteration, which is why Spark's own RowMatrix PCA uses it for
tall-skinny inputs.

Everything is fixed-point long arithmetic so the result is
bit-identical across engines and partitionings (the linkgraph.py /
clustering.py discipline):

  - x quantizes to floor(x_f * 128)  (|x| < 2^7 for unit-ish
    embeddings; float->double widening and double*128 are
    IEEE-exact, floor deterministic);
  - v starts uniform at 2^14 and is re-normalized every round to
    |v| <= 2^21 by a floor-division by the power of two
    2^(bitlen(max|y|) - 21) — value-adaptive, so cancellation-heavy
    data cannot underflow v to zero the way a worst-case static
    shift would;
  - the per-row dot s <= d * 2^7 * 2^21 = 2^34 (d = 64) is floored
    to s' = s div 2^13 before the contribution sum, keeping
    y <= N * 2^28: longs are exact to N ~ 2^34 rows; past that the
    contribution cast widens to DECIMAL(38,0) (same code shape,
    documented, not needed at tested scales).

All floor-divisions use the (v - pmod(v, p)) div p form: Spark's
`div` truncates toward zero and would diverge from DuckDB's
flooring `//` on negatives; subtracting the positive pmod first
makes truncation == floor in both engines.

Scale shape per iteration: the d-row v table broadcasts; one
shuffle keyed vec_id (the s join-back), one d-key groupBy with
map-side combine, one 1-row max (bounded scalar funnel, the
documented class). Plan depth grows linearly in the small fixed
iteration count; no driver collect anywhere.

NOT translated C code: osmctools has no linear algebra; this is the
LLM-pipeline extension surface (SURVEY.md §2 extensions), sibling
of clustering.py's k-means and pq.py's quantizers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

QUANT = 128  # |x_f| < 1 -> |xq| < 2^7
V0 = 1 << 14
S_SHIFT = 8192  # 2^13: s' = floor(s / 2^13)
V_BITS = 21


def _floor_div(col, p):
    """floor(col / p) in pure long arithmetic, engine-portable."""
    return ((col - F.pmod(col, p)) / p).cast("long")


def quantized_dims(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = QUANT,
) -> DataFrame:
    """(vec_id, dim 1-based, x long) exploded fixed-point view."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * quant).cast(
                    "long"
                ),
            )
        ).alias("dim0", "x"),
    ).select("vec_id", (F.col("dim0") + 1).alias("dim"), "x")


def power_iteration_projection(
    emb: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, proj): each row's integer projection onto the
    power-iteration estimate (after `iters` rounds from the uniform
    start) of the Gram matrix' dominant eigenvector. Sign and scale
    follow deterministically from the fixed start vector."""
    xq = quantized_dims(emb, id_col, vec_col)
    v = (
        xq.select("dim")
        .distinct()
        .select("dim", F.lit(V0).cast("long").alias("val"))
    )
    for _ in range(iters):
        s = (
            xq.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("x") * F.col("val")).alias("s"))
            .select(
                "vec_id",
                _floor_div(F.col("s"), F.lit(S_SHIFT)).alias("sp"),
            )
        )
        y = (
            xq.join(s, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("x") * F.col("sp")).alias("y"))
        )
        mx = y.agg(F.max(F.abs(F.col("y"))).alias("mx"))
        # value-adaptive power-of-two renormalizer (see module doc);
        # pyspark's F.shiftleft wants a literal shift, so the
        # column-shift form goes through expr
        p = F.expr(
            "shiftleft(cast(1 as bigint), cast(greatest(0,"
            f" length(bin(mx)) - {V_BITS}) as int))"
        )
        v = y.crossJoin(F.broadcast(mx)).select(
            "dim", _floor_div(F.col("y"), p).alias("val")
        )
    return (
        xq.join(F.broadcast(v), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("x") * F.col("val"))
            .cast("long")
            .alias("proj")
        )
    )


def label_scatter(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label cluster-quality report, integer-exact: for each
    label, the SCALED within-class scatter

        W_c = n_c * sum_i ||x_i||^2  -  ||sum_i x_i||^2
            = n_c * sum_i ||x_i - mu_c||^2

    — the algebraic identity keeps the centroid mu_c (a rational)
    out of the computation entirely, so everything is sums of
    products of the fixed-point codes (quantized_dims' floor(x*128):
    |code| < 2^7, d = 64, so ||sum x||^2 fits a long comfortably to
    ~10^6 rows per label; the same expression over DECIMAL(38,0)
    covers any real corpus).

    The standard eval for an embedding labeling/clustering: small
    scatter per member = tight cluster. Shape: one (label, dim)
    groupBy with map-side partial sums (d rows per label), then one
    label groupBy — both combiner-friendly, nothing corpus-sized
    shuffles."""
    xq = emb.select(
        F.col(label_col).cast("long").alias("label"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * QUANT).cast(
                    "long"
                ),
            )
        ).alias("dim", "x"),
    )
    per_dim = xq.groupBy("label", "dim").agg(
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.count("*").alias("n"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.max("n").cast("long").alias("n_vectors"),
            F.sum("sxx").cast("long").alias("sum_sq"),
            F.sum(F.col("sx") * F.col("sx"))
            .cast("long")
            .alias("norm_sum_sq"),
        )
        .select(
            "label",
            "n_vectors",
            "sum_sq",
            "norm_sum_sq",
            (
                F.col("n_vectors") * F.col("sum_sq")
                - F.col("norm_sum_sq")
            )
            .cast("long")
            .alias("scatter_scaled"),
        )
    )
