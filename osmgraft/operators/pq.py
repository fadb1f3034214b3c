"""Product quantization (PQ) over embedding vectors — the
storage-bound vector path at 100 TB: a dim-64 float vector
(256 B raw) compresses to m one-byte subspace codes (8 B at
m = 8), and similarity search runs over the CODES table with
asymmetric distance computation (ADC) — per query, one small
lookup table of exact subspace distances, then an in-row fold
over each candidate's codes. The corpus vectors are never read
again after encoding.

Reference parity: osmctools has no vector ops; this is the
LLM-pipeline extension surface (SURVEY.md §2 extensions), the
compression twin of the IVF route in dedup.embed_ann_ivf — at
real scale the two compose (IVF routes a query to n_probe
inverted lists, ADC scores the lists' codes).

Integer-exact like clustering.py: subvectors quantize to
fixed-point longs (clustering.quantize), the codebook entries are
the quantized subvectors of the k lowest vec_ids (deterministic
first-K seeding — swap for per-subspace k-means at real scale;
clustering.kmeans_centroids trains exactly this shape), encoding
is an exact integer argmin per subspace (ties -> lowest entry
id), and ADC scores are exact bigint sums of per-subspace LUT
distances — bit-reproducible across engines and partition orders,
so a SQL oracle can replay the whole chain.

Scale shape:
  - pq_codebook: m*k tiny rows, broadcast everywhere it appears.
  - pq_encode: map-only — posexplode into m subvector rows, one
    broadcast join on the m-row grouped codebook, in-row argmin.
    Zero data shuffles; the codes table is the artifact you
    persist (8 B/vector instead of 256 B).
  - pq_adc_topk: the per-query LUT is Q*m*k rows (built with one
    broadcast join), broadcast to the codes side; scoring is an
    in-row fold over each candidate's code array (no Q x N
    shuffle); only the final per-query top-k window shuffles the
    Q x N scored rows, keyed by query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window

from .clustering import _dist2, quantize


def _sub_slices(q, m: int, sub: int):
    """array of m subvector slices of the quantized vector."""
    return F.array(
        *[F.slice(q, s * sub + 1, sub) for s in range(m)]
    )


def pq_codebook(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(s, e, cv: array<long> of dim/m) — the per-subspace
    codebook: entry e of subspace s is the s-th slice of the
    quantized vector with the e-th lowest vec_id (vec_id < k, the
    deterministic seeding; the replay in SQL is identical)."""
    sub = dim // m
    vecs = quantize(emb, id_col, vec_col).filter(
        F.col("vec_id") < k
    )
    return vecs.select(
        F.col("vec_id").alias("e"),
        F.posexplode(_sub_slices(F.col("q"), m, sub)).alias(
            "s", "cv"
        ),
    ).select("s", "e", "cv")


def _grouped_codebook(cb: DataFrame) -> DataFrame:
    """(s, entries: array<struct<e,cv>> sorted by e) — m rows, the
    broadcastable form (struct sort orders by the leading field)."""
    return cb.groupBy("s").agg(
        F.sort_array(
            F.collect_list(F.struct("e", "cv"))
        ).alias("entries")
    )


def pq_encode(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame = None,
) -> DataFrame:
    """(vec_id, s, code) — each vector's nearest codebook entry
    per subspace, exact integer dist2, ties -> lowest entry id.
    Map-only over the corpus: posexplode to m subvector rows, one
    broadcast join on the m grouped codebook rows, in-row argmin
    (min over (d2, e) structs). The argmin struct materializes as
    its own projection first (the HOF-CSE rule: an inlined
    aggregate-lambda referenced twice re-runs the fold twice).

    `codebook` accepts an externally trained (s, e, cv) table
    (e.g. pq_trained_codebook); default is the first-k seeded
    pq_codebook."""
    if codebook is None:
        codebook = pq_codebook(emb, m, k, dim, id_col, vec_col)
    return _encode_q(
        quantize(emb, id_col, vec_col), codebook, m, dim // m
    )


def _encode_q(
    qvecs: DataFrame, codebook: DataFrame, m: int, sub: int
) -> DataFrame:
    """Encode pre-quantized (vec_id, q) rows against an (s, e, cv)
    codebook — the shared core of pq_encode and the residual
    encoder (residual_ivf_pq_topk feeds q = vector - centroid)."""
    cbg = _grouped_codebook(codebook)
    rows = qvecs.select(
        "vec_id",
        F.posexplode(_sub_slices(F.col("q"), m, sub)).alias(
            "s", "sv"
        ),
    )
    scored = rows.join(F.broadcast(cbg), "s").withColumn(
        "_best",
        F.array_min(
            F.transform(
                "entries",
                lambda ent: F.struct(
                    _dist2(F.col("sv"), ent["cv"]).alias("d2"),
                    ent["e"].alias("e"),
                ),
            )
        ),
    )
    return scored.select(
        "vec_id", "s", F.col("_best.e").alias("code")
    )


def pq_codes_wide(codes: DataFrame, m: int = 8) -> DataFrame:
    """(vec_id, codes: array<long> of m) — the persisted PQ
    artifact (one m-byte row per vector). One groupBy(vec_id)
    shuffle carrying (vec_id, s, code) triples."""
    return codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("s", "code"))),
            lambda sc: sc["code"],
        ).alias("codes")
    )


def _query_luts(
    queries: DataFrame,
    m: int,
    k: int,
    dim: int,
    cb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, luts: array of m arrays of k exact dist2 longs) —
    each query's ADC lookup table, built with one broadcast join
    of the exploded queries against the m*k codebook rows."""
    sub = dim // m
    qrows = quantize(queries, id_col, vec_col).select(
        F.col("vec_id").alias("qid"),
        F.posexplode(_sub_slices(F.col("q"), m, sub)).alias(
            "s", "qsv"
        ),
    )
    return (
        qrows.join(F.broadcast(cb), "s")
        .withColumn("_d2", _dist2(F.col("qsv"), F.col("cv")))
        .groupBy("qid", "s")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("e", "_d2"))),
                lambda ed: ed["_d2"],
            ).alias("d2s")
        )
        .groupBy("qid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "d2s"))),
                lambda sd: sd["d2s"],
            ).alias("luts")
        )
    )


def _adc_score(m: int):
    """In-row ADC fold: sum over subspaces of luts[s][codes[s]]."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("luts"), s + 1),
            (F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        ),
    )


def pq_adc_topk(
    emb: DataFrame,
    query_filter,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    topk: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: for each query vector (query_filter rows of
    emb), the topk nearest OTHER vectors by approximate distance
    = sum over subspaces of dist2(query subvector, codebook entry
    of the candidate's code). Returns (qid, vec_id, adist2, rk),
    rk 1..topk ordered (adist2 asc, vec_id asc).

    The LUT (qid, s -> array of k dist2 longs, built by one
    broadcast join of the exploded queries against the codebook)
    is grouped per query and broadcast; candidates are scored
    IN-ROW by folding their m-code array through the LUT — the
    corpus-side plan is scan codes + broadcast hash join + fold,
    with the only corpus-wide shuffles the codes-wide groupBy and
    the final top-k window keyed by qid."""
    cb = pq_codebook(emb, m, k, dim, id_col, vec_col)
    lut = _query_luts(
        emb.filter(query_filter), m, k, dim, cb, id_col, vec_col
    )
    wide = pq_codes_wide(
        pq_encode(emb, m, k, dim, id_col, vec_col), m
    )
    scored = wide.crossJoin(F.broadcast(lut)).select(
        "qid",
        "vec_id",
        _adc_score(m).alias("adist2"),
    ).filter(F.col("qid") != F.col("vec_id"))
    w = Window.partitionBy("qid").orderBy(
        F.col("adist2").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn(
            "rk", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rk") <= topk)
        .select("qid", "vec_id", "adist2", "rk")
    )


def ivf_pq_topk(
    emb: DataFrame,
    query_filter,
    kc: int = 8,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    n_probe: int = 2,
    topk: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ (no residual): the composed 100-TB vector-search
    plan — IVF routes each query to its n_probe nearest coarse
    centroids (dedup.embed_ann_ivf's routing, here in exact
    fixed-point integer dist2 like clustering._assign, ties ->
    lowest cid), then ADC scores ONLY the probed inverted lists'
    8-byte code rows through the query's broadcast LUT. Per query
    the work is n_probe/kc of the corpus' CODES (not vectors);
    recall tunes via n_probe and kc independently of corpus size.

    Coarse centroids are the quantized vectors of the kc lowest
    vec_ids (deterministic seeding — at real scale feed
    clustering.kmeans_centroids output instead; same shape).

    Returns (qid, vec_id, cluster, adist2, rk), rk 1..topk by
    (adist2 asc, vec_id asc), self excluded. Integer-exact."""
    from pyspark.sql import Window as W

    vecs = quantize(emb, id_col, vec_col)
    cents = vecs.filter(F.col("vec_id") < kc).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cv")
    )
    assign = _ivf_assign(vecs, cents).select(
        "vec_id", "cluster"
    )
    wide = pq_codes_wide(
        pq_encode(emb, m, k, dim, id_col, vec_col), m
    )
    lists = wide.join(assign, "vec_id")

    qv = quantize(emb.filter(query_filter), id_col, vec_col).select(
        F.col("vec_id").alias("qid"), "q"
    )
    qc = qv.crossJoin(F.broadcast(cents)).select(
        "qid", "cid", _dist2(F.col("q"), F.col("cv")).alias("_d2")
    )
    wp = W.partitionBy("qid").orderBy(
        F.asc("_d2"), F.asc("cid")
    )
    probes = (
        qc.withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= n_probe)
        .select("qid", F.col("cid").alias("cluster"))
    )
    cb = pq_codebook(emb, m, k, dim, id_col, vec_col)
    lut = _query_luts(
        emb.filter(query_filter), m, k, dim, cb, id_col, vec_col
    )
    cand = probes.join(lists, "cluster").filter(
        F.col("vec_id") != F.col("qid")
    )
    scored = cand.join(F.broadcast(lut), "qid").select(
        "qid", "vec_id", "cluster", _adc_score(m).alias("adist2")
    )
    wk = W.partitionBy("qid").orderBy(
        F.asc("adist2"), F.asc("vec_id")
    )
    return (
        scored.withColumn(
            "rk", F.row_number().over(wk).cast("long")
        )
        .filter(F.col("rk") <= topk)
        .select("qid", "vec_id", "cluster", "adist2", "rk")
    )


def _ivf_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest coarse centroid per vector (exact integer dist2,
    ties -> lowest cid): broadcast nested loop + per-vector
    min-struct — clustering._assign's plan, kept local so pq.py
    imports stay acyclic."""
    scored = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("_d2", _dist2(F.col("q"), F.col("cv")))
        .select("vec_id", "cid", "_d2")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("_d2", "cid")).alias("_b"))
        .select("vec_id", F.col("_b.cid").alias("cluster"))
    )


def pq_trained_codebook(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd-trained per-subspace codebooks (s, e, cv) — all m
    codebooks trained JOINTLY: the subspace id rides the cluster
    key, so each pass is ONE broadcast-assign (m*k rows joined on
    s, in-row-free argmin via min-struct) plus ONE
    groupBy(s, cluster) update with dim/m integer-sum columns.
    Pass count is independent of m — training 8 codebooks costs
    the same number of jobs as training 1 (the joint twin of
    clustering.kmeans_centroids; same integer-exact arithmetic:
    fixed-point quantization, bigint dist2, truncating-div means,
    seeds = the k lowest vec_ids' subvectors, empty clusters
    disappear — all replayed identically in SQL).

    Feed the result to pq_encode(codebook=...) for trained-PQ
    codes."""
    sub = dim // m
    subs = quantize(emb, id_col, vec_col).select(
        "vec_id",
        F.posexplode(_sub_slices(F.col("q"), m, sub)).alias(
            "s", "sv"
        ),
    )
    cents = subs.filter(F.col("vec_id") < k).select(
        "s", F.col("vec_id").alias("e"), F.col("sv").alias("cv")
    )
    for _ in range(n_iter):
        scored = (
            subs.join(F.broadcast(cents), "s")
            .withColumn("_d2", _dist2(F.col("sv"), F.col("cv")))
            .select("vec_id", "s", "sv", "e", "_d2")
        )
        assigned = (
            scored.groupBy("vec_id", "s")
            .agg(
                F.min(F.struct("_d2", "e")).alias("_b"),
                F.first("sv").alias("sv"),
            )
            .select(
                "s", F.col("_b.e").alias("cluster"), "sv"
            )
        )
        sums = assigned.groupBy("s", "cluster").agg(
            F.count("*").cast("long").alias("_n"),
            *[
                F.sum(F.element_at("sv", i + 1))
                .cast("long")
                .alias(f"_s{i}")
                for i in range(sub)
            ],
        )
        cents = sums.select(
            "s",
            F.col("cluster").alias("e"),
            F.array(
                *[
                    F.expr(f"_s{i} div _n").cast("long")
                    for i in range(sub)
                ]
            ).alias("cv"),
        ).localCheckpoint(eager=False)
    return cents


def residual_ivf_pq_topk(
    emb: DataFrame,
    query_filter,
    kc: int = 8,
    m: int = 8,
    k: int = 8,
    dim: int = 64,
    n_probe: int = 2,
    topk: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Residual IVF-PQ (the IVFADC layout): every vector's PQ
    codes quantize its RESIDUAL from the coarse centroid
    (r = q - cv[cluster]) rather than the raw vector — residuals
    are tighter around zero, so the same code budget carries more
    precision. Queries compute a residual LUT PER PROBED LIST
    (q - cv[c] against the residual codebook), then score that
    list's code rows in-row.

    Integer-exact throughout: fixed-point subtraction stays in
    longs, so the whole chain — coarse assign, residual encode,
    per-(query, list) LUT, ADC fold — replays identically in SQL.
    Residual codebook: the residual subvectors of the k lowest
    vec_ids (deterministic seeding; pq_trained_codebook's joint
    Lloyd trains the same (s, e, cv) shape on residuals at real
    scale).

    Scale shape: like ivf_pq_topk plus one broadcast join carrying
    the kc centroid rows to compute residuals, and LUTs keyed
    (qid, cluster) — n_probe * m * k rows per query, still
    broadcast. Returns (qid, vec_id, cluster, adist2, rk)."""
    from pyspark.sql import Window as W

    sub = dim // m
    vecs = quantize(emb, id_col, vec_col)
    cents = vecs.filter(F.col("vec_id") < kc).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cv")
    )
    assign = _ivf_assign(vecs, cents)
    # residual vectors: q - cv[cluster] (broadcast kc rows)
    rv = (
        vecs.join(assign, "vec_id")
        .join(
            F.broadcast(
                cents.select(
                    F.col("cid").alias("cluster"), "cv"
                )
            ),
            "cluster",
        )
        .select(
            "vec_id",
            "cluster",
            F.zip_with(
                "q", "cv", lambda a, b: a - b
            ).alias("q"),
        )
    )
    rcb = rv.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("e"),
        F.posexplode(_sub_slices(F.col("q"), m, sub)).alias(
            "s", "cv"
        ),
    ).select("s", "e", "cv")
    codes = _encode_q(rv.select("vec_id", "q"), rcb, m, sub)
    lists = pq_codes_wide(codes, m).join(assign, "vec_id")

    # query routing + per-(qid, probed cluster) residual LUTs
    qv = vecs.filter(query_filter).select(
        F.col("vec_id").alias("qid"), "q"
    )
    qc = qv.crossJoin(F.broadcast(cents)).select(
        "qid",
        "cid",
        "q",
        "cv",
        _dist2(F.col("q"), F.col("cv")).alias("_d2"),
    )
    wp = W.partitionBy("qid").orderBy(F.asc("_d2"), F.asc("cid"))
    probes = (
        qc.withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= n_probe)
        .select(
            "qid",
            F.col("cid").alias("cluster"),
            F.zip_with("q", "cv", lambda a, b: a - b).alias(
                "qr"
            ),
        )
    )
    qrows = probes.select(
        "qid",
        "cluster",
        F.posexplode(_sub_slices(F.col("qr"), m, sub)).alias(
            "s", "qsv"
        ),
    )
    lut = (
        qrows.join(F.broadcast(rcb), "s")
        .withColumn("_d2", _dist2(F.col("qsv"), F.col("cv")))
        .groupBy("qid", "cluster", "s")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("e", "_d2"))),
                lambda ed: ed["_d2"],
            ).alias("d2s")
        )
        .groupBy("qid", "cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "d2s"))),
                lambda sd: sd["d2s"],
            ).alias("luts")
        )
    )
    cand = lut.join(lists, "cluster").filter(
        F.col("vec_id") != F.col("qid")
    )
    scored = cand.select(
        "qid", "vec_id", "cluster", _adc_score(m).alias("adist2")
    )
    wk = W.partitionBy("qid").orderBy(
        F.asc("adist2"), F.asc("vec_id")
    )
    return (
        scored.withColumn(
            "rk", F.row_number().over(wk).cast("long")
        )
        .filter(F.col("rk") <= topk)
        .select("qid", "vec_id", "cluster", "adist2", "rk")
    )
