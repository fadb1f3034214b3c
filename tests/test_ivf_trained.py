"""kmeans-trained centroids feeding the IVF probe
(clustering.kmeans_centroid_vectors -> dedup.embed_ann_ivf
via the `centroids` table input)."""

import pyspark.sql.functions as F
import pytest

from osmgraft.operators.clustering import (
    QUANT,
    kmeans_centroid_vectors,
)
from osmgraft.operators.dedup import embed_ann_ivf, embed_knn_exact


def _blobs(spark, n_per=20, dim=8):
    """Four well-separated blobs; ids 0..3 are one seed per blob
    corner so first-K seeding starts sanely."""
    import random

    random.seed(11)
    corners = [
        [0.9] * (dim // 2) + [-0.9] * (dim // 2),
        [-0.9] * (dim // 2) + [0.9] * (dim // 2),
        [0.9] * dim,
        [-0.9] * dim,
    ]
    rows = []
    vid = 0
    for rep in range(n_per):
        for c in corners:
            rows.append(
                (
                    vid,
                    [
                        x + random.uniform(-0.05, 0.05)
                        for x in c
                    ],
                )
            )
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_centroid_vectors_dequantized(spark):
    e = spark.createDataFrame(
        [(0, [0.5, -0.25]), (1, [0.5, -0.25])],
        "vec_id long, embedding array<float>",
    )
    cv = kmeans_centroid_vectors(e, k=1, n_iter=1, dim=2).collect()
    assert len(cv) == 1
    assert cv[0].cv == [500000 / QUANT, -250000 / QUANT]


def test_trained_ivf_full_recall_on_blobs(spark):
    emb = _blobs(spark)
    qf = F.col("vec_id") % 10 == 0
    cents = kmeans_centroid_vectors(emb, k=4, n_iter=2, dim=8)
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in embed_ann_ivf(
            emb, query_filter=qf, n_probe=1, k=3, centroids=cents
        ).collect()
    }
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in embed_knn_exact(emb, qf, k=3).collect()
    }
    # blobs are separated enough that 2 Lloyd passes put one
    # centroid per blob: probing a single trained list is exact
    assert ivf == exact


def test_centroids_table_equals_filter_path(spark):
    emb = _blobs(spark)
    qf = F.col("vec_id") % 10 == 0
    # centroids table built from the same vectors the filter picks
    seed = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"),
        F.transform(
            "embedding", lambda x: x.cast("double")
        ).alias("cv"),
    )
    via_table = sorted(
        map(
            tuple,
            embed_ann_ivf(
                emb,
                query_filter=qf,
                n_probe=2,
                k=3,
                centroids=seed,
            ).collect(),
        )
    )
    via_filter = sorted(
        map(
            tuple,
            embed_ann_ivf(
                emb,
                centroid_filter=F.col("vec_id") < 4,
                query_filter=qf,
                n_probe=2,
                k=3,
            ).collect(),
        )
    )
    assert via_table == via_filter
