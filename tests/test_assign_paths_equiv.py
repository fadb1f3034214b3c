"""The JVM (Catalyst) and Arrow-kernel assignment paths must agree
exactly — including null coordinates and boundary points."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.fixtures import fixture_polyset
from osmgraft.operators import spatial


@pytest.fixture(scope="module")
def pts(spark):
    base = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        (F.lit(470000000) + (F.col("id") * 2246822519) % 40000000)
        .cast("long")
        .alias("lat_i"),
        (F.lit(100000000) + (F.col("id") * 2654435761) % 40000000)
        .cast("long")
        .alias("lon_i"),
    )
    nulls = spark.createDataFrame(
        [(100001, None, None), (100002, 485000000, None)],
        "doc_id long, lat_i long, lon_i long",
    )
    return base.unionByName(nulls)


def _run(pts, **kw):
    out = spatial.assign_regions(pts, fixture_polyset(), **kw)
    return {
        r.doc_id: (r.region, r.subregion, r.region_admin)
        for r in out.collect()
    }


@pytest.mark.parametrize("keep_noregion", [False, True])
def test_catalyst_equals_arrow_kernel(pts, keep_noregion):
    udf = _run(pts, keep_noregion=keep_noregion)  # default path
    old = spatial.JVM_EDGE_LIMIT
    try:
        spatial.JVM_EDGE_LIMIT = 10_000  # force the JVM path
        cat = _run(pts, keep_noregion=keep_noregion)
    finally:
        spatial.JVM_EDGE_LIMIT = old
    assert cat == udf
