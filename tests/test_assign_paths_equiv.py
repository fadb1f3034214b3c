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


def test_partitioned_equals_broadcast(spark, pts):
    """assign_regions_partitioned (lon-strip shuffle join +
    relational crossing parity) equals the broadcast/kernel path
    on the hash-scattered grid — including boundary points, the
    hole in Concavia, overlap tie-breaks, and null coords (no
    strip -> dropped, same as keep_noregion=False). Run with
    auto-broadcast OFF so the strip join is a genuine shuffle
    join; the plan must contain no Python stage and no cartesian
    product."""
    want = {
        r.doc_id: (r.region, r.subregion)
        for r in spatial.assign_regions(pts, fixture_polyset())
        .select("doc_id", "region", "subregion")
        .collect()
    }
    edges, polys = spatial.polyset_frames(spark, fixture_polyset())
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = spatial.assign_regions_partitioned(pts, edges, polys)
        got = {
            r.doc_id: (r.region, r.subregion) for r in out.collect()
        }
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want and len(got) > 100
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "EvalPython" not in final and "InPandas" not in final
    assert (
        "SortMergeJoin" in final or "ShuffledHashJoin" in final
    )  # the strip join really shuffles both sides
