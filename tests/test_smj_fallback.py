"""Broadcast-index joins must degrade gracefully: when the way/
index side exceeds the broadcast threshold (or the caller asks for
it), the cell equi-join runs as a sort-merge/shuffled join and the
results hash-match the broadcast plan exactly. This is the
production contract for the snap/viterbi family: the index side is
normally small (broadcast), but nothing correctness-critical may
depend on that."""

from pyspark.sql import functions as F

from osmgraft.operators.linecover import (
    snap_to_ways,
    snap_to_ways_geodesic,
    viterbi_map_match,
)


def _fixture(spark):
    # a few ways threading a node grid + probe points nearby
    nodes = spark.createDataFrame(
        [
            (i, 10_000_000 + 300_000 * (i % 7),
             20_000_000 + 400_000 * (i // 7))
            for i in range(35)
        ],
        "doc_id long, lat_i long, lon_i long",
    )
    ways = spark.createDataFrame(
        [
            (100 + w, list(range(7 * w, 7 * w + 7)))
            for w in range(5)
        ],
        "way_id long, refs array<long>",
    )
    pts = spark.createDataFrame(
        [
            (1000 + i, 10_050_000 + 310_000 * (i % 6),
             20_040_000 + 390_000 * (i % 5))
            for i in range(40)
        ],
        "doc_id long, lat_i long, lon_i long",
    )
    return nodes, ways, pts


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_snap_broadcast_vs_shuffle_hash_match(spark):
    nodes, ways, pts = _fixture(spark)
    b = snap_to_ways(pts, ways, nodes, shift=20,
                     index_join="broadcast")
    s = snap_to_ways(pts, ways, nodes, shift=20,
                     index_join="shuffle")
    pb, ps = _plan(b), _plan(s)
    assert "BroadcastHashJoin" in pb
    assert "SortMergeJoin" in ps or "ShuffledHashJoin" in ps
    rb, rs = _rows(b), _rows(s)
    assert rb == rs and len(rb) > 0


def test_snap_geodesic_strategy_invariant(spark):
    nodes, ways, pts = _fixture(spark)
    b = snap_to_ways_geodesic(pts, ways, nodes, shift=20,
                              index_join="broadcast")
    s = snap_to_ways_geodesic(pts, ways, nodes, shift=20,
                              index_join="shuffle")
    assert "SortMergeJoin" in _plan(s) or "ShuffledHashJoin" in _plan(s)
    assert _rows(b) == _rows(s)


def test_auto_degrades_past_threshold(spark):
    """index_join='auto' with broadcasting disabled must pick a
    shuffle join AND still match the broadcast-path rows — the
    exact 'index outgrew the threshold' scenario."""
    nodes, ways, pts = _fixture(spark)
    base = _rows(
        snap_to_ways(pts, ways, nodes, shift=20,
                     index_join="broadcast")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = snap_to_ways(pts, ways, nodes, shift=20,
                         index_join="auto")
        pa = _plan(a)
        assert "BroadcastHashJoin" not in pa
        assert "SortMergeJoin" in pa or "ShuffledHashJoin" in pa
        assert _rows(a) == base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _traces(spark):
    return spark.createDataFrame(
        [
            (t, s, 10_050_000 + 200_000 * s + 10_000 * t,
             20_040_000 + 250_000 * s)
            for t in range(6)
            for s in range(4)
        ],
        "trace_id long, step long, lat_i long, lon_i long",
    )


def test_viterbi_strategy_invariant(spark):
    nodes, ways, _pts = _fixture(spark)
    tr = _traces(spark)
    b = viterbi_map_match(tr, ways, nodes, n_steps=4, k=2,
                          shift=20, index_join="broadcast")
    s = viterbi_map_match(tr, ways, nodes, n_steps=4, k=2,
                          shift=20, index_join="shuffle")
    rb, rs = _rows(b), _rows(s)
    assert rb == rs and len(rb) > 0
