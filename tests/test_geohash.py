"""Geohash encoding: published public test vectors + an exact
pure-Python replay of the integer quantization, via Spark."""

from __future__ import annotations

import random

from osmgraft.operators.spatial import _GEOHASH32, with_geohash


def _gh(lat_i, lon_i, chars=9):
    bits = 5 * chars
    lb = (bits + 1) // 2
    tb = bits // 2
    ub = ((lon_i + 1800000000) * (1 << lb)) // 3600000000
    vb = ((lat_i + 900000000) * (1 << tb)) // 1800000000
    out = []
    for c in range(chars):
        v = 0
        for i in range(5):
            b = 5 * c + i
            if b % 2 == 0:
                bitv = (ub >> (lb - 1 - b // 2)) & 1
            else:
                bitv = (vb >> (tb - 1 - (b - 1) // 2)) & 1
            v = (v << 1) | bitv
        out.append(_GEOHASH32[v])
    return "".join(out)


def _run(spark, pts, chars=9):
    df = spark.createDataFrame(
        pts, "doc_id long, lat_i long, lon_i long"
    )
    rows = with_geohash(df, chars=chars).collect()
    return {r["doc_id"]: r["geohash"] for r in rows}


def test_published_vectors(spark):
    # 57.64911, 10.40744 -> u4pruydqqvj (the canonical geohash
    # example); equator/prime-meridian -> s000...
    got = _run(
        spark,
        [(1, 576491100, 104074400), (2, 0, 0)],
        chars=9,
    )
    assert got[1] == "u4pruydqq"
    assert got[2] == "s00000000"


def test_randomized_vs_python_replay(spark):
    rng = random.Random(134)
    pts = [
        (
            i,
            rng.randrange(-900000000, 900000001),
            rng.randrange(-1800000000, 1799999999),
        )
        for i in range(300)
    ]
    for chars in (5, 9):
        got = _run(spark, pts, chars=chars)
        for doc_id, lat_i, lon_i in pts:
            assert got[doc_id] == _gh(lat_i, lon_i, chars), (
                doc_id,
                lat_i,
                lon_i,
            )


def test_prefix_property(spark):
    # the 5-char geohash is always a prefix of the 9-char one —
    # the property hierarchical geo-joins rely on
    rng = random.Random(7)
    pts = [
        (
            i,
            rng.randrange(-900000000, 900000001),
            rng.randrange(-1800000000, 1799999999),
        )
        for i in range(50)
    ]
    g5 = _run(spark, pts, chars=5)
    g9 = _run(spark, pts, chars=9)
    for i in g5:
        assert g9[i].startswith(g5[i])
