"""conflate_places and crawl_plan: transitive-merge semantics,
name-key isolation, radius edge, and politeness-round arithmetic."""

from __future__ import annotations

from osmgraft.operators.conflate import conflate_places
from osmgraft.operators.urls import crawl_plan


def test_conflate_transitive_and_key_isolated(spark):
    R = 1_000_000
    rows = [
        # chain a(1)-a(2)-a(3): 1-2 and 2-3 within R, 1-3 beyond ->
        # still one component (transitive contract)
        (1, "cafe", 0, 0),
        (2, "cafe", 0, 900_000),
        (3, "cafe", 0, 1_800_000),
        # same spot, different name key: never merges
        (4, "bar", 0, 0),
        # same key, exactly R away from 1 (<= gate: merges)
        (5, "cafe", 0, -1_000_000),
        # same key, R+1 away from 5: isolated singleton
        (6, "cafe", 0, -2_000_001),
        # far-away singleton
        (7, "inn", 5_000_000, 5_000_000),
    ]
    df = spark.createDataFrame(
        rows, "place_id long, name_key string, lat_i long, lon_i long"
    )
    got = {
        r.place_id: r.canonical
        for r in conflate_places(df, radius_fix=R).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 1, 6: 6, 7: 7}


def test_crawl_plan_rounds(spark):
    rows = [
        (f"https://h1.org/{i}",) for i in range(7)
    ] + [("https://h2.org/x",)]
    df = spark.createDataFrame(rows, "url string")
    got = {
        r.url: (r.host, r.slot, r.round, r.n_rounds)
        for r in crawl_plan(df, per_round=3).collect()
    }
    # h1: 7 urls -> rounds 0,0,0,1,1,1,2; n_rounds = 3
    for i in range(7):
        host, slot, rnd, n = got[f"https://h1.org/{i}"]
        assert (host, slot, rnd, n) == ("h1.org", i + 1, i // 3, 3)
    assert got["https://h2.org/x"] == ("h2.org", 1, 0, 1)
