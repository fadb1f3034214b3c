"""crawl_frontier_plan: composition order — robots denial excludes
a URL from trap statistics; traps drop allowed URLs before rounds
are assigned."""

from __future__ import annotations

from osmgraft.pipeline import crawl_frontier_plan


def test_crawl_pipeline_composition(spark):
    urls = spark.createDataFrame(
        # 5 calendar urls (trap at threshold 5) + 2 normal + 1 denied
        [(f"https://h.org/cal/{i}/x",) for i in range(5)]
        + [("https://h.org/a",), ("https://h.org/b",),
           ("https://h.org/private/1",)],
        "url string",
    )
    rules = spark.createDataFrame(
        [("h.org", "/", 1), ("h.org", "/private/", 0)],
        "host string, path_prefix string, allow long",
    )
    got = {
        r.url: (r.slot, r.round, r.n_rounds)
        for r in crawl_frontier_plan(
            urls, rules, trap_threshold=5, per_round=2
        ).collect()
    }
    # calendar template dropped as a trap, /private/1 robots-denied:
    # only /a and /b get scheduled, one round of two fetches
    assert got == {
        "https://h.org/a": (1, 0, 1),
        "https://h.org/b": (2, 0, 1),
    }

    # at threshold 6 the calendar is NOT a trap: all 7 allowed urls
    # schedule; /a sorts before /cal/* lexicographically
    got7 = {
        r.url: (r.slot, r.round, r.n_rounds)
        for r in crawl_frontier_plan(
            urls, rules, trap_threshold=6, per_round=2
        ).collect()
    }
    assert len(got7) == 7
    assert got7["https://h.org/a"] == (1, 0, 4)
    assert got7["https://h.org/cal/4/x"] == (7, 3, 4)
    assert all(v[2] == 4 for v in got7.values())
