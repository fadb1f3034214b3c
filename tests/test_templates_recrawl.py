"""url_templates and recrawl_estimate: trap flagging, slot counts,
and all four revisit tiers on crafted crawl histories."""

from __future__ import annotations

from osmgraft.operators.urls import recrawl_estimate, url_templates


def test_url_templates_traps_and_slots(spark):
    urls = (
        [(f"https://t.org/cal/2024/{m}/{d}",) for m in range(1, 4)
         for d in range(1, 6)]          # 15 urls, one template
        + [("https://t.org/about",)]    # no digits, 1 url
        + [("https://u.org/item/7/view",)]
    )
    df = spark.createDataFrame(urls, "url string")
    got = {
        (r.host, r.template): (r.n_urls, r.n_slots, r.is_trap)
        for r in url_templates(df, trap_threshold=10).collect()
    }
    assert got[("t.org", "/cal/{n}/{n}/{n}")] == (15, 3, True)
    assert got[("t.org", "/about")] == (1, 0, False)
    assert got[("u.org", "/item/{n}/view")] == (1, 1, False)


def test_recrawl_tiers(spark):
    rows = (
        [("hot", k, str(k)) for k in range(5)]
        + [("once", k, "1" if k >= 2 else "0") for k in range(5)]
        + [("static", k, "x") for k in range(5)]
        + [("single", 0, "y")]
    )
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, fp string"
    )
    got = {
        r.url: (r.n_obs, r.n_changes, r.n_intervals, r.tier)
        for r in recrawl_estimate(df).collect()
    }
    assert got["hot"] == (5, 4, 4, 2)
    assert got["once"] == (5, 1, 4, 1)
    assert got["static"] == (5, 0, 4, 0)
    assert got["single"] == (1, 0, 0, 1)
