"""anchor_text_index: counts, per-host ranking with (cnt DESC,
term ASC) ties, top-N cut, and empty-anchor filtering."""

from __future__ import annotations

from osmgraft.operators.search import anchor_text_index


def test_anchor_text_ranking(spark):
    rows = [
        ("h1", "buy cheap"),
        ("h1", "buy now"),
        ("h1", "cheap deals"),
        ("h1", "zz top"),
        ("h2", ""),  # empty anchor contributes nothing
        ("h2", "solo"),
    ]
    df = spark.createDataFrame(
        rows, "dst_host string, anchor_text string"
    )
    got = {
        (r.host, r.rank): (r.term, r.cnt)
        for r in anchor_text_index(df, top_n=3).collect()
    }
    # h1 counts: buy=2, cheap=2, deals=1, now=1, top=1, zz=1
    assert got[("h1", 1)] == ("buy", 2)
    assert got[("h1", 2)] == ("cheap", 2)
    assert got[("h1", 3)] == ("deals", 1)  # tie at 1 -> term ASC
    assert got[("h2", 1)] == ("solo", 1)
    assert len([k for k in got if k[0] == "h1"]) == 3  # cut at N
    assert len([k for k in got if k[0] == "h2"]) == 1
