"""containment_on_rare_grams: planted snippets must be recovered
with containment 1.0 even when Jaccard is far below the LSH-useful
range, the df cap must suppress boilerplate-only pairs, and scores
must match a brute-force gram-set computation."""

from __future__ import annotations

from osmgraft.operators.dedup import containment_on_rare_grams


def _grams(text, n=3):
    toks = text.split(" ")
    lo = max(len(toks) - (n - 1), 1)
    return {" ".join(toks[i : i + n]) for i in range(lo)}


def test_snippet_inside_page(spark):
    words = [f"w{i}" for i in range(120)]
    page = " ".join(words)
    snippet = " ".join(words[40:52])  # 12 of 120 words
    other = " ".join(f"z{i}" for i in range(80))
    df = spark.createDataFrame(
        [(1, page), (2, snippet), (3, other)],
        "doc_id long, text string",
    )
    rows = containment_on_rare_grams(df).collect()
    got = {(r.a, r.b): (r.inter, r.containment) for r in rows}
    assert set(got) == {(1, 2)}
    inter, cont = got[(1, 2)]
    ga, gs = _grams(page), _grams(snippet)
    assert inter == len(ga & gs)
    assert cont == 1.0
    # sanity: this pair is invisible to Jaccard at any LSH threshold
    assert len(ga & gs) / len(ga | gs) < 0.1


def test_df_cap_blocks_boilerplate(spark):
    # ten docs sharing ONLY a boilerplate sentence: every shared
    # gram has df=10 > max_df=5, so no candidates survive
    boiler = "all rights reserved contact us for details"
    rows = [
        (i, f"unique{i} body{i} text{i} " + boiler) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert containment_on_rare_grams(df, max_df=5).count() == 0
    # raising the cap makes them visible again (threshold lowered:
    # the unique bridge grams dilute containment to 5/8)
    assert (
        containment_on_rare_grams(df, max_df=20, threshold=0.5).count()
        > 0
    )
