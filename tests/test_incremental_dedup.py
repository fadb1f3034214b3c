"""Cross-snapshot incremental near-dedup (dedup.incremental_near_dups):
batch-vs-corpus LSH index probe + exact-Jaccard verification.

Reference parity note: osmctools has no corpus dedup; this is the
LLM-pipeline extension surface (snapshot-over-snapshot dedup). The
small-scale truth twin is text.ngram_jaccard_pairs (all-pairs exact
Jaccard) restricted to cross-snapshot pairs that share >= 1 band.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.dedup import (
    incremental_near_dups,
    minhash_bands,
    minhash_lsh_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far "
    "away into the green forest tonight under a pale cold moon"
)
OTHER = (
    "completely different words describing unrelated topics like "
    "databases query engines caching layers and storage formats"
)


@pytest.fixture(scope="module")
def snapshots(spark):
    corpus = spark.createDataFrame(
        [(1, BASE), (2, OTHER), (3, BASE.replace("green", "blue"))],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (101, "dup " + BASE),          # near-dup of corpus 1 (and 3)
            (102, "fresh unseen content about sailing boats across "
                  "wide oceans with steady winds and bright stars"),
            (103, OTHER + " extra"),        # near-dup of corpus 2
        ],
        "doc_id long, text string",
    )
    return corpus, batch


def test_planted_dups_recalled(spark, snapshots):
    corpus, batch = snapshots
    got = {
        (r["batch_doc"], r["corpus_doc"])
        for r in incremental_near_dups(corpus, batch).collect()
    }
    assert (101, 1) in got
    assert (103, 2) in got
    # the fresh doc matches nothing
    assert not any(a == 102 for a, _ in got)


def test_sides_disjoint_and_thresholded(spark, snapshots):
    corpus, batch = snapshots
    rows = incremental_near_dups(corpus, batch).collect()
    for r in rows:
        assert r["batch_doc"] >= 100   # left side is always batch
        assert r["corpus_doc"] < 100   # right side is always corpus
        assert r["jaccard"] >= 0.5


def test_matches_self_join_restricted_to_cross_pairs(
    spark, snapshots
):
    """On the union snapshot, the incremental result must equal the
    classic self-join pipeline (minhash_lsh_pairs -> exact Jaccard)
    filtered to batch x corpus pairs: probing a stored index is a
    restriction of the self-join, never a different answer."""
    from osmgraft.operators.dedup import jaccard_on_candidates

    corpus, batch = snapshots
    union = corpus.unionByName(batch)
    cand = minhash_lsh_pairs(union)
    full = {
        (r["b"], r["a"], r["inter"], round(r["jaccard"], 9))
        for r in jaccard_on_candidates(
            union, cand, threshold=0.5
        ).collect()
        # self-join emits a < b, so batch (large ids) lands in b
        if r["a"] < 100 <= r["b"]
    }
    inc = {
        (
            r["batch_doc"],
            r["corpus_doc"],
            r["inter"],
            round(r["jaccard"], 9),
        )
        for r in incremental_near_dups(corpus, batch).collect()
    }
    assert inc == full


def test_bands_are_index_shaped(spark, snapshots):
    corpus, _ = snapshots
    rows = minhash_bands(corpus, n_hashes=12, band_rows=2).collect()
    # 6 bands per doc, each a 2-sig concatenation
    assert len(rows) == 3 * 6
    assert {r["band_idx"] for r in rows} == set(range(6))
    for r in rows:
        assert r["band_val"].count("|") == 1
