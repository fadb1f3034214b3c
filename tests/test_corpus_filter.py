"""corpus_filter_verdict behavior on planted documents: each rule
trips independently and only the clean keeper survives."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.operators.text import corpus_filter_verdict

# long, English, and non-repetitive: every 3-gram is unique
GOOD = " ".join(
    t for i in range(80) for t in ("the", f"w{i}", f"x{i}")
)
# identical first 40 chars -> identical fingerprint for the dup pair
DUP_PREFIX = "the shared forty character prefix abcdefgh "


def test_each_rule_trips(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD),
            (2, "der hund der katze der maus " * 20),   # German
            (3, "the fox"),                              # short
            (4, "the fox runs " * 40),                   # repetitive
            (5, DUP_PREFIX + GOOD[:300]),
            (6, DUP_PREFIX + GOOD[300:600]),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in corpus_filter_verdict(docs).collect()}

    assert out[1].keep
    assert not out[2].lang_ok and not out[2].keep
    assert not out[3].len_ok and not out[3].keep
    assert not out[4].rep_ok and not out[4].keep
    # 5 and 6 share the first-40-char fingerprint: min doc_id wins
    assert out[5].dedup_ok and out[5].keep
    assert not out[6].dedup_ok and not out[6].keep


def test_all_rules_boolean_columns(spark):
    docs = spark.createDataFrame([(1, GOOD)], ["doc_id", "text"])
    row = corpus_filter_verdict(docs).collect()[0]
    assert set(row.asDict()) == {
        "doc_id", "lang_ok", "len_ok", "rep_ok", "dedup_ok", "keep"
    }
