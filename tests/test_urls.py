"""canonicalize_url / url_dedup_latest unit behavior: the RFC 3986
normalizations, idempotence, and latest-crawl-wins selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.operators.urls import canonicalize_url, url_dedup_latest

CASES = [
    # (raw, canonical)
    ("https://Example.COM/a", "https://example.com/a"),
    ("HTTPS://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/a//", "https://example.com/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    (
        "HTTPS://User.Host9.Example.COM:443/p/7/?z=1&a=2#s",
        "https://user.host9.example.com/p/7?a=2&z=1",
    ),
]


def test_canonical_forms(spark):
    df = spark.createDataFrame(
        [(r, c) for r, c in CASES], ["raw", "expected"]
    )
    got = df.select(
        "expected", canonicalize_url(F.col("raw")).alias("canon")
    ).collect()
    for row in got:
        assert row.canon == row.expected, row


def test_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["raw"])
    once = df.select(canonicalize_url(F.col("raw")).alias("c1"))
    twice = once.select(
        "c1", canonicalize_url(F.col("c1")).alias("c2")
    )
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


DOMAIN_CASES = [
    ("host3.example.com", "example.com"),
    ("www.host3.example.com", "example.com"),
    ("host3.co.uk", "host3.co.uk"),
    ("www.host3.co.uk", "host3.co.uk"),
    ("deep.sub.host3.co.uk", "host3.co.uk"),
    ("host3.org", "host3.org"),
    ("localhost", "localhost"),
    ("192.168.0.1", "192.168.0.1"),
]


def test_registered_domain(spark):
    from osmgraft.operators.urls import registered_domain

    df = spark.createDataFrame(DOMAIN_CASES, ["host", "expected"])
    for row in df.select(
        "expected", registered_domain(F.col("host")).alias("got")
    ).collect():
        assert row.got == row.expected, row


def test_latest_crawl_wins(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/x", 10, "old"),
            ("HTTPS://A.com:443/x/", 20, "new"),
            ("https://b.com/y#f", 5, "only"),
        ],
        ["url", "warc_ts", "body"],
    )
    out = {
        r.url_canon: r
        for r in url_dedup_latest(df, ts_col="warc_ts").collect()
    }
    assert out["https://a.com/x"].body == "new"
    assert out["https://a.com/x"].n_crawls == 2
    assert out["https://a.com/x"].last_ts == 20
    assert out["https://b.com/y"].body == "only"
    assert out["https://b.com/y"].n_crawls == 1
