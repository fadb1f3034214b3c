"""personalized_pagerank and robots_gate: hand-computed integer
fixed points and robots precedence edge cases."""

from __future__ import annotations

from osmgraft.operators.linkgraph import personalized_pagerank
from osmgraft.operators.urls import robots_gate


def test_ppr_integer_exact(spark):
    # s -> a -> b, plus c isolated from the seed side (c -> s).
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("c", "s")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("s",)], "host string")
    got = {
        r.host: r.rank
        for r in personalized_pagerank(
            edges, seeds, iters=2, scale=100, damping_num=85,
            damping_den=100,
        ).collect()
    }
    # base = 100*15//100 = 15
    # r0: s=100, a=0, b=0, c=0
    # r1: s = 15 (seed base; c contributed 0)
    #     a = 85*100//100 = 85 ; b = 0 ; c = 0
    # r2: s = 15 ; a = 85*15//100 = 12 ; b = 85*85//100 = 72 ; c = 0
    assert got == {"s": 15, "a": 12, "b": 72, "c": 0}


def test_robots_gate_precedence(spark):
    urls = spark.createDataFrame(
        [
            ("https://h.org/doc/13x",),   # longest match /doc/13 -> allow
            ("https://h.org/doc/19",),    # /doc/1 -> deny
            ("https://h.org/about",),     # only '/' -> allow
            ("https://h.org/tie",),       # equal-length tie -> allow wins
            ("https://norules.org/x",),   # no rules for host -> allow
            ("https://h.org",),           # empty path -> '/'
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [
            ("h.org", "/", 1),
            ("h.org", "/doc/1", 0),
            ("h.org", "/doc/13", 1),
            ("h.org", "/tie", 0),
            ("h.org", "/ti", 1),
            ("h.org", "/tiex", 0),  # longer but non-matching
        ],
        "host string, path_prefix string, allow long",
    )
    got = {
        r.url: (r.path, r.matched_prefix, r.allow)
        for r in robots_gate(urls, rules).collect()
    }
    assert got["https://h.org/doc/13x"] == ("/doc/13x", "/doc/13", 1)
    assert got["https://h.org/doc/19"] == ("/doc/19", "/doc/1", 0)
    assert got["https://h.org/about"] == ("/about", "/", 1)
    # /tie matches '/tie'(deny,4) and '/ti'(allow,3) and '/'; the
    # longest is '/tie' -> deny (allow-wins applies only to EQUAL
    # length, which cannot happen with distinct prefixes) — document
    # the actual contract: longest wins outright here
    assert got["https://h.org/tie"] == ("/tie", "/tie", 0)
    assert got["https://norules.org/x"] == ("/x", None, 1)
    assert got["https://h.org"] == ("/", "/", 1)
