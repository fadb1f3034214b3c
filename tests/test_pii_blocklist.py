"""pii_scrub + blocklist_filter: redaction semantics, PSL-aware
blocking, and the map-only / broadcast-anti plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.operators.text import pii_scrub
from osmgraft.operators.urls import blocklist_filter


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-y.example.com and 10.0.0.1 now"),
            (2, "call 555-123-4567 or 555-000-1111"),
            (3, "no pii here at all"),
            (4, "two mails a@b.co c@d.org one ip 192.168.1.255"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in pii_scrub(df).collect()
    }
    assert rows[1].n_emails == 1 and rows[1].n_ipv4 == 1
    assert rows[1].scrubbed == "mail <EMAIL> and <IP> now"
    assert rows[2].n_phones == 2
    assert rows[2].scrubbed == "call <PHONE> or <PHONE>"
    assert (
        rows[3].n_emails == rows[3].n_ipv4 == rows[3].n_phones == 0
    )
    assert rows[3].scrubbed == "no pii here at all"
    assert rows[4].n_emails == 2 and rows[4].n_ipv4 == 1
    assert rows[4].scrubbed == "two mails <EMAIL> <EMAIL> one ip <IP>"


def test_pii_scrub_is_map_only(spark):
    df = spark.createDataFrame(
        [(1, "x@y.com")], "doc_id long, text string"
    )
    plan = _plan(pii_scrub(df))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_blocklist_drops_registered_domain_subdomains(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://www.bad.example.com/a"),
            (2, "https://deep.sub.bad.example.com/b"),
            (3, "https://good.example.org/c"),
            (4, "https://spam.co.uk/d"),
            (5, "https://ham.co.uk/e"),
        ],
        "doc_id long, url string",
    )
    # NOTE: 'example.com' is the eTLD+1 of every *.example.com host
    # (PSL-lite), so blocking it collapses all its subdomains
    bl = spark.createDataFrame(
        [("example.com",), ("Spam.CO.UK",)], "domain string"
    )
    kept = sorted(
        r.doc_id for r in blocklist_filter(pages, bl).collect()
    )
    assert kept == [3, 5]


def test_blocklist_is_broadcast_anti(spark):
    pages = spark.createDataFrame(
        [(1, "https://a.example.com/x")], "doc_id long, url string"
    )
    bl = spark.createDataFrame([("b.com",)], "domain string")
    plan = _plan(blocklist_filter(pages, bl))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # the pages side (printed before the BroadcastExchange subtree)
    # must not shuffle; the only exchange is the blocklist's own
    # distinct, under the broadcast
    pages_side = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in pages_side
    assert plan.count("Exchange hashpartitioning") == 1
