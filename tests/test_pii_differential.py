"""Differential: pii_scrub (java.util.regex inside Catalyst) vs a
pure-Python `re` twin of the same patterns, over adversarial and
seeded-random inputs — catches regex-dialect drift between the
JVM, RE2 (the DuckDB oracle), and Python."""

from __future__ import annotations

import random
import re

from osmgraft.operators.text import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    pii_scrub,
)

ADVERSARIAL = [
    "",
    "@@",
    "a@b",
    "a@b.co",
    "a@b.co.uk 1.2.3.4",
    "1.2.3.4.5",
    "..",
    "a@1.2.3.4",
    "x 999.999.999.999 y",
    "123-456-7890x",
    "555-123-45678",
    "call 555-123-4567.",
    "a.b+c_d%e@f-g.hi",
    "trailing dot a@b.com.",
    "ip at end 10.0.0.1",
    "10.0.0.1 at start",
    "a@b.com a@b.com a@b.com",
    "- 1-2-3 -",
    " @x.com",
    "no-reply@sub.domain.example.travel",
]

ALPHABET = (
    "abcdefgHIJKLM0123456789@.-_%+ \t" "@@..--  55-"
)


def _python_twin(s: str):
    n_e = len(re.findall(PII_EMAIL_RE, s))
    n_i = len(re.findall(PII_IPV4_RE, s))
    n_p = len(re.findall(PII_PHONE_RE, s))
    out = re.sub(PII_EMAIL_RE, "<EMAIL>", s)
    out = re.sub(PII_IPV4_RE, "<IP>", out)
    out = re.sub(PII_PHONE_RE, "<PHONE>", out)
    return n_e, n_i, n_p, out


def test_matches_python_re_on_adversarial_and_random(spark):
    rng = random.Random(20260817)
    cases = list(ADVERSARIAL)
    for _ in range(300):
        n = rng.randint(0, 60)
        cases.append(
            "".join(rng.choice(ALPHABET) for _ in range(n))
        )
    df = spark.createDataFrame(
        list(enumerate(cases)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_emails, r.n_ipv4, r.n_phones, r.scrubbed)
        for r in pii_scrub(df).collect()
    }
    mismatches = []
    for i, s in enumerate(cases):
        want = _python_twin(s)
        if got[i] != want:
            mismatches.append((s, got[i], want))
    assert not mismatches, mismatches[:5]
