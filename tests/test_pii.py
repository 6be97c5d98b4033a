"""PII detect/redact vs literal expectations and a Python-re oracle.

The cross-engine (DuckDB) parity is the driver's job
(`text_pii_redact`); here we pin the operator's own semantics: what
counts as a match, the replace-all behavior, the pinned redaction
order, and that the patterns stay inside the Java/RE2 common dialect
(Python's `re` implements the same constructs, so it serves as a
third independent engine for the fuzz rows).
"""

import re

import pytest

from methanol_web_crawler_spark.operators.pii import (
    EMAIL_RE, IPV4_RE, PHONE_RE, REDACTIONS, scrub_documents,
)

ROWS = [
    # (id, text, n_emails, n_phones, n_ips, redacted)
    (1, "mail bob.smith+tag@corp.example.com now",
     1, 0, 0, "mail [EMAIL] now"),
    (2, "call 555-867-5309 or 555.867.5309",
     0, 2, 0, "call [PHONE] or [PHONE]"),
    (3, "host 192.168.0.1 peer 10.0.0.254",
     0, 0, 2, "host [IP] peer [IP]"),
    # multi-class in one row; email eats its own digits before the
    # phone/ip passes run (pinned order)
    (4, "a1@b.cd 555-123-4567 1.2.3.4",
     1, 1, 1, "[EMAIL] [PHONE] [IP]"),
    # non-matches: no TLD, 2-digit groups, trailing dot keeps \b off
    (5, "x@y 55-12-34 1.2.3. end", 0, 0, 0, "x@y 55-12-34 1.2.3. end"),
    # bare dotted quads match by design (indistinguishable from IPs
    # without lookaround, which RE2 lacks) ...
    (6, "release 1.2.3.4 shipped", 0, 0, 1, "release [IP] shipped"),
    # ... but a glued version tag does NOT: 'v' and '1' are both word
    # chars, so \b rejects the start and no later start has 3 dots
    (7, "v1.2.3.4 shipped", 0, 0, 0, "v1.2.3.4 shipped"),
    (8, "", 0, 0, 0, ""),
]


def _py_redact(s: str) -> str:
    for pat, rep in REDACTIONS:
        s = re.sub(pat, rep, s)
    return s


def test_scrub_matches_literal_expectations(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in ROWS], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in scrub_documents(df).collect()
    }
    for i, text, ne, np_, ni, red in ROWS:
        r = got[i]
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (ne, np_, ni), text
        assert r["redacted"] == red, text


def test_python_re_agrees_on_fuzz_rows(spark):
    # the same patterns under Python's re must produce the same
    # redaction — three engines agreeing (Java here, RE2 via the
    # driver oracle, re here) is strong evidence the patterns sit in
    # the common dialect
    fuzz = [
        "a@b.co c@d.ef 1.1.1.1 222-333-4444",
        "edge@case.io.",  # trailing dot after TLD
        "10.0.0.1:8080 port suffix",
        "not 1234-567-8901 a phone? 4-digit first group",
        "a_b%c+d@ex-ample.org mixed",
    ]
    df = spark.createDataFrame(
        list(enumerate(fuzz)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r["redacted"] for r in scrub_documents(df).collect()}
    for i, s in enumerate(fuzz):
        assert got[i] == _py_redact(s), s


def test_counts_are_longs(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    sch = {f.name: f.dataType.simpleString() for f in scrub_documents(df).schema}
    assert sch["n_emails"] == sch["n_phones"] == sch["n_ips"] == "bigint"
    assert sch["redacted"] == "string"
