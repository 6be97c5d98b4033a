"""PII detection and redaction for training-data curation.

Web-crawled corpora carry emails, phone numbers, and bare IP
addresses that a training pipeline must count (for corpus audits) and
scrub (for the training mix) before packing. This implements both as
pure JVM column expressions — ``regexp_count`` for the audit columns
and a fixed-order ``regexp_replace`` chain for the scrub — so the
whole stage is a narrow projection: no shuffle, no Python workers,
whole-stage-codegen friendly, and it composes with the dedup/quality
operators over the same ``documents`` table.

Pattern dialect note (this is the load-bearing constraint): the
patterns below restrict themselves to the syntax that Java's regex
engine (Spark) and RE2 (DuckDB, the correctness oracle) interpret
IDENTICALLY — character classes, bounded repetition, non-capturing
groups, and the ASCII word boundary ``\\b``. No lookaround, no
backreferences (RE2 has neither). That keeps the cross-engine oracle
exact on both the counts and the redacted text bytes.

Redaction order is fixed (email, then phone, then IPv4) and must be
applied in the same order by any oracle: the classes cannot overlap
as written (an email needs an alphabetic TLD, a phone match needs
separators an IPv4 lacks), but pinning the order makes the
composition trivially deterministic rather than provably so.

Reference parity note: the reference engine (a crawler) has no PII
stage; this operator is part of the training-data pipeline surface
built over the same tables (like ``operators/sampling.py`` and
``operators/packing.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# RE2/Java common-dialect patterns — see module docstring before
# touching these. \\b is the ASCII word boundary in both engines.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

# (pattern, replacement) in the pinned application order.
REDACTIONS = (
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
    (IPV4_RE, "[IP]"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row occurrence counts of each PII class, as long columns
    (``regexp_count`` is a JVM expression; cast pins the type the
    cross-engine oracle's ``len(regexp_extract_all(..))`` returns)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)).cast("long"),
        "n_ips": F.regexp_count(text, F.lit(IPV4_RE)).cast("long"),
    }


def redact(text: Column) -> Column:
    """The fixed-order scrub: every match of every class replaced by
    its placeholder (Spark's ``regexp_replace`` is replace-all)."""
    out = text
    for pat, rep in REDACTIONS:
        out = F.regexp_replace(out, pat, rep)
    return out


def scrub_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Audit + scrub over a documents table: returns
    ``(id_col, n_emails, n_phones, n_ips, redacted)`` — one narrow
    JVM projection, no shuffle."""
    text = F.col(text_col)
    counts = pii_counts(text)
    return docs.select(
        id_col,
        *(c.alias(n) for n, c in counts.items()),
        redact(text).alias("redacted"),
    )
