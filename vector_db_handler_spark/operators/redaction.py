"""PII detection and redaction over document text.

No reference analog (the reference stores raw chunks verbatim,
``app/core/document_ingestor.py:89-144``); extension surface — any
corpus feeding a trained model needs a scrubbing pass for emails,
phone numbers, IP addresses and national-id-shaped tokens, both for
compliance and because memorized PII is a model-safety liability.

Spark-first shape: everything here is a narrow per-row projection of
built-in ``regexp_replace`` / ``regexp_count`` calls — whole-stage
codegen, zero shuffle, zero Python in the hot path.  At 100 TB the
scrubbing pass is scan-bound, exactly as it should be.

Pattern dialect: the patterns below deliberately restrict themselves
to the regex subset Java's engine (Spark) and RE2 (DuckDB, Go tooling)
interpret identically — character classes, bounded repetition, ``\\b``
word boundaries; no backreferences, no lookaround.  That keeps every
operator oracle-replayable and the patterns portable to whatever
engine audits the corpus later.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (class, pattern, replacement token) — ORDER MATTERS and is part of
#: the contract: ssn (3-2-4) before phone (3-3-4) is irrelevant as the
#: middle-group lengths differ, but email must precede ipv4 so a
#: digits-and-dots mail host is consumed as part of the email token.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts for one text column (before redaction)."""
    return {
        name: F.regexp_count(text, F.lit(pattern))
        for name, pattern, _ in PII_RULES
    }


def redact_text(text: Column) -> Column:
    """Apply every rule in order; each is a full-string global replace."""
    out = text
    for _, pattern, token in PII_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Adds ``out_col`` (scrubbed text) plus one ``n_<class>`` count
    column per rule.  Pure projection — composes with any downstream
    operator without changing partitioning."""
    out = docs
    for name, cnt in pii_counts(F.col(text_col)).items():
        out = out.withColumn(f"n_{name}", cnt)
    return out.withColumn(out_col, redact_text(F.col(text_col)))
