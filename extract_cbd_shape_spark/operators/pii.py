"""PII detection and redaction over a text column (JVM-side regex).

Training corpora scraped from the web carry emails, phone numbers, and
host addresses that must be scrubbed before the text is used. Both
operators here are pure column expressions — ``regexp_count`` /
``regexp_replace`` run inside whole-stage codegen, so at 100 TB the
redaction fuses into the scan stage with zero shuffle and zero Python.

The patterns are written in the common subset of Java regex (Spark)
and RE2 (the DuckDB oracle): no backreferences, no lookaround, ASCII
word boundaries only — so the oracle mirrors match-for-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: emails first (their local part can contain digits/dots that
# the looser patterns below would otherwise chew on), then IPv4, then
# phone numbers.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2} \d{3}-\d{4}", "<PHONE>"),
]


def pii_count_columns(text: Column) -> dict:
    """``{kind: Column}`` — number of non-overlapping matches of each
    PII pattern in the ORIGINAL text (counts are independent per kind;
    counting happens before any redaction)."""
    return {
        kind: F.regexp_count(text, F.lit(pat))
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder,
    applied in PII_PATTERNS order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_documents(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_<kind>... , clean_text) for every document. Map-side
    only: the plan is a single Project over the scan."""
    text = F.col(text_col)
    counts = pii_count_columns(text)
    return docs.select(
        F.col(id_col),
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        redact_pii(text).alias("clean_text"),
    )
