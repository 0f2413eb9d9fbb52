"""PII detection and redaction over document text.

The scrub step every LLM training-data pipeline runs before tokenizing
a crawl (public practice: C4/The Pile/RefinedWeb all strip emails,
phone numbers, IPs; the reference has no documents plane — this is
beyond-reference surface). Pure built-in regexp expressions — JVM-side
codegen, no UDF — so the scan is a single projection over the corpus
and scales as a map-only stage.

Pattern dialect constraint: every pattern must mean the same thing to
Java regex (Spark) and RE2 (DuckDB oracles) — no lookarounds, no
backrefs, ASCII classes and ``\\b`` only. That keeps each operator
SQL-witnessable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: redaction applies in this sequence (no pattern matches
# another's replacement token, so order only matters for overlaps —
# ssn/phone/ipv4 are mutually exclusive shapes, email requires '@').
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "[EMAIL]",
    "ssn": "[SSN]",
    "phone": "[PHONE]",
    "ipv4": "[IP]",
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-row match counts for every PII type — ``size(
    regexp_extract_all(...))``, one codegen'd projection per type."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }


def redact(col: Column, types: list[str] | None = None) -> Column:
    """Replace every PII match with its bracketed token, in the fixed
    PII_PATTERNS order (deterministic output; DuckDB equivalent is the
    same chain of ``regexp_replace(..., 'g')``)."""
    out = col
    for name in types or list(PII_PATTERNS):
        out = F.regexp_replace(
            out, PII_PATTERNS[name], REDACTION_TOKENS[name]
        )
    return out


def redact_sql(expr: str, types: list[str] | None = None) -> str:
    """The DuckDB transcription of :func:`redact` over ``expr`` —
    generated from the SAME pattern table so the two engines cannot
    drift."""
    out = expr
    for name in types or list(PII_PATTERNS):
        pat = PII_PATTERNS[name].replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{REDACTION_TOKENS[name]}', 'g')"
    return out


def counts_sql(expr: str) -> dict[str, str]:
    """DuckDB transcriptions of :func:`pii_counts` over ``expr``."""
    return {
        name: f"len(regexp_extract_all({expr}, '{pat}'))"
        for name, pat in PII_PATTERNS.items()
    }
