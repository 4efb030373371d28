"""PII detection and redaction — column expressions, no UDFs.

Training-data pipelines scrub personally identifiable information
before anything else touches the text (emails, phone numbers, IP
addresses, SSNs are the standard regex-detectable classes). The
reference sanitizes inbound query text (`alma/slice.py` analog:
injection guards); corpus-side PII scrubbing is the training-data
generalization of the same hygiene stage.

Every pattern stays inside the Java-regex/RE2 common subset (no
lookaround, no backreferences — the same discipline as TOKEN_RE in
functions/text.py), so the DuckDB oracle replays detection and
redaction verbatim. Counting is `regexp_count` (JVM, codegen'd);
redaction is a chained `regexp_replace` in a FIXED pattern order so
both engines produce byte-identical redacted text.

At 100 TB this whole stage is a narrow map over the scan — no shuffle,
no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_count", "redact_pii", "sql_pii_count", "sql_redact_pii"]

#: ordered (kind, pattern, replacement): redaction applies in THIS
#: order on both engines. The classes are disjoint by construction
#: (ssn is 3-2-4 digits, phone needs a 3-digit middle group; ipv4
#: octets are 1-3 digits so a phone's trailing \d{4} can never match
#: one), so order only matters for byte-stability, not semantics.
#:
#: Phone formats ACCEPTED (ADVICE r7 #3 — exact contract): NANP 3-3-4
#: with '-', '.', or ' ' separators, an optional parenthesized area
#: code `(415) 555-1234` / `(415)555-1234`, and an optional `+1`
#: prefix with any of the same separators. NOT matched (documented
#: out of scope): fully unseparated runs (`+14155551234` — 10-digit
#: runs are indistinguishable from ids/order numbers), extensions,
#: and non-NANP international formats.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"(\+1[-. ]?)?(\(\d{3}\)[-. ]?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
]

_BY_KIND = {k: (p, r) for k, p, r in PII_PATTERNS}


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII class in the column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(_BY_KIND[kind][0]))


def redact_pii(col: Column | str) -> Column:
    """Replace every PII span with its class placeholder, all classes,
    fixed order."""
    c = F.col(col) if isinstance(col, str) else col
    for _kind, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def _sql_escape(pattern: str) -> str:
    return pattern.replace("'", "''")


def sql_pii_count(expr: str, kind: str) -> str:
    """DuckDB mirror of pii_count."""
    return f"len(regexp_extract_all({expr}, '{_sql_escape(_BY_KIND[kind][0])}'))"


def sql_redact_pii(expr: str) -> str:
    """DuckDB mirror of redact_pii (same fixed order)."""
    out = expr
    for _kind, pattern, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{_sql_escape(pattern)}', '{repl}', 'g')"
    return out
