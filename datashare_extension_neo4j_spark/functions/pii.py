"""PII detection / redaction over text columns — the scrubbing stage a
webtext training-data pipeline runs before tokenization (emails, IPv4
addresses, phone numbers → typed placeholders). LLM-pipeline extension
beyond the reference surface; the reference has no PII handling.

All patterns live in the Java-regex ∩ RE2 common subset (character
classes, bounded repetition, non-capturing groups, ASCII ``\\b``) so a
DuckDB oracle replays byte-identical matches, and the REPLACEMENTS
contain no backreferences (Java spells them ``$1``, RE2 ``\\1`` — any
backref would diverge across engines). Everything is
``regexp_extract_all`` / ``regexp_replace`` on JVM expressions —
whole-stage codegen, zero shuffle, the scan-shaped stage it must be at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
PHONE_RE = r"\+?\d{1,2} \d{3}-\d{3}-\d{4}"

# (pattern, placeholder) in redaction order. The order is part of the
# semantics: an earlier replacement can create or destroy the \b
# word-boundary context a later pattern needs (e.g. the '>' of
# '<EMAIL>' opens a boundary the original text may not have had), so
# match counts are only meaningful against the text each rule actually
# saw — `staged_pii_counts` counts exactly what `redact_pii` replaces.
PII_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def pii_count(text: Column, pattern: str) -> Column:
    """Number of matches of one PII pattern in the given text (long).
    NOTE: counts against THIS text — for counts consistent with the
    full redaction chain use ``staged_pii_counts``."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast(
        "long"
    )


def staged_pii_counts(text: Column) -> list[Column]:
    """Per-rule match counts consistent with ``redact_pii`` BY
    CONSTRUCTION: rule i is counted on the text after rules 0..i-1
    were applied — i.e. each count is exactly the number of
    placeholders that rule contributes to the redacted output.
    Returns one column per PII_RULES entry, in order."""
    counts = []
    cur = text
    for pattern, placeholder in PII_RULES:
        counts.append(pii_count(cur, pattern))
        cur = F.regexp_replace(cur, pattern, placeholder)
    return counts


def redact_pii(text: Column) -> Column:
    """Replace every match of every rule with its typed placeholder."""
    out = text
    for pattern, placeholder in PII_RULES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out
