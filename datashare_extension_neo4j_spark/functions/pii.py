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

# (pattern, placeholder) in redaction order. Placeholders are
# letter-only, so no later pattern can match inside an earlier
# replacement — the chain is order-insensitive, but the fixed order
# keeps Spark and the oracle byte-identical by construction.
PII_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def pii_count(text: Column, pattern: str) -> Column:
    """Number of matches of one PII pattern (long)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast(
        "long"
    )


def redact_pii(text: Column) -> Column:
    """Replace every match of every rule with its typed placeholder."""
    out = text
    for pattern, placeholder in PII_RULES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out
