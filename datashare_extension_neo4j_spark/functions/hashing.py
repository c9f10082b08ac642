"""Deterministic entity-node IDs.

The reference keys entity nodes on sha256 of the *Python tuple repr*
``str((mention_norm, category))`` (reference
neo4j-app/neo4j_app/core/elasticsearch/to_neo4j.py:196-201). ID parity
therefore requires reproducing CPython's repr byte-for-byte.

``entity_id`` is a complete JVM-side implementation (no Python in the
plan). CPython's ``repr`` for str is tiered here:

  * no ``'``, ``\\`` or non-printable → ``'s'`` (plain concat)
  * has ``'`` but no ``"`` (and otherwise clean) → ``"s"``
  * both quote types (otherwise clean) → ``'`` delimiter with ``'``
    escaped (``regexp_replace``)
  * any ``\\`` / non-printable → per-codepoint escape via
    ``regexp_extract_all('(?s).')`` + ``transform``: ``\\\\  \\t \\n
    \\r`` specials, then ``\\xNN`` / ``\\uNNNN`` / ``\\UNNNNNNNN`` by
    codepoint width (``ascii()`` returns the full code point; the
    ``(?s).`` Java pattern matches one code point incl. astral pairs)

"Non-printable" follows ``str.isprintable``: Unicode categories
Cc/Cf/Cs/Co/Cn/Zl/Zp and Zs-except-space — expressed with Java regex
category classes. Known caveat: the JVM and CPython may carry different
Unicode *versions*, so a codepoint assigned in one and unassigned (Cn)
in the other diverges; this affects only codepoints added between the
two Unicode versions.

``entity_id_exact`` (Arrow-batched CPython repr) is retained as the
test oracle for the JVM expression — see
tests/test_entity_id.py adversarial equivalence.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# chars that force the per-codepoint escape path: backslash or anything
# str.isprintable() rejects
_HEAVY_RE = (
    "[\\\\\\p{Cc}\\p{Cf}\\p{Cs}\\p{Co}\\p{Cn}\\p{Zl}\\p{Zp}]|[\\p{Zs}&&[^ ]]"
)
# single-char form of the same class (space excluded via the when-chain)
_NONPRINT_CHAR_RE = (
    "^[\\p{Cc}\\p{Cf}\\p{Cs}\\p{Co}\\p{Cn}\\p{Zl}\\p{Zp}\\p{Zs}]$"
)


def py_repr(s: Column) -> Column:
    """CPython ``repr(s)`` for a string column, byte-for-byte."""
    has_sq = s.contains("'")
    has_dq = s.contains('"')
    dq_delim = has_sq & ~has_dq  # repr switches to " delimiters
    light = (
        F.when(~has_sq, F.concat(F.lit("'"), s, F.lit("'")))
        .when(dq_delim, F.concat(F.lit('"'), s, F.lit('"')))
        # both quote types: ' delimiter, only ' is escaped
        .otherwise(
            F.concat(F.lit("'"), F.regexp_replace(s, "'", "\\\\'"), F.lit("'"))
        )
    )
    quote = F.when(dq_delim, F.lit('"')).otherwise(F.lit("'"))

    def esc(c: Column) -> Column:
        cp = F.ascii(c)
        hexesc = (
            F.when(cp < 0x100, F.format_string("\\x%02x", cp))
            .when(cp < 0x10000, F.format_string("\\u%04x", cp))
            .otherwise(F.format_string("\\U%08x", cp))
        )
        return (
            F.when(c == F.lit("\\"), F.lit("\\\\"))
            .when(c == quote, F.concat(F.lit("\\"), c))
            .when(c == F.lit("\t"), F.lit("\\t"))
            .when(c == F.lit("\n"), F.lit("\\n"))
            .when(c == F.lit("\r"), F.lit("\\r"))
            .when(c == F.lit(" "), c)
            .when(c.rlike(_NONPRINT_CHAR_RE), hexesc)
            .otherwise(c)
        )

    heavy_body = F.array_join(
        F.transform(F.regexp_extract_all(s, F.lit("(?s)."), 0), esc), ""
    )
    heavy = F.concat(quote, heavy_body, quote)
    return F.when(s.rlike(_HEAVY_RE), heavy).otherwise(light)


def entity_id(mention_norm: Column, category: Column) -> Column:
    """sha256(str((mentionNorm, category))) — exact CPython tuple-repr
    parity for arbitrary strings, fully JVM-side."""
    return F.sha2(
        F.concat(
            F.lit("("),
            py_repr(mention_norm),
            F.lit(", "),
            py_repr(category),
            F.lit(")"),
        ),
        256,
    )


def _entity_id_exact_pd(norms: pd.Series, cats: pd.Series) -> pd.Series:
    out = []
    for n, c in zip(norms, cats):
        h = hashlib.sha256()
        h.update(str((n, c)).encode("utf-8"))
        out.append(h.hexdigest())
    return pd.Series(out)


entity_id_exact = F.pandas_udf(_entity_id_exact_pd, T.StringType())


def make_entity_id(mention_norm: str, category: str) -> str:
    """Driver-side twin for goldens/tests."""
    h = hashlib.sha256()
    h.update(str((mention_norm, category)).encode("utf-8"))
    return h.hexdigest()
