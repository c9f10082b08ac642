"""Deterministic entity-node IDs.

The reference keys entity nodes on sha256 of the *Python tuple repr*
``str((mention_norm, category))`` (reference
neo4j-app/neo4j_app/core/elasticsearch/to_neo4j.py:196-201). ID parity
therefore requires reproducing CPython's repr byte-for-byte.

``entity_id`` is the JVM-side fast path: for strings containing no
single quote, backslash, or non-printable character, ``repr(s)`` is
exactly ``'s'`` and the tuple repr is ``('a', 'b')`` — expressible with
``concat`` + ``sha2`` and fully codegen'd. ``entity_id_exact`` is the
Arrow-batched exact path for arbitrary strings (uses CPython repr).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def entity_id(mention_norm: Column, category: Column) -> Column:
    """sha256(str((mentionNorm, category))) for quote-free ASCII-safe strings."""
    return F.sha2(
        F.concat(
            F.lit("('"), mention_norm, F.lit("', '"), category, F.lit("')")
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
