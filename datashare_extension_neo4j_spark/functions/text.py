"""Document title cascade + metadata coalesce.

Reproduces the reference's title resolution byte-for-byte (reference
neo4j-app/neo4j_app/core/elasticsearch/to_neo4j.py:70-147; 38 golden
cases in tests/core/elasticsearch/test_to_neo4j.py:54-272):

  default  = first non-empty of [title, resourcename*, basename(path),
             id[:10]]           (* only when extractionLevel > 0, with
             RFC-2047 ``=?..?=`` decoding via urllib ``unquote_plus``)
  email    = first non-empty of [subject, dc_title, default]
  tweet    = first non-empty of [dc_title, default]

All of it is built-in expressions except the RFC-2047 decode, which
needs urllib byte-parity → Arrow-batched pandas UDF that short-circuits
the (rare) encoded values only.
"""

from __future__ import annotations

from urllib.parse import unquote_plus

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _rfc2047_pd(s: pd.Series) -> pd.Series:
    def dec(v):
        if v is None:
            return None
        if v.startswith("=?") and v.endswith("?="):
            v = v.split("?")[-2]
            v = unquote_plus(v.replace("=", "%"))
        return v

    return s.map(dec)


rfc2047_decode_udf = F.pandas_udf(_rfc2047_pd, T.StringType())


def rfc2047_decode_expr(c: Column) -> Column:
    """JVM-native RFC-2047 decode: payload = split('?')[-2], '='→'%',
    then x-www-form-urlencoded decode (urllib ``unquote_plus``
    semantics = Java URLDecoder). ``try_url_decode`` nulls on
    malformed %-sequences where urllib would keep them literal — we
    fall back to the undecoded value there (divergence only on
    malformed encodings; the UDF path keeps exact urllib parity).
    Whole-stage-codegen'd: no Arrow round trip on the docs stage.
    """
    is_encoded = c.startswith("=?") & c.endswith("?=")
    payload = F.translate(F.element_at(F.split(c, "\\?"), -2), "=", "%")
    decoded = F.coalesce(F.try_url_decode(payload), payload)
    return F.when(is_encoded, decoded).otherwise(c)


def _nonempty(c: Column) -> Column:
    return F.nullif(c, F.lit(""))


def meta_coalesce(metadata: Column, keys: list[str]) -> Column:
    """First non-null metadata[k] over an ordered key list (P9)."""
    return F.coalesce(*[metadata.getItem(k) for k in keys])


def default_title(
    doc_id: Column,
    path: Column,
    title: Column,
    metadata: Column,
    extraction_level: Column,
    exact_rfc2047: bool = False,
) -> Column:
    short_id = F.substring(doc_id, 1, 10)
    base_name = F.element_at(F.split(F.coalesce(path, F.lit("")), "/"), -1)
    resource_raw = F.when(
        F.coalesce(extraction_level, F.lit(0)) > 0,
        F.trim(F.coalesce(metadata.getItem("tika_metadata_resourcename"), F.lit(""))),
    ).otherwise(F.lit(""))
    # native decode by default (codegen'd); pandas UDF for byte-exact
    # urllib semantics on malformed encodings
    resource = (
        rfc2047_decode_udf(resource_raw)
        if exact_rfc2047
        else rfc2047_decode_expr(resource_raw)
    )
    return F.coalesce(
        _nonempty(F.trim(F.coalesce(title, F.lit("")))),
        _nonempty(resource),
        _nonempty(base_name),
        _nonempty(short_id),
    )


def doc_title(
    doc_id: Column,
    path: Column,
    title: Column,
    metadata: Column,
    extraction_level: Column,
    content_type: Column,
) -> Column:
    default = default_title(doc_id, path, title, metadata, extraction_level)
    ct = F.coalesce(content_type, F.lit(""))
    is_email = ct.startswith("message/") | (ct == "application/vnd.ms-outlook")
    is_tweet = ct == "application/json; twint"
    dc_title = _nonempty(
        F.trim(F.coalesce(metadata.getItem("tika_metadata_dc_title"), F.lit("")))
    )
    subject = _nonempty(
        F.trim(
            F.coalesce(
                metadata.getItem("tika_metadata_subject"),
                metadata.getItem("tika_metadata_dc_subject"),
                F.lit(""),
            )
        )
    )
    return (
        F.when(is_email, F.coalesce(subject, dc_title, default))
        .when(is_tweet, F.coalesce(dc_title, default))
        .otherwise(default)
    )
