"""Mention detection (NER) — two sources, one output shape.

1. ``annotated_mentions`` — unpacks inline annotations recovered by the
   parse stage. This mirrors the reference, which receives *pre-
   extracted* NamedEntity hits from Elasticsearch (reference
   neo4j-app/neo4j_app/core/elasticsearch/to_neo4j.py:185-193) — the
   FK to the hosting document is ``hit.join.parent``; ours is the page
   the annotation sits in. Pure explode + projection, no Python.

2. ``rule_based_mentions`` — a real extraction path for raw web text:
   deterministic EMAIL regex + gazetteer PERSON/ORG/LOCATION matching
   with true character offsets, Arrow-batched (mapInPandas), so
   goldens are stable and P/R vs the synthetic truth is exact.

Output columns = the reference's NE hit shape (constants.py:95-107).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import EMAIL_CATEGORY, EMAIL_HEADER

_MENTION_COLS = [
    "id",
    "documentId",
    "category",
    "mention",
    "mentionNorm",
    "mentionNormTextLength",
    "extractor",
    "extractorLanguage",
    "offsets",
    "metadata",
]


def annotated_mentions(parsed: DataFrame) -> DataFrame:
    """Explode ann_mentions arrays into reference-shaped mention rows.

    The carrier struct is primitives-only (offsets '|'-joined, email
    header flat — see extract._MENTION_STRUCT); this reconstructs the
    reference NE-hit shape (offsets array<long>, metadata map) with
    codegen'd expressions.
    """
    m = parsed.select(
        F.col("id").alias("documentId"),
        F.explode("ann_mentions").alias("m"),
    )
    offsets = F.when(
        F.col("m.offsets").isNotNull() & (F.col("m.offsets") != ""),
        F.transform(
            F.split(F.col("m.offsets"), "\\|"), lambda x: x.cast("long")
        ),
    ).otherwise(F.array().cast("array<long>"))
    metadata = F.when(
        F.col("m.emailHeaderField").isNotNull(),
        F.create_map(
            F.lit(EMAIL_HEADER), F.col("m.emailHeaderField")
        ),
    )
    return m.select(
        F.col("m.id").alias("id"),
        "documentId",
        F.col("m.category").alias("category"),
        F.col("m.mention").alias("mention"),
        F.col("m.mentionNorm").alias("mentionNorm"),
        F.length("m.mentionNorm").cast("int").alias("mentionNormTextLength"),
        F.col("m.extractor").alias("extractor"),
        F.col("m.extractorLanguage").alias("extractorLanguage"),
        offsets.alias("offsets"),
        metadata.alias("metadata"),
    )


# --- rule-based extraction over raw text -------------------------------

_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_HEADER_RE = re.compile(r"^(From|To|Cc|Bcc):", re.MULTILINE)
_HEADER_TO_TIKA = {
    "From": "tika_metadata_message_from",
    "To": "tika_metadata_message_to",
    "Cc": "tika_metadata_message_cc",
    "Bcc": "tika_metadata_message_bcc",
}

# small deterministic gazetteer keyed on surface form (lower-cased)
DEFAULT_GAZETTEER = {
    "customer": "PERSON",
    "supplier": "PERSON",
    "spark": "ORGANIZATION",
    "window": "LOCATION",
    "table": "LOCATION",
    "vector": "ORGANIZATION",
    "stream": "LOCATION",
    "batch": "ORGANIZATION",
}

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("documentId", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("mention", T.StringType()),
        T.StructField("mentionNorm", T.StringType()),
        T.StructField("mentionNormTextLength", T.IntegerType()),
        T.StructField("extractor", T.StringType()),
        T.StructField("extractorLanguage", T.StringType()),
        T.StructField("offsets", T.ArrayType(T.LongType())),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _extract_doc(doc_id: str, text: str, lang: str, gazetteer: dict) -> list[dict]:
    if not text:
        return []
    found: dict[tuple, dict] = {}
    # emails, with the nearest preceding header token deciding SENT/RECEIVED
    headers = [(m.start(), m.group(1)) for m in _HEADER_RE.finditer(text)]
    for m in _EMAIL_RE.finditer(text):
        norm = m.group(0).lower()
        hdr = None
        for pos, name in headers:
            if pos <= m.start():
                hdr = name
            else:
                break
        md = (
            {EMAIL_HEADER: _HEADER_TO_TIKA[hdr]}
            if hdr is not None and hdr in _HEADER_TO_TIKA
            else None
        )
        key = (norm, EMAIL_CATEGORY, hdr)
        e = found.setdefault(
            key,
            {
                "category": EMAIL_CATEGORY,
                "mention": m.group(0),
                "mentionNorm": norm,
                "metadata": md,
                "offsets": [],
            },
        )
        e["offsets"].append(m.start())
    # gazetteer terms on word boundaries
    if gazetteer:
        pat = re.compile(
            r"\b(" + "|".join(re.escape(k) for k in sorted(gazetteer)) + r")\b",
            re.IGNORECASE,
        )
        for m in pat.finditer(text):
            norm = m.group(0).lower()
            cat = gazetteer[norm]
            key = (norm, cat, None)
            e = found.setdefault(
                key,
                {
                    "category": cat,
                    "mention": m.group(0),
                    "mentionNorm": norm,
                    "metadata": None,
                    "offsets": [],
                },
            )
            e["offsets"].append(m.start())
    rows = []
    for (norm, cat, hdr), e in sorted(found.items(), key=lambda kv: str(kv[0])):
        rows.append(
            {
                "id": f"{doc_id}-{cat}-{norm}" + (f"-{hdr}" if hdr else ""),
                "documentId": doc_id,
                "category": cat,
                "mention": e["mention"],
                "mentionNorm": norm,
                "mentionNormTextLength": len(norm),
                "extractor": "rule",
                "extractorLanguage": lang or "en",
                "offsets": e["offsets"],
                "metadata": e["metadata"],
            }
        )
    return rows


def rule_based_mentions(
    docs: DataFrame,
    gazetteer: dict | None = None,
    id_col: str = "id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Deterministic regex/gazetteer NER over extracted text."""
    # matching is case-insensitive and lookups use the lower-cased hit,
    # so caller-supplied keys must be normalized too (a mixed-case key
    # like {'Apple': 'ORG'} would otherwise KeyError on the executor)
    gaz = {
        k.lower(): v
        for k, v in (DEFAULT_GAZETTEER if gazetteer is None else gazetteer).items()
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for doc_id, text, lang in zip(
                pdf[id_col], pdf[text_col], pdf[lang_col]
            ):
                out.extend(_extract_doc(doc_id, text, lang, gaz))
            yield pd.DataFrame(out, columns=_MENTION_COLS)

    return docs.select(id_col, text_col, lang_col).mapInPandas(run, _OUT_SCHEMA)
