"""HTML → text extraction + page parsing (the Arrow-batched hot path).

The reference consumes pre-extracted documents from Elasticsearch (its
extractor is upstream Datashare/Tika). Our engine owns this stage: a
deterministic HTML text extractor whose output is the **hard per-row
invariant** — byte-identical text per url across runs, partitionings,
and parallelism levels (BASELINE.json:15).

Extractor spec (deterministic, stdlib-only):
  * parse with html.parser, convert_charrefs=True
  * drop <head>, <script>, <style> content entirely
  * every text node inside <body> is stripped; non-empty nodes are
    joined with a single "\\n"

Page parsing also recovers document fields and inline mention
annotations from ``<meta name="ds:...">`` / ``<span class="ne" ...>``
markup (the fixture generator's carrier for reference-corpus parity —
mirrors how the reference receives documents + named entities as two
pre-extracted ES hit streams, reference
neo4j-app/neo4j_app/core/elasticsearch/to_neo4j.py:53-67,185-193).

Everything runs in ``mapInPandas`` — one parse per page, one pass, no
per-row Python UDF round trips; the output carries mentions as an
array column so a single scan feeds both the document and the mention
streams (explode later, after the cheap filter).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKIP_TAGS = {"script", "style", "head"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._skip_depth = 0
        self.metas: dict[str, str] = {}
        self.mentions: list[dict] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag == "meta":
            d = dict(attrs)
            name = d.get("name", "")
            if name.startswith("ds:"):
                self.metas[name[3:]] = d.get("content", "")
        elif tag == "span":
            d = dict(attrs)
            if d.get("class") == "ne":
                self.mentions.append(d)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag in _SKIP_TAGS:
            self._skip_depth -= 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth:
            return
        data = data.strip()
        if data:
            self.blocks.append(data)


def extract_text(html_bytes: bytes | None) -> str | None:
    """Driver-side twin of the extraction UDF (goldens/tests)."""
    if html_bytes is None:
        return None
    p = _Extractor()
    p.feed(html_bytes.decode("utf-8", errors="replace"))
    return "\n".join(p.blocks)


# lean carrier struct: primitives only (offsets '|'-joined, email
# header flattened out of the metadata map) — nested maps inside
# arrays are disproportionately expensive to cache/encode JVM-side
_MENTION_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("mention", T.StringType()),
        T.StructField("mentionNorm", T.StringType()),
        T.StructField("extractor", T.StringType()),
        T.StructField("extractorLanguage", T.StringType()),
        T.StructField("offsets", T.StringType()),
        T.StructField("emailHeaderField", T.StringType()),
    ]
)

# per-doc pre-aggregated APPEARS_IN/SENT/RECEIVED edge struct: the
# aggregation key (mentionNorm, category, documentId) never crosses
# documents (reference imports.py:751-798), so the whole reduction
# completes inside the parse pass — zero shuffle for edge emission.
# Array fields are '|'-joined sorted-deduped strings, matching the CSV
# serialization rules (to_neo4j.py:266-294).
_EDGE_STRUCT = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("mentionNorm", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("mentionIds", T.StringType()),
        T.StructField("mentionExtractors", T.StringType()),
        T.StructField("extractorLanguage", T.StringType()),
        T.StructField("offsets", T.StringType()),
        T.StructField("mentionCount", T.IntegerType()),
        T.StructField("fields", T.StringType()),
    ]
)


def aggregate_doc_edges(mentions: list[dict]) -> list[dict]:
    """Per-document edge aggregation (A1/A2/A3/A7 semantics), pure
    python over one doc's mention list. Mirrors the reference's
    buffers: APPEARS_IN keyed on (norm, category); SENT/RECEIVED keyed
    on (norm, category, type); ids sorted, extractors/offsets/fields
    sorted sets; mentionCount = len(ids)."""
    appears: dict[tuple, dict] = {}
    emails: dict[tuple, dict] = {}
    for m in mentions:
        offs = [int(o) for o in (m.get("offsets") or "").split("|") if o != ""]
        key = (m["mentionNorm"], m["category"])
        a = appears.setdefault(
            key,
            {"ids": [], "extractors": set(), "offsets": set(), "lang": None},
        )
        a["ids"].append(m["id"])
        if m.get("extractor"):
            a["extractors"].add(m["extractor"])
        a["offsets"].update(offs)
        # min over languages: deterministic under ANY mention order,
        # matching the groupBy paths (F.min) — 'first seen' depends on
        # partition/markup order and broke the byte-identical invariant
        ml = m.get("extractorLanguage")
        if ml and (a["lang"] is None or ml < a["lang"]):
            a["lang"] = ml
        hdr = m.get("emailHeaderField")
        if hdr in _SENT_HEADERS:
            etype = "SENT"
        elif hdr in _RECEIVED_HEADERS:
            etype = "RECEIVED"
        else:
            etype = None
        if etype is not None:
            e = emails.setdefault(key + (etype,), {"fields": set()})
            e["fields"].add(hdr)
    out = []
    for (norm, cat), a in sorted(appears.items()):
        out.append(
            {
                "category": cat,
                "mentionNorm": norm,
                "type": "APPEARS_IN",
                "mentionIds": "|".join(sorted(a["ids"])),
                "mentionExtractors": "|".join(sorted(a["extractors"])),
                "extractorLanguage": a["lang"],
                "offsets": "|".join(str(o) for o in sorted(a["offsets"])),
                "mentionCount": len(a["ids"]),
                "fields": None,
            }
        )
    for (norm, cat, etype), e in sorted(emails.items()):
        out.append(
            {
                "category": cat,
                "mentionNorm": norm,
                "type": etype,
                "mentionIds": None,
                "mentionExtractors": None,
                "extractorLanguage": None,
                "offsets": None,
                "mentionCount": None,
                "fields": "|".join(sorted(e["fields"])),
            }
        )
    return out


_SENT_HEADERS = {"tika_metadata_message_from", "tika_metadata_dc_creator"}
_RECEIVED_HEADERS = {
    "tika_metadata_message_bcc",
    "tika_metadata_message_cc",
    "tika_metadata_message_to",
}

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("rootDocument", T.StringType()),
        T.StructField("dirname", T.StringType()),
        T.StructField("contentType", T.StringType()),
        T.StructField("contentLength", T.LongType()),
        T.StructField("extractionDate", T.StringType()),
        T.StructField("extractionLevel", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ann_mentions", T.ArrayType(_MENTION_STRUCT)),
        T.StructField("ann_edges", T.ArrayType(_EDGE_STRUCT)),
    ]
)


def _parse_one(url, warc_ts, html, text, lang) -> dict:
    p = _Extractor()
    raw = html.decode("utf-8", errors="replace") if html is not None else ""
    p.feed(raw)
    extracted = "\n".join(p.blocks)
    if text is not None and not (isinstance(text, float) and pd.isna(text)):
        extracted = text  # extraction skipped when text already populated
    m = p.metas
    path = m.get("path") or url.split("://", 1)[-1]
    doc_meta = {k[5:]: v for k, v in m.items() if k.startswith("meta:")}
    mentions = []
    for sp in p.mentions:
        if not (sp.get("data-id") and sp.get("data-norm") and sp.get("data-category")):
            # hostile/partial markup: a span missing its identity is
            # not a mention — drop it rather than crash downstream
            # (None norms are unsortable in aggregate_doc_edges and
            # violate MENTION_SCHEMA's non-null fields)
            continue
        offs = "|".join(
            o for o in sp.get("data-offsets", "").split(";") if o != ""
        )
        md = json.loads(sp["data-metadata"]) if "data-metadata" in sp else None
        mentions.append(
            {
                "id": sp.get("data-id"),
                "category": sp.get("data-category"),
                "mention": sp.get("data-mention", sp.get("data-id")),
                "mentionNorm": sp.get("data-norm"),
                "extractor": sp.get("data-extractor"),
                "extractorLanguage": sp.get("data-lang", "en"),
                "offsets": offs,
                "emailHeaderField": (md or {}).get("emailHeaderField"),
            }
        )
    return {
        "url": url,
        "warc_ts": warc_ts,
        "lang": lang,
        "text": extracted,
        "id": m.get("id") or url,
        "rootDocument": m.get("root") or None,
        "dirname": m.get("dirname") or path.rsplit("/", 1)[0],
        "contentType": m.get("contentType") or "text/html",
        "contentLength": int(m["contentLength"])
        if "contentLength" in m
        else (len(html) if html is not None else 0),
        # pd.isna guard: a null timestamp arrives as pd.NaT, which is
        # not None and whose isoformat() is the literal string 'NaT'
        "extractionDate": m.get("extractionDate")
        or (warc_ts.isoformat() if not pd.isna(warc_ts) else None),
        "extractionLevel": int(m.get("extractionLevel", "0")),
        "path": path,
        "title": m.get("title") or None,
        "metadata": doc_meta or None,
        "ann_mentions": mentions,
        "ann_edges": aggregate_doc_edges(mentions),
    }


def parse_pages(
    pages: DataFrame,
    include_text: bool = True,
    ner_gazetteer: dict | None = None,
    emit_mentions: bool = True,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → parsed document rows.

    One mapInPandas pass: text extraction + ds: metadata + inline
    mention annotations. Column pruning still applies upstream (the
    scan reads only the 5 page columns); downstream consumers select
    subsets of PARSED_SCHEMA.

    ``ner_gazetteer`` fuses rule-based NER (regex emails + gazetteer)
    into the same pass, appending to ann_mentions — one scan over the
    html instead of a second text-consuming stage. With
    ``include_text=False`` the (large) text column is dropped from the
    output, cutting Arrow transfer + downstream width by ~70%; the
    byte-identical text invariant is still exercised because mention
    offsets are computed against the extracted text in-pass.
    """
    drop = set()
    if not include_text:
        drop.add("text")
    if not emit_mentions:
        # edge emission uses the pre-aggregated ann_edges only; the
        # raw mention array is dead weight on the Arrow/parquet path
        drop.add("ann_mentions")
    schema = T.StructType([f for f in PARSED_SCHEMA.fields if f.name not in drop])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .ner import _extract_doc  # late import: executor-side

        for pdf in batches:
            rows = []
            for u, ts, h, tx, lg in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["text"], pdf["lang"]
            ):
                row = _parse_one(u, ts, h, tx, lg)
                if ner_gazetteer is not None:
                    found = _extract_doc(
                        row["id"], row["text"], row["lang"], ner_gazetteer
                    )
                    lean = [
                        {
                            "id": m["id"],
                            "category": m["category"],
                            "mention": m["mention"],
                            "mentionNorm": m["mentionNorm"],
                            "extractor": m["extractor"],
                            "extractorLanguage": m["extractorLanguage"],
                            "offsets": "|".join(str(o) for o in m["offsets"]),
                            "emailHeaderField": (m["metadata"] or {}).get(
                                "emailHeaderField"
                            ),
                        }
                        for m in found
                    ]
                    row["ann_mentions"] = row["ann_mentions"] + lean
                    row["ann_edges"] = aggregate_doc_edges(row["ann_mentions"])
                for d in drop:
                    row.pop(d)
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return pages.mapInPandas(run, schema)


def with_extracted_text(pages: DataFrame) -> DataFrame:
    """Minimal variant: fill the text column only (byte-identical rule).

    Keeps the page schema; used by the invariant tests and by callers
    that don't need document parsing.
    """

    @F.pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(extract_text)

    return pages.withColumn(
        "text", F.coalesce(F.col("text"), _extract(F.col("html")))
    )
