"""Deterministic synthetic fixtures (FIXTURES.md).

Two generators:

1. ``reference_pages_pandas`` — the reference test corpus (n docs with
   chained roots, 3-mentions-per-doc Person/Location cycling, 2 email
   mentions, noise pages; mirrors the *semantics* of the reference's
   seeded fixtures, neo4j-app/neo4j_app/tests/conftest.py:316-386 and
   tests/core/test_imports.py:47-61) encoded as Common-Crawl-style
   pages: document fields ride in ``<meta name="ds:...">`` tags,
   pre-extracted mentions in ``<span class="ne" ...>`` annotations.
   Driver-side pandas, test scale only.

2. ``pages_from_documents`` — distributed pages synthesized from the
   driver-provided ``documents.parquet`` with pure column expressions
   (no Python, no driver loop) — used for bench runs at sf0.1+ and as
   the deterministic input for entry queries. Scales with the input.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXTRACTION_DATE = "2023-02-06T13:48:22.3866"
CREATED_AT = "2022-04-08T11:41:34Z"
MODIFIED_AT = "2022-04-08T11:41:34Z"
EPOCH = datetime(2023, 2, 6, 12, 0, 0, tzinfo=timezone.utc)
LANGS = ["en", "fr", "de"]


def _mention_span(m: dict) -> str:
    md = (
        f" data-metadata='{json.dumps(m['metadata'])}'"
        if m.get("metadata")
        else ""
    )
    offs = ";".join(str(o) for o in m["offsets"])
    return (
        f'<span class="ne" data-id="{m["id"]}" data-category="{m["category"]}"'
        f' data-mention="{m["mention"]}" data-norm="{m["mentionNorm"]}"'
        f' data-extractor="{m["extractor"]}" data-lang="{m["extractorLanguage"]}"'
        f' data-offsets="{offs}"{md}>{m["mention"]}</span>'
    )


def make_doc(i: int, n_docs: int, with_dates: bool = True) -> dict:
    return {
        "id": f"doc-{i}",
        "rootDocument": f"doc-{i - 1}" if i else "doc-0",
        "dirname": f"dirname-{i}",
        "contentType": f"content-type-{i}",
        "contentLength": i * i,
        "extractionDate": EXTRACTION_DATE,
        "extractionLevel": 1 if i else 0,
        "path": f"dirname-{i}",
        "metadata": {
            "tika_metadata_dcterms_created_iso8601": CREATED_AT,
            "tika_metadata_modified_iso8601": MODIFIED_AT,
        }
        if with_dates
        else None,
    }


def make_mention(i: int) -> dict:
    return {
        "id": f"named-entity-{i}",
        "documentId": f"doc-{i - i % 3}",
        "category": "Location" if i % 3 == 0 else "Person",
        "mention": f"named-entity-{i}",
        "mentionNorm": f"mention-{i // 3}",
        "extractor": "spacy" if i % 3 == 1 else "core-nlp",
        "extractorLanguage": "en",
        "offsets": list(range(i + 1)),
        "metadata": None,
    }


def make_email_mentions(doc_id: str) -> list[dict]:
    out = []
    for header in ["tika_metadata_message_from", "tika_metadata_message_to"]:
        out.append(
            {
                "id": f"email-{header}",
                "documentId": doc_id,
                "category": "EMAIL",
                "mention": "dev@icij.org",
                "mentionNorm": "dev@icij.org",
                "extractor": "spacy",
                "extractorLanguage": "en",
                "offsets": [0],
                "metadata": {"emailHeaderField": header},
            }
        )
    return out


def _page_html(doc: dict, mentions: list[dict], body_text: str) -> str:
    metas = [
        f'<meta name="ds:id" content="{doc["id"]}"/>',
        f'<meta name="ds:root" content="{doc["rootDocument"]}"/>',
        f'<meta name="ds:dirname" content="{doc["dirname"]}"/>',
        f'<meta name="ds:contentType" content="{doc["contentType"]}"/>',
        f'<meta name="ds:contentLength" content="{doc["contentLength"]}"/>',
        f'<meta name="ds:extractionDate" content="{doc["extractionDate"]}"/>',
        f'<meta name="ds:extractionLevel" content="{doc["extractionLevel"]}"/>',
        f'<meta name="ds:path" content="{doc["path"]}"/>',
    ]
    if doc.get("title"):
        metas.append(f'<meta name="ds:title" content="{doc["title"]}"/>')
    for k, v in (doc.get("metadata") or {}).items():
        metas.append(f'<meta name="ds:meta:{k}" content="{v}"/>')
    spans = "\n".join(_mention_span(m) for m in mentions)
    return (
        "<html><head><title>fixture</title>\n"
        + "\n".join(metas)
        + f"\n</head><body>\n<p>{body_text}</p>\n{spans}\n</body></html>"
    )


def reference_pages_pandas(
    n_docs: int = 20, n_noise: int = 0, with_emails: bool = True
) -> pd.DataFrame:
    """The reference-parity corpus as a pages pandas DataFrame."""
    mentions_by_doc: dict[str, list[dict]] = {}
    for i in range(n_docs):
        m = make_mention(i)
        mentions_by_doc.setdefault(m["documentId"], []).append(m)
    if with_emails and n_docs:
        last = f"doc-{n_docs - 1}"
        mentions_by_doc.setdefault(last, []).extend(make_email_mentions(last))
    rows = []
    for i in range(n_docs):
        doc = make_doc(i, n_docs)
        body = f"fixture document {i} body. From: dev@icij.org greetings."
        html = _page_html(doc, mentions_by_doc.get(doc["id"], []), body)
        rows.append(
            {
                "url": f"https://example-{i}.test/doc-{i}",
                "warc_ts": EPOCH + timedelta(hours=i),
                "html": html.encode("utf-8"),
                "text": None,
                "lang": LANGS[i % 3],
            }
        )
    for i in range(n_noise):
        html = f"<html><head></head><body><p>noise number {i} attribute</p></body></html>"
        rows.append(
            {
                "url": f"https://noise-{i}.test/noise-{i}",
                "warc_ts": EPOCH + timedelta(hours=n_docs + i),
                "html": html.encode("utf-8"),
                "text": None,
                "lang": LANGS[i % 3],
            }
        )
    return pd.DataFrame(rows)


def reference_pages(spark: SparkSession, **kw) -> DataFrame:
    from .schemas import PAGES_SCHEMA

    return spark.createDataFrame(reference_pages_pandas(**kw), schema=PAGES_SCHEMA)


def materialize_pages(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    multiplier: int = 1,
    body_repeat: int = 1,
    partitioned: bool = False,
) -> str:
    """Write the synthetic pages corpus to parquet once — benchmarks
    then read it like the real system reads the Iceberg pages table
    (input_hint), so page *generation* cost never pollutes measured
    pipeline throughput. body_repeat inflates page size toward
    realistic web-page volumes."""
    pages = pages_from_documents(spark, sf_dir, multiplier=multiplier)
    if body_repeat > 1:
        pages = pages.withColumn(
            "html",
            F.encode(
                F.concat_ws(
                    "", F.array_repeat(F.decode("html", "utf-8"), body_repeat)
                ),
                "utf-8",
            ),
        )
    w = pages.write.mode("overwrite")
    if partitioned:
        # input_hint: pages partitioned by (lang, days(warc_ts)) — the
        # Iceberg layout; here hive-style parquet partitions, so lang/
        # date predicates prune at planning time
        pages = pages.withColumn("warc_day", F.to_date("warc_ts"))
        w = pages.write.mode("overwrite").partitionBy("lang", "warc_day")
    w.parquet(out_path)
    return out_path


def pages_from_documents(
    spark: SparkSession, sf_dir: str, root_stride: int = 5, multiplier: int = 1
) -> DataFrame:
    """Distributed deterministic pages derived from documents.parquet.

    Pure column expressions (codegen'd, no Python): each document row
    becomes one page whose HTML embeds ds: metadata (root chained via
    ``doc_id - doc_id % root_stride``) and whose body is the document
    text plus a deterministic email header line. Scales linearly with
    the input and parallelizes with the scan.
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if multiplier > 1:
        # deterministic scale-up: k page variants per document with
        # distinct ids (doc_id' = doc_id * k + rep), fully distributed
        reps = spark.range(multiplier).select(F.col("id").alias("rep"))
        # one wave of fat partitions: pandas-UDF stages pay a fixed
        # per-task Arrow/IPC cost, so fewer+bigger tasks scale better.
        # repartition BEFORE the multiplying crossJoin — the expansion
        # and the HTML synthesis then run fully parallel, no serial
        # single-task shuffle writer.
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
        d = (
            d.repartition(n_parts)
            .crossJoin(F.broadcast(reps))
            .withColumn(
                "doc_id", F.col("doc_id") * multiplier + F.col("rep")
            )
            .drop("rep")
        )
    i = F.col("doc_id")
    root = (i - i % root_stride).cast("long")
    email_user = F.concat(F.lit("user"), (i % 50).cast("string"))
    header = F.when(i % 2 == 0, F.lit("From: ")).otherwise(F.lit("To: "))
    body = F.concat(
        header, email_user, F.lit("@example.com\n"), F.coalesce("text", F.lit(""))
    )
    html = F.concat(
        F.lit("<html><head><title>doc</title>\n"),
        F.lit('<meta name="ds:id" content="doc-'), i, F.lit('"/>\n'),
        F.lit('<meta name="ds:root" content="doc-'), root, F.lit('"/>\n'),
        F.lit('<meta name="ds:dirname" content="dirname-'), i, F.lit('"/>\n'),
        F.lit('<meta name="ds:path" content="dirname-'), i, F.lit('"/>\n'),
        F.lit('<meta name="ds:contentType" content="text/html"/>\n'),
        F.lit('<meta name="ds:contentLength" content="'),
        F.coalesce(F.col("n_chars"), F.lit(0)),
        F.lit('"/>\n'),
        F.lit('<meta name="ds:extractionLevel" content="'),
        (i % 2).cast("string"),
        F.lit('"/>\n'),
        F.lit("</head><body>\n<p>"),
        body,
        F.lit("</p>\n</body></html>"),
    )
    return d.select(
        F.concat(F.lit("https://example.test/doc-"), i).alias("url"),
        (F.lit(EPOCH) + F.make_interval(hours=(i % 24).cast("int"))).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang").alias("lang"),
    )
