"""Structured Streaming ingestion of pages → incremental graph.

The reference is incremental-batch, not streaming (SURVEY.md §2.10) —
its incrementality is re-running imports with MERGE upserts. The
streaming ingest here is the Spark-native generalization: new page
files land in the input directory, each micro-batch runs the same
parse/NER/edge derivation, and ``foreachBatch`` applies the
MERGE-with-array-union semantics (reference named_entities.py:84-97 =
sinks/tables.merge_appears_in) against the graph tables — so batch
re-import and continuous ingest share one code path.

``trigger(availableNow=True)`` drains what exists and stops — used by
tests and backfills; drop it for continuous operation.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..operators.documents import doc_nodes
from ..operators.edges import appears_in_edges
from ..operators.extract import PARSED_SCHEMA, parse_pages
from ..operators.ner import DEFAULT_GAZETTEER, annotated_mentions
from ..schemas import PAGES_SCHEMA
from ..sinks.tables import merge_table


def stream_pages(spark: SparkSession, input_path: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )


def start_graph_ingest(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming pages → docs table (append) + APPEARS_IN merge."""
    docs_path = f"{out_dir}/docs"
    appears_path = f"{out_dir}/appears_in"

    pages = stream_pages(spark, input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        parsed = parse_pages(
            batch_df, include_text=False, ner_gazetteer=DEFAULT_GAZETTEER
        )
        # small per-batch frames: one persist avoids a double parse
        parsed = parsed.persist()
        try:
            docs = doc_nodes(parsed)
            docs.drop("ann_mentions", "metadata").write.mode("append").parquet(
                docs_path
            )
            appears = appears_in_edges(annotated_mentions(parsed))
            if Path(appears_path).exists():
                # layout-aware MERGE: bucketed tables rewrite only the
                # partitions this micro-batch touches
                merge_table(spark, appears_path, appears, "appears_in")
            else:
                appears.write.mode("overwrite").parquet(appears_path)
        finally:
            parsed.unpersist()

    writer = (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_pii_scrub_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous PII scrubbing of a landing document stream: the
    SAME in-row rules as the batch ``pii_scrub`` query (the redaction
    expressions are stateless JVM projections, so they compose into
    ``readStream`` unchanged — bit-identical outputs to the batch
    scrub, tested). Scrubbed docs append to parquet; the checkpoint
    makes delivery exactly-once per input file."""
    from functools import reduce
    from operator import add

    from pyspark.sql import functions as F

    from ..functions.pii import redact_pii, staged_pii_counts

    docs = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )
    scrubbed = docs.select(
        "doc_id",
        redact_pii(F.col("text")).alias("text"),
        # staged counts: nRedacted equals the number of placeholders
        # actually written into the scrubbed text
        reduce(add, staged_pii_counts(F.col("text"))).alias("nRedacted"),
    )
    writer = (
        scrubbed.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = [
    "stream_pages",
    "start_graph_ingest",
    "start_pii_scrub_stream",
    "PARSED_SCHEMA",
]
