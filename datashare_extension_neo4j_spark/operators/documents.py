"""Document node + HAS_PARENT edge derivation (P7/P8/P9, J2).

Reference semantics (neo4j-app/neo4j_app/core/elasticsearch/to_neo4j.py):
  * rootDocument nulled when equal to own id (:58-60) → no self-loops
  * urlSuffix = "ds/{project}/{id}/{root or id}"   (:61-64)
  * title cascade                                   (:70-147)
  * createdAt/modifiedAt = ordered coalesce over Tika metadata keys
    (:150-155,163-166 + constants.py:38-50)
  * HAS_PARENT edge (doc → root) only when root != id (:176-182)

Everything is built-in column expressions (whole-stage codegen) except
the RFC-2047 leg of the title cascade — no shuffle in this stage at
all: it is a pure projection over the parsed pages scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    DOC_CREATED_AT_META,
    DOC_MODIFIED_AT_META,
)
from ..functions.text import doc_title, meta_coalesce


def doc_nodes(parsed: DataFrame, project: str = "test_project") -> DataFrame:
    """Parsed pages → document node rows (one per page)."""
    root = F.when(
        F.col("rootDocument").isNotNull()
        & (F.col("rootDocument") != F.col("id")),
        F.col("rootDocument"),
    )
    out = (
        parsed.withColumn("rootDocument", root)
        .withColumn(
            "urlSuffix",
            F.concat(
                F.lit(f"ds/{project}/"),
                F.col("id"),
                F.lit("/"),
                F.coalesce(F.col("rootDocument"), F.col("id")),
            ),
        )
        .withColumn(
            "title",
            doc_title(
                F.col("id"),
                F.col("path"),
                F.col("title"),
                F.col("metadata"),
                F.col("extractionLevel"),
                F.col("contentType"),
            ),
        )
        .withColumn("createdAt", meta_coalesce(F.col("metadata"), DOC_CREATED_AT_META))
        .withColumn(
            "modifiedAt", meta_coalesce(F.col("metadata"), DOC_MODIFIED_AT_META)
        )
    )
    return out


def has_parent_edges(docs: DataFrame) -> DataFrame:
    """(doc)-[:HAS_PARENT]->(root) rows; self-parents already nulled."""
    return (
        docs.where(F.col("rootDocument").isNotNull())
        .select(
            F.col("id").alias("src"),
            F.col("rootDocument").alias("dst"),
        )
    )
