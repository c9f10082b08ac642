"""Property-graph view: GraphBuild → generic nodes/edges tables
(SURVEY.md §1.4 mapping — nodes(node_id, labels, props), edges(src,
dst, type, props)) consumed by the DSL compiler and dump writers.

Labels follow the reference composition: Document (constants.py:4),
NamedEntity + category (to_neo4j.py:208); EMAIL entities also carry
emailUser/emailDomain props (named_entities.py:52-65).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import DOC_NODE, DOC_ROOT_TYPE, NE_NODE
from .operators.edges import email_user_domain
from .pipeline import GraphBuild
from .plans.dsl import GraphTables

_DOC_PROPS = [
    "dirname",
    "contentType",
    "extractionDate",
    "path",
    "title",
    "urlSuffix",
    "createdAt",
    "modifiedAt",
]


def _str_map(pairs: list[tuple[str, F.Column]]) -> F.Column:
    args = []
    for k, v in pairs:
        args.append(F.lit(k))
        args.append(v.cast("string"))
    m = F.create_map(*args)
    return F.map_filter(m, lambda _, v: v.isNotNull())


def doc_node_table(docs: DataFrame) -> DataFrame:
    pairs = [("id", F.col("id"))]
    pairs += [(c, F.col(c)) for c in _DOC_PROPS if c in docs.columns]
    if "contentLength" in docs.columns:
        pairs.append(("contentLength", F.col("contentLength")))
    if "extractionLevel" in docs.columns:
        pairs.append(("extractionLevel", F.col("extractionLevel")))
    return docs.select(
        F.col("id").alias("node_id"),
        F.array(F.lit(DOC_NODE)).alias("labels"),
        _str_map(pairs).alias("props"),
    )


def entity_node_table(entities: DataFrame) -> DataFrame:
    e = email_user_domain(entities)
    pairs = [
        ("mentionNorm", F.col("mentionNorm")),
        ("emailUser", F.col("emailUser")),
        ("emailDomain", F.col("emailDomain")),
    ]
    return e.select(
        F.col("entityId").alias("node_id"),
        F.array(F.lit(NE_NODE), F.col("category")).alias("labels"),
        _str_map(pairs).alias("props"),
    )


def edge_table(g: GraphBuild) -> DataFrame:
    roots = g.doc_roots.select(
        "src",
        "dst",
        F.lit(DOC_ROOT_TYPE).alias("type"),
        F.lit(None).cast("map<string,string>").alias("props"),
    )
    arr = lambda c: F.array_join(F.col(c), "|")  # noqa: E731
    appears = g.appears_in.select(
        F.col("startId").alias("src"),
        F.col("endId").alias("dst"),
        "type",
        _str_map(
            [
                ("mentionIds", arr("mentionIds")),
                ("mentionExtractors", arr("mentionExtractors")),
                ("extractorLanguage", F.col("extractorLanguage")),
                (
                    "offsets",
                    F.array_join(
                        F.transform(F.col("offsets"), lambda x: x.cast("string")),
                        "|",
                    ),
                ),
                ("mentionCount", F.col("mentionCount")),
            ]
        ).alias("props"),
    )
    emails = g.emails.select(
        F.col("startId").alias("src"),
        F.col("endId").alias("dst"),
        "type",
        _str_map([("fields", arr("fields"))]).alias("props"),
    )
    return roots.unionByName(appears).unionByName(emails)


def to_property_graph(g: GraphBuild) -> GraphTables:
    nodes = doc_node_table(g.docs).unionByName(entity_node_table(g.entities))
    return GraphTables(nodes=nodes, edges=edge_table(g))
