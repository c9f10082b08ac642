"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full KG-construction pipeline (pages →
                 mapInPandas parse/extract → rule NER → entity dedup →
                 APPEARS_IN triple aggregation) over pages synthesized
                 from sf0.001 documents.
queries()      — one entry per implemented operator from SURVEY.md §2
                 plus the training-data-pipeline extras.
oracle_sql()   — exactly-equivalent DuckDB SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _joined_arrays(appears_in: DataFrame) -> DataFrame:
    """'|'-join the array columns (parity rule: arrays are emitted as
    joined sorted strings — the driver's canonicalizer sorts with
    pandas, which cannot hash list cells)."""
    from pyspark.sql import functions as F

    return appears_in.select(
        "mentionNorm",
        "category",
        "startId",
        "endId",
        "type",
        F.array_join("mentionIds", "|").alias("mentionIds"),
        F.array_join("mentionExtractors", "|").alias("mentionExtractors"),
        F.array_join(
            F.transform(F.col("offsets"), lambda x: x.cast("string")), "|"
        ).alias("offsets"),
        "extractorLanguage",
        "mentionCount",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datashare_extension_neo4j_spark.fixtures import pages_from_documents
    from datashare_extension_neo4j_spark.pipeline import build_graph

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    g = build_graph(pages, use_rule_ner=True, cache=False)
    return _joined_arrays(g.appears_in)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datashare_extension_neo4j_spark.queries import QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _oracle) in QUERIES.items()
    }

    # non-SQL-expressible: the full pages pipeline (mapInPandas parse +
    # regex NER); driver records a rows-only check.
    def kg_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
        from datashare_extension_neo4j_spark.fixtures import pages_from_documents
        from datashare_extension_neo4j_spark.pipeline import build_graph

        g = build_graph(
            pages_from_documents(spark, sf_dir), use_rule_ner=True, cache=False
        )
        return _joined_arrays(g.appears_in)

    out["kg_full_pipeline"] = kg_full_pipeline
    return out


def oracle_sql() -> dict[str, str]:
    from datashare_extension_neo4j_spark.queries import QUERIES

    # entries with oracle=None are approximate/non-SQL-expressible →
    # omitted: the driver records a rows-only check for them
    return {
        name: oracle
        for name, (_fn, oracle) in QUERIES.items()
        if oracle is not None
    }
