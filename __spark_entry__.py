"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full KG-construction pipeline (pages →
                 mapInPandas parse/extract → rule NER → entity dedup →
                 APPEARS_IN triple aggregation) over pages synthesized
                 from sf0.001 documents.
queries()      — one entry per implemented operator from SURVEY.md §2
                 plus the training-data-pipeline extras.
oracle_sql()   — exactly-equivalent DuckDB SQL per query (including
                 the flagship: the page carrier is deterministic, so
                 the fused parse+NER output is SQL-reconstructible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datashare_extension_neo4j_spark.queries import kg_full_pipeline

    return kg_full_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datashare_extension_neo4j_spark.queries import QUERIES

    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from datashare_extension_neo4j_spark.queries import QUERIES

    # every registered query carries an exact DuckDB oracle — including
    # the ANN top-k paths, whose bucket assignment is fixed-point
    # (engine-exact) since round 4; the None filter is kept only as a
    # guard for future genuinely non-SQL-expressible entries
    return {
        name: oracle
        for name, (_fn, oracle) in QUERIES.items()
        if oracle is not None
    }
