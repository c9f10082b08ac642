"""Project statistics (A6/A8): the reference's _ProjectStatistics
singleton (constants.py:122-125, objects.py:74-86, graphs.py:147-200)
as a 1-row table.

nEntities is per-category counts of entities appearing in edges,
computed as sum of distinct entity nodes per category — the reference
counts via ``count(DISTINCT ne)`` grouped by label
(graphs.py:168-188).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .constants import STATS_ID, STATS_N_DOCS, STATS_N_ENTS
from .pipeline import GraphBuild

SINGLETON_ID = "project-stats"


def compute_statistics(g: GraphBuild) -> dict:
    n_docs = g.docs.count()
    per_cat = {
        r["category"]: r["n"]
        for r in g.entities.groupBy("category")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return {
        STATS_ID: SINGLETON_ID,
        STATS_N_DOCS: n_docs,
        STATS_N_ENTS: per_cat,
    }


def statistics_df(spark: SparkSession, stats: dict) -> DataFrame:
    return spark.createDataFrame(
        [
            (
                stats[STATS_ID],
                stats[STATS_N_DOCS],
                json.dumps(stats[STATS_N_ENTS], sort_keys=True),
            )
        ],
        f"{STATS_ID} string, {STATS_N_DOCS} long, {STATS_N_ENTS} string",
    )


def write_statistics(spark: SparkSession, g: GraphBuild, path: str) -> dict:
    stats = compute_statistics(g)
    statistics_df(spark, stats).coalesce(1).write.mode("overwrite").parquet(path)
    return stats


def read_statistics(spark: SparkSession, path: str) -> dict:
    row = spark.read.parquet(path).collect()[0]
    return {
        STATS_ID: row[STATS_ID],
        STATS_N_DOCS: row[STATS_N_DOCS],
        STATS_N_ENTS: json.loads(row[STATS_N_ENTS]),
    }
