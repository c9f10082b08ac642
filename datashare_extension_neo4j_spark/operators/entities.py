"""Entity-node canonicalization + dedup (A5, J4) and MinHash alias
clustering (the scale upgrade; off in reference-parity mode).

Reference: entity nodes are keyed on (mentionNorm, category) with a
sha256 tuple-repr id (neo4j-app/neo4j_app/core/elasticsearch/
to_neo4j.py:196-217); first-seen dedup via an in-memory trie
(core/imports.py:622-630,717-729) — a memory hack whose *semantics*
are simply ``dropDuplicates`` on the key, which Spark does with a
partial-agg + shuffle-on-key and no driver memory at all.

MinHashLSH alias clustering groups near-duplicate mentionNorms (edit
variants of the same name) under one canonical entity, carrying an
``aliases`` array. It uses pyspark.ml's MinHashLSH over character
n-gram sets; parity mode (default) skips it so entity ids match the
reference's exactly (P/R gate, BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import NE_NODE, NEO4J_ARRAY_SPLIT_CHAR
from ..functions.hashing import entity_id


def entity_nodes(mentions: DataFrame) -> DataFrame:
    """Distinct entity nodes: (entity id, mentionNorm, category, label).

    dropDuplicates on the natural key — map-side partial aggregation
    means the shuffle carries only distinct (norm, category) pairs, so
    hot mentions (the skew case at web scale) collapse before shuffle.
    """
    return (
        mentions.select("mentionNorm", "category")
        .dropDuplicates(["mentionNorm", "category"])
        .withColumn("entityId", entity_id(F.col("mentionNorm"), F.col("category")))
        .withColumn(
            "label",
            F.concat(
                F.lit(NE_NODE), F.lit(NEO4J_ARRAY_SPLIT_CHAR), F.col("category")
            ),
        )
    )


def alias_clusters(
    mentions: DataFrame,
    num_hash_tables: int = 5,
    ngram: int = 3,
    jaccard_threshold: float = 0.4,
) -> DataFrame:
    """MinHashLSH clustering of near-duplicate mentionNorms.

    Returns (mentionNorm, category, canonicalNorm, aliases). Canonical
    = lexicographic min of the connected pairs (single-link, one hop —
    bounded, deterministic). Scale path: LSH banding means candidate
    generation is a bucket join, not an all-pairs cross join.
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, NGram, RegexTokenizer

    norms = mentions.select("mentionNorm", "category").distinct().cache()
    chars = norms.withColumn(
        "chars", F.split(F.concat(F.lit("^"), "mentionNorm", F.lit("$")), "")
    )
    ng = NGram(n=ngram, inputCol="chars", outputCol="ngrams").transform(chars)
    cv_model = CountVectorizer(
        inputCol="ngrams", outputCol="features", binary=True, minDF=1.0
    ).fit(ng)
    feats = cv_model.transform(ng).where(
        F.expr("size(ngrams) > 0")
    )
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    ).fit(feats)
    pairs = (
        mh.approxSimilarityJoin(feats, feats, 1.0 - jaccard_threshold, "dist")
        .where(F.col("datasetA.category") == F.col("datasetB.category"))
        .select(
            F.col("datasetA.category").alias("category"),
            F.col("datasetA.mentionNorm").alias("a"),
            F.col("datasetB.mentionNorm").alias("b"),
        )
    )
    canon = pairs.groupBy("category", F.col("a").alias("mentionNorm")).agg(
        F.min("b").alias("canonicalNorm"),
        F.array_sort(F.collect_set("b")).alias("aliases"),
    )
    return norms.join(canon, ["mentionNorm", "category"], "left").select(
        "mentionNorm",
        "category",
        F.coalesce("canonicalNorm", "mentionNorm").alias("canonicalNorm"),
        F.coalesce("aliases", F.array("mentionNorm")).alias("aliases"),
    )
