"""Entity community detection (kg_entity_communities): oracle parity,
synthetic multi-community structure, and the all-singleton edge case
(threshold prunes every edge → CC runs on an empty graph).
"""

from __future__ import annotations

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _duck(sf=SF_DIR):
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_communities_oracle_parity(spark):
    from datashare_extension_neo4j_spark.queries import (
        ORACLE_KG_ENTITY_COMMUNITIES,
        kg_entity_communities,
    )

    got = sorted(
        (r["entity"], r["community"])
        for r in kg_entity_communities(spark, SF_DIR).collect()
    )
    want = sorted(
        map(tuple, _duck().execute(ORACLE_KG_ENTITY_COMMUNITIES).fetchall())
    )
    assert got == want and len(got) > 0
    # every community label is itself a member entity of that community
    labels = {c for _, c in got}
    members = {e for e, _ in got}
    assert labels <= members


def test_communities_synthetic_structure(spark):
    """Two strong components and one isolated entity: the weight-1
    bridge edge between the components must be pruned by the
    threshold."""
    from datashare_extension_neo4j_spark.operators.graph_algos import (
        connected_components,
    )
    from pyspark.sql import functions as F

    # docs d1/d2 bind a-b twice; d3/d4 bind c-d twice; d5 bridges b-c
    # ONCE (below min_shared_docs=2); entity e never co-occurs.
    inc = spark.createDataFrame(
        [
            ("a", "d1"), ("b", "d1"), ("a", "d2"), ("b", "d2"),
            ("c", "d3"), ("d", "d3"), ("c", "d4"), ("d", "d4"),
            ("b", "d5"), ("c", "d5"),
            ("e", "d6"),
        ],
        "entity string, documentId string",
    )
    pairs = (
        inc.alias("x")
        .join(
            inc.alias("y"),
            (F.col("x.documentId") == F.col("y.documentId"))
            & (F.col("x.entity") < F.col("y.entity")),
        )
        .groupBy(
            F.col("x.entity").alias("entityA"),
            F.col("y.entity").alias("entityB"),
        )
        .agg(F.count("*").alias("nSharedDocs"))
    )
    strong = pairs.where(F.col("nSharedDocs") >= 2).select(
        "entityA", "entityB"
    )
    cc = connected_components(strong, "entityA", "entityB")
    ents = inc.select("entity").distinct()
    out = {
        r["entity"]: r["community"]
        for r in ents.join(cc, ents.entity == cc.node, "left")
        .select(
            "entity",
            F.coalesce(F.col("comp"), F.col("entity")).alias("community"),
        )
        .collect()
    }
    assert out == {"a": "a", "b": "a", "c": "c", "d": "c", "e": "e"}


def test_communities_all_singletons_when_threshold_prunes_all(spark):
    """A threshold above every edge weight leaves an empty CC input;
    every entity must come back as its own singleton community."""
    from datashare_extension_neo4j_spark.queries import (
        kg_entity_communities,
    )

    out = kg_entity_communities(spark, SF_DIR, min_shared_docs=10**9)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["entity"] == r["community"] for r in rows)
