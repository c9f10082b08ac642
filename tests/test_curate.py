"""curate_corpus: survivor-aware dedup keepers and verdict cascade.

The regression here is the keeper-dropped-group case: dedup must run
among SURVIVORS of the earlier stages — a near-dup cluster whose raw
min-id member fails the quality gate must still keep one copy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

A_TOKENS = [
    "alpha", "bravo", "charl", "delta", "echos", "foxtr", "golfs",
    "hotel", "india", "julie", "kilos", "limas", "mikes", "novem",
    "oscar", "papas",
]
TEXT_A = " ".join(A_TOKENS)  # 95 chars — fails the 100-char gate
TEXT_B = TEXT_A + " funding"  # 103 chars — passes; near-dup of A


@pytest.fixture(scope="module")
def sf(spark, tmp_path_factory):
    rows = [
        (0, "held out evaluation content entirely disjoint vocabulary"
            " benchmark sentences stretched out to pass the length gate"
            " with room to spare indeed"),
        (1, TEXT_A),
        (9, TEXT_B),
        (3, "completely different third document talking about rivers"
            " mountains forests deserts oceans and other landscape terms"
            " for filler purposes"),
    ]
    d = str(tmp_path_factory.mktemp("curate_sf"))
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).withColumn("n_chars", F.length("text")).write.parquet(
        f"{d}/documents.parquet"
    )
    return d


def test_setup_forms_the_cluster(spark, sf):
    """Precondition: 1 and 9 really are one near-dup cluster with raw
    keeper 1 — otherwise the survivor assertion below is vacuous."""
    from datashare_extension_neo4j_spark.queries import dedup_minhash_assign

    assign = {
        r.doc_id: r.keepDocId
        for r in dedup_minhash_assign(spark, sf).collect()
    }
    assert assign[9] == 1 and assign[1] == 1


def test_near_dup_keeper_among_survivors(spark, sf):
    """Doc 1 (raw cluster keeper) fails the quality gate; doc 9 must
    survive as the cluster's surviving keeper, NOT drop as 'nearDup'
    — a pipeline that dedups the raw corpus would lose every copy."""
    from datashare_extension_neo4j_spark.queries import curate_corpus

    got = {r.doc_id: r for r in curate_corpus(spark, sf).collect()}
    assert got[1].dropReason == "quality"
    assert got[9].curated and got[9].dropReason is None
    assert got[9].nearDupKept
    assert got[0].dropReason == "evalSlice"
    assert got[3].curated


def test_oracle_agrees_on_survivor_semantics(spark, sf):
    """The composition oracle must replay the survivor-aware keepers
    on this adversarial corpus, not just the driver's corpus."""
    import duckdb

    from datashare_extension_neo4j_spark.queries import (
        ORACLE_CURATE_CORPUS,
        curate_corpus,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: r
        for r in con.execute(
            f"SELECT doc_id, dropReason, curated FROM ({ORACLE_CURATE_CORPUS})"
        ).fetchall()
    }
    got = {r.doc_id: r for r in curate_corpus(spark, sf).collect()}
    assert set(want) == set(got)
    for i in want:
        assert (want[i][1], want[i][2]) == (
            got[i].dropReason,
            got[i].curated,
        ), i
