"""Sequence packing (pack_sequences): hand-computed boundary math on
a tiny corpus and the single-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pack_math_hand_example(spark, tmp_path):
    """One shard (ids ≡ 0 mod 8), L=128: docs of 100/60/130/0 tokens
    concatenate to offsets 0,100,160,290 — spans and offsets follow."""
    from datashare_extension_neo4j_spark.queries import pack_sequences

    rows = [
        (0, " ".join(["w"] * 100)),
        (8, " ".join(["w"] * 60)),
        (16, " ".join(["w"] * 130)),
        (24, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    got = {
        r.doc_id: r for r in pack_sequences(spark, sf).collect()
    }
    # doc 0: [0,100) -> pack 0, no span
    assert (got[0].packInShard, got[0].offsetInPack, got[0].spansBoundary) == (0, 0, False)
    # doc 8: [100,160) -> starts pack 0 offset 100, ends pack 1
    assert (got[8].packInShard, got[8].offsetInPack, got[8].endPackInShard, got[8].spansBoundary) == (0, 100, 1, True)
    # doc 16: [160,290) -> pack 1 offset 32, ends pack 2
    assert (got[16].packInShard, got[16].offsetInPack, got[16].endPackInShard, got[16].spansBoundary) == (1, 32, 2, True)
    # empty doc: zero-width at offset 34 of pack 2
    assert (got[24].nTokens, got[24].packInShard, got[24].offsetInPack, got[24].spansBoundary) == (0, 2, 34, False)


def test_pack_plan_single_shard_shuffle(spark):
    from datashare_extension_neo4j_spark.queries import pack_sequences

    plan = (
        pack_sequences(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "Exchange SinglePartition" not in plan
    assert "Python" not in plan
