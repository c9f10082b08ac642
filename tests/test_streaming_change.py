"""Streaming capture-change detection (streaming/stateful.py):
per-capture flags must match the batch lag semantics of
queries.crawl_change_rate, continuously across micro-batches."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def _captures_batch(spark):
    """Deterministic capture stream: 6 pages x 4 captures; content
    changes on a known schedule."""
    rows = []
    for p in range(6):
        for k in range(4):
            # page p changes at capture 2 iff p is even; page 5 flaps
            if p == 5:
                h = f"h{k % 2}"
            elif p % 2 == 0 and k >= 2:
                h = "changed"
            else:
                h = "orig"
            rows.append((f"page-{p}", p * 100 + k, h))
    return spark.createDataFrame(
        rows, "pageUrl string, ts long, contentHash string"
    )


def _expected_flags(spark):
    from pyspark.sql import Window as W

    cap = _captures_batch(spark)
    prev = F.lag("contentHash").over(
        W.partitionBy("pageUrl").orderBy("ts")
    )
    return cap.select(
        "pageUrl",
        "ts",
        "contentHash",
        F.when(prev.isNull(), F.lit(None).cast("int"))
        .otherwise((F.col("contentHash") != prev).cast("int"))
        .alias("changed"),
    )


def test_change_stream_matches_batch_lag(spark, tmp_path):
    from datashare_extension_neo4j_spark.streaming.stateful import (
        CHANGE_OUTPUT,
        change_detect_stream,
    )

    cap = _captures_batch(spark)
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    # two files written sequentially = two ordered micro-batches
    # (per-page ts order across batches — the crawl-feed contract)
    cap.where("ts % 100 < 2").coalesce(1).write.parquet(src)
    time.sleep(1.1)
    cap.where("ts % 100 >= 2").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("pageUrl string, ts long, contentHash string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        change_detect_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, _expected_flags(spark).collect()))
    assert got == want
    assert spark.read.parquet(out).schema == CHANGE_OUTPUT


def test_change_stream_state_survives_restart(spark, tmp_path):
    """A second availableNow run over NEW files continues from the
    checkpointed per-page fingerprints: the first capture of the new
    run is flagged against the previous run's last hash, not null."""
    from datashare_extension_neo4j_spark.streaming.stateful import (
        change_detect_stream,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    schema = "pageUrl string, ts long, contentHash string"

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            change_detect_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(
        [("p", 1, "A")], schema
    ).coalesce(1).write.parquet(src)
    run_once()
    spark.createDataFrame(
        [("p", 2, "A"), ("p", 3, "B")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = {r.ts: r.changed for r in spark.read.parquet(out).collect()}
    assert got == {1: None, 2: 0, 3: 1}
