"""Streaming MinHash-LSH near-dup detection (streaming/stateful.py):
band parity with the batch path, and cross-batch keeper semantics.
"""

from __future__ import annotations

import pandas as pd

T1 = "alpha beta gamma delta epsilon zeta eta theta"
T2 = "one two three four five six seven eight nine"
T3 = "iota kappa lambda mu nu xi omicron pi rho"


def test_streaming_bands_match_batch(spark, tmp_path):
    """The in-row band expressions must produce bit-identical band
    values to the batch explode→groupBy path (dedup_minhash_sig) —
    otherwise a streaming candidate could never be reconciled with a
    batch dedup decision."""
    from datashare_extension_neo4j_spark.queries import dedup_minhash_sig
    from datashare_extension_neo4j_spark.streaming.stateful import (
        streaming_band_keys,
    )

    sf = str(tmp_path)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [T1, T2, "word " + T1 + " word word"],
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{sf}/documents.parquet")
    batch = {
        str(r["doc_id"]): {r["band0"], r["band1"]}
        for r in dedup_minhash_sig(spark, sf).collect()
    }
    docs = spark.createDataFrame(
        [(str(i), t, 0) for i, t in zip(pdf["doc_id"], pdf["text"])],
        "doc_id string, text string, ts long",
    )
    stream_bands: dict[str, set] = {}
    for r in streaming_band_keys(docs).collect():
        stream_bands.setdefault(r["doc_id"], set()).add(r["band"])
    assert stream_bands == batch


def test_near_dup_stream_cross_batch(spark, tmp_path):
    """Doc with identical text arriving in a LATER micro-batch (and a
    second dup within the same batch) must be flagged against the
    first-ever occupant of its band buckets; distinct docs must not."""
    from datashare_extension_neo4j_spark.streaming.stateful import (
        start_near_dup_stream,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    batch1 = spark.createDataFrame(
        [("a", T1, 10), ("b", T2, 11)],
        "doc_id string, text string, ts long",
    )
    batch1.write.mode("append").parquet(inp)
    q = start_near_dup_stream(spark, inp, out, ck)
    q.awaitTermination(120)
    first = spark.read.parquet(out).collect()
    assert first == []  # both docs are unique so far

    # second wave, resumed from checkpoint: c and e duplicate T1
    batch2 = spark.createDataFrame(
        [("c", T1, 20), ("d", T3, 21), ("e", T1, 22)],
        "doc_id string, text string, ts long",
    )
    batch2.write.mode("append").parquet(inp)
    q2 = start_near_dup_stream(spark, inp, out, ck)
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    keeper_by_doc: dict[str, set] = {}
    for r in rows:
        keeper_by_doc.setdefault(r["doc_id"], set()).add(r["keeperDocId"])
    # c and e flagged against a (the first-ever bucket occupant,
    # surviving the restart via the state store); b and d clean
    assert keeper_by_doc == {"c": {"a"}, "e": {"a"}}
    # both of each dup's bands collide with the keeper's → 2 rows each
    assert len(rows) == 4
