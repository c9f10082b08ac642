"""Custom stateful streaming operator: cross-batch first-seen dedup.

The training-data use case: a continuous page/document feed where only
the FIRST occurrence of each content hash may pass downstream —
duplicates arriving in later micro-batches (hours or days later) must
be suppressed. Batch dedup (queries.dedup_exact) can't do this without
re-scanning history; the streaming-native answer is keyed state:

  stream.groupBy(key).applyInPandasWithState(first_seen_fn, ...)

State per key is a single `seen` flag persisted in the checkpointed
state store, so the operator survives restarts and the memory footprint
is O(distinct keys) spread across the state-store partitions — the
standard Structured Streaming scale shape (state shards with the
shuffle partitioning; RocksDB state store at production scale).

The reference has no streaming surface (SURVEY.md §2.10) — this extends
the engine for the continuous-ingest case the driver brief mandates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)
_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the earliest (ts, doc_id) row for this key once, ever."""
    if state.exists:
        # key already emitted in an earlier batch — swallow everything
        for _ in pdfs:
            pass
        return
    best = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf.sort_values(["ts", "doc_id"]).iloc[0]
        if best is None or (cand["ts"], cand["doc_id"]) < (
            best["ts"], best["doc_id"]
        ):
            best = cand
    if best is not None:
        state.update((True,))
        yield pd.DataFrame(
            {"key": [key[0]], "doc_id": [best["doc_id"]], "ts": [best["ts"]]}
        )


def first_seen_stream(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """(key, doc_id, ts) stream → first occurrence per key, exactly
    once across all micro-batches (state-store backed)."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_first_seen_dedup(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source wiring: parquet (key, doc_id, ts) in, deduped
    parquet out; checkpointed state survives restarts."""
    stream = (
        spark.readStream.schema(FIRST_SEEN_OUTPUT)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_path)
    )
    deduped = first_seen_stream(stream)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Watermarked event-time windowed aggregation (the late-data
    pattern): counts + value sums per (event_type, window). Rows
    arriving later than the watermark behind the max seen event time
    are dropped; closed windows emit exactly once (append mode).
    State is bounded by the watermark horizon — the standard
    Structured Streaming shape for unbounded feeds."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("nEvents"),
            F.round(F.sum("value"), 4).alias("totalValue"),
        )
        .select(
            F.col("w.start").alias("windowStart"),
            "event_type",
            "nEvents",
            "totalValue",
        )
    )


def dedup_within_watermark_stream(
    stream: DataFrame,
    key_col: str = "key",
    ts_col: str = "event_ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Built-in bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps one row per key among rows
    whose event times fall within the watermark delay of each other,
    then EVICTS the key's state once the watermark passes — unlike
    ``first_seen_stream`` (state = O(all keys ever), exactly-once
    forever), state here is O(keys within the watermark window), the
    right trade for endless feeds where duplicates cluster in time
    (re-crawls, retry storms). Prefer this built-in whenever the dedup
    horizon is bounded; the custom operator only for unbounded
    first-seen semantics."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        [key_col]
    )
