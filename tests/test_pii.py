"""PII detection/redaction (functions/pii.py) on hostile inputs.

The oracle-parity suite proves Spark↔DuckDB agreement on the synthetic
corpus; these tests pin the SEMANTICS on adversarial strings (boundary
decoys, adjacent matches, placeholder non-reentrancy, nulls) and the
plan shape (scan-wide scrub = zero shuffle, zero Python).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datashare_extension_neo4j_spark.functions.pii import (
    redact_pii,
    staged_pii_counts,
)


def _redact_one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    ne, ni, np = staged_pii_counts(F.col("t"))
    return df.select(
        redact_pii(F.col("t")).alias("r"),
        ne.alias("ne"),
        ni.alias("ni"),
        np.alias("np"),
    ).first()


def test_redacts_all_three_types(spark):
    row = _redact_one(
        spark,
        "mail a.b+c_d%e@sub.example.co.uk or 192.168.0.1 or +1 555-123-4567 now",
    )
    assert row.r == "mail <EMAIL> or <IP> or <PHONE> now"
    assert (row.ne, row.ni, row.np) == (1, 1, 1)


def test_adjacent_and_repeated_matches(spark):
    row = _redact_one(spark, "x@y.io z@w.ai 1.2.3.4 5.6.7.8")
    assert row.r == "<EMAIL> <EMAIL> <IP> <IP>"
    assert (row.ne, row.ni) == (2, 2)


def test_word_boundary_decoys_do_not_match(spark):
    # a1.2.3.4: no non-word→word transition before the first digit;
    # 1.2.3: too few octets; bare '@': no local part.
    row = _redact_one(spark, "a1.2.3.4 and 1.2.3 and x @ y")
    assert row.r == "a1.2.3.4 and 1.2.3 and x @ y"
    assert (row.ne, row.ni, row.np) == (0, 0, 0)


def test_staged_counts_match_placeholders_in_output(spark):
    """The adversarial interplay case: 'x@y.io1.2.3.4' has NO IPv4
    match in the raw text (no word boundary before the 1), but
    redacting the email first creates one — staged counts must agree
    with what the redacted output actually contains."""
    row = _redact_one(spark, "x@y.io1.2.3.4 and x@1.2.3.4.com")
    assert row.r.count("<EMAIL>") == row.ne
    assert row.r.count("<IP>") == row.ni
    assert row.r.count("<PHONE>") == row.np
    assert (row.ne, row.ni) == (2, 1)


def test_placeholders_are_not_reentrant(spark):
    # Letter-only placeholders can't spawn new matches for later rules
    # — redacting twice is a fixed point.
    once = _redact_one(spark, "a@b.co at 10.0.0.1").r
    df = spark.createDataFrame([(once,)], "t string")
    assert df.select(redact_pii(F.col("t")).alias("r")).first().r == once


def test_null_text_propagates(spark):
    row = _redact_one(spark, None)
    assert row.r is None and row.ne is None and row.ni is None


def test_streaming_scrub_matches_batch(spark, tmp_path):
    """PII scrub as a continuous stage: streaming output must be
    byte-identical to the batch redaction of the same rows, and a
    second wave resumed from the checkpoint appends only new docs."""
    from datashare_extension_neo4j_spark.streaming.ingest import (
        start_pii_scrub_stream,
    )

    inp, out, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    wave1 = spark.createDataFrame(
        [
            (1, "mail a@b.co now"),
            (2, "host 10.0.0.1 call +1 555-123-4567"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    wave1.write.mode("append").parquet(inp)
    start_pii_scrub_stream(spark, inp, out, ck).awaitTermination(120)
    got1 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    batch = {
        r.doc_id: r
        for r in wave1.select(
            "doc_id",
            redact_pii(F.col("text")).alias("text"),
        ).collect()
    }
    assert len(got1) == 3
    assert all(got1[i].text == batch[i].text for i in batch)
    assert got1[2].nRedacted == 2 and got1[3].nRedacted == 0

    spark.createDataFrame(
        [(4, "late x@y.io")], "doc_id long, text string"
    ).write.mode("append").parquet(inp)
    start_pii_scrub_stream(spark, inp, out, ck).awaitTermination(120)
    got2 = spark.read.parquet(out).collect()
    assert len(got2) == 4  # wave-1 files not reprocessed
    assert {r.text for r in got2 if r.doc_id == 4} == {"late <EMAIL>"}


def test_pii_scrub_plan_is_scan_shaped(spark):
    """The registry query must stay a scan+project: no Exchange, no
    Python eval — the shape a 100-TB scrub pass requires."""
    from datashare_extension_neo4j_spark.queries import pii_scrub

    plan = pii_scrub(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
