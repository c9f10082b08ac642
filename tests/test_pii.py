"""PII detection/redaction (functions/pii.py) on hostile inputs.

The oracle-parity suite proves Spark↔DuckDB agreement on the synthetic
corpus; these tests pin the SEMANTICS on adversarial strings (boundary
decoys, adjacent matches, placeholder non-reentrancy, nulls) and the
plan shape (scan-wide scrub = zero shuffle, zero Python).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datashare_extension_neo4j_spark.functions.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    pii_count,
    redact_pii,
)


def _redact_one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        redact_pii(F.col("t")).alias("r"),
        pii_count(F.col("t"), EMAIL_RE).alias("ne"),
        pii_count(F.col("t"), IPV4_RE).alias("ni"),
        pii_count(F.col("t"), PHONE_RE).alias("np"),
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


def test_placeholders_are_not_reentrant(spark):
    # Letter-only placeholders can't spawn new matches for later rules
    # — redacting twice is a fixed point.
    once = _redact_one(spark, "a@b.co at 10.0.0.1").r
    df = spark.createDataFrame([(once,)], "t string")
    assert df.select(redact_pii(F.col("t")).alias("r")).first().r == once


def test_null_text_propagates(spark):
    row = _redact_one(spark, None)
    assert row.r is None and row.ne is None and row.ni is None


def test_pii_scrub_plan_is_scan_shaped(spark):
    """The registry query must stay a scan+project: no Exchange, no
    Python eval — the shape a 100-TB scrub pass requires."""
    from datashare_extension_neo4j_spark.queries import pii_scrub

    plan = pii_scrub(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
