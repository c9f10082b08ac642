"""Entity-id parity: sha256(str((mentionNorm, category))) — reference
neo4j-app/neo4j_app/core/elasticsearch/to_neo4j.py:196-201."""

import hashlib

from pyspark.sql import functions as F

from datashare_extension_neo4j_spark.functions.hashing import (
    entity_id,
    entity_id_exact,
    make_entity_id,
)


def ref_id(norm, cat):
    h = hashlib.sha256()
    h.update(str((norm, cat)).encode("utf-8"))
    return h.hexdigest()


def test_driver_twin():
    assert make_entity_id("mention-0", "Location") == ref_id("mention-0", "Location")


def test_jvm_fast_path(spark):
    rows = [
        ("mention-0", "Location"),
        ("dev@icij.org", "EMAIL"),
        ("unicode-éλ", "Person"),
    ]
    df = spark.createDataFrame(rows, "norm string, cat string")
    got = df.select(
        "norm", "cat", entity_id(F.col("norm"), F.col("cat")).alias("eid")
    ).collect()
    for r in got:
        assert r["eid"] == ref_id(r["norm"], r["cat"])


def test_exact_path_arbitrary_strings(spark):
    rows = [
        ("o'brien", "Person"),
        ('quote"d', "Person"),
        ("back\\slash", "Location"),
        ("non-ascii-λ™", "ORG"),
    ]
    df = spark.createDataFrame(rows, "norm string, cat string")
    got = df.select(
        "norm", "cat", entity_id_exact(F.col("norm"), F.col("cat")).alias("eid")
    ).collect()
    for r in got:
        assert r["eid"] == ref_id(r["norm"], r["cat"])
