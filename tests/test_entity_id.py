"""Entity-id parity: sha256(str((mentionNorm, category))) — reference
neo4j-app/neo4j_app/core/elasticsearch/to_neo4j.py:196-201.

The JVM expression must reproduce CPython repr byte-for-byte for
arbitrary strings (apostrophes, double quotes, backslashes, control
chars, non-break space, astral emoji) — a real corpus has "o'brien"
and smart-quoted web text, and divergent ids break cross-compatibility
with reference-built imports.
"""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datashare_extension_neo4j_spark.functions.hashing import (
    entity_id,
    entity_id_exact,
    make_entity_id,
    py_repr,
)


def ref_id(norm, cat):
    h = hashlib.sha256()
    h.update(str((norm, cat)).encode("utf-8"))
    return h.hexdigest()


ADVERSARIAL = [
    "mention-0",
    "dev@icij.org",
    "unicode-éλ",
    "o'brien",
    "d'angelo & sons",
    'quote"d',
    """both ' and " quotes""",
    "'",
    '"',
    "''\"\"''",
    "back\\slash",
    "\\",
    "mix '\\' all \" three",
    "tab\there",
    "new\nline",
    "cr\rhere",
    "nbsp\xa0space",
    "bell\x07",
    "nul\x00byte",
    "del\x7f",
    "esc\x1b[0m",
    "emoji 😀 astral",
    "zero​width",
    "line sep",
    "para sep",
    "cjk 北京",
    "",
    " ",
    "  leading and trailing  ",
]


def test_driver_twin():
    assert make_entity_id("mention-0", "Location") == ref_id("mention-0", "Location")


def test_jvm_expression_adversarial(spark):
    """The unconditional JVM path must match CPython repr on every
    adversarial string — both as norm and as category."""
    rows = [(s, "Person") for s in ADVERSARIAL] + [
        ("name", s) for s in ADVERSARIAL if s
    ]
    df = spark.createDataFrame(rows, "norm string, cat string")
    got = df.select(
        "norm",
        "cat",
        py_repr(F.col("norm")).alias("r"),
        entity_id(F.col("norm"), F.col("cat")).alias("eid"),
    ).collect()
    for r in got:
        assert r["r"] == repr(r["norm"]), f"repr mismatch for {r['norm']!r}"
        assert r["eid"] == ref_id(r["norm"], r["cat"]), (
            f"id mismatch for {(r['norm'], r['cat'])!r}"
        )


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    norms=st.lists(
        st.text(
            # printable-ascii + quotes/backslash/controls + a few
            # non-ascii classes; avoids recently-assigned codepoints
            # where JVM/CPython Unicode table versions could differ
            alphabet=st.sampled_from(
                list(
                    "abc XYZ09'\"\\\t\n\r"
                    "\x00\x07\x1b\x7f\xa0\xad"
                    "éλ€北😀​ 　"
                )
            ),
            max_size=24,
        ),
        min_size=1,
        max_size=16,
    )
)
def test_jvm_expression_property(spark, norms):
    df = spark.createDataFrame([(n, "PERSON") for n in norms], "norm string, cat string")
    got = df.select("norm", py_repr(F.col("norm")).alias("r")).collect()
    for r in got:
        assert r["r"] == repr(r["norm"]), f"repr mismatch for {r['norm']!r}"


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


def test_pipeline_golden_apostrophes(spark):
    """Full-pipeline golden: a gazetteer mention containing an
    apostrophe flows through entity/edge emission with the
    reference-matching id (the VERDICT round-1 adversarial case)."""
    from datashare_extension_neo4j_spark.operators.edges import appears_in_edges
    from datashare_extension_neo4j_spark.operators.entities import entity_nodes

    mentions = spark.createDataFrame(
        [
            ("m1", "doc-1", "o'brien", "PERSON", [3], "CORENLP", "en"),
            ("m2", "doc-1", "o'brien", "PERSON", [9], "CORENLP", "en"),
            ("m3", "doc-2", 'the "firm"', "ORGANIZATION", [0], "CORENLP", "en"),
        ],
        "id string, documentId string, mentionNorm string, category string,"
        " offsets array<long>, extractor string, extractorLanguage string",
    )
    ents = {r["mentionNorm"]: r["entityId"] for r in entity_nodes(mentions).collect()}
    assert ents["o'brien"] == ref_id("o'brien", "PERSON")
    assert ents['the "firm"'] == ref_id('the "firm"', "ORGANIZATION")
    edges = {r["mentionNorm"]: r["startId"] for r in appears_in_edges(mentions).collect()}
    assert edges["o'brien"] == ref_id("o'brien", "PERSON")
    assert edges['the "firm"'] == ref_id('the "firm"', "ORGANIZATION")
