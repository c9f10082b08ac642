"""Title cascade goldens — ported case table from the reference
(tests/core/elasticsearch/test_to_neo4j.py:54-272)."""

from urllib.parse import quote_plus

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datashare_extension_neo4j_spark.functions.text import doc_title

CASES = [
    ({}, "doc-id"),
    ({"path": "/some/path"}, "path"),
    ({"path": "/some/path/"}, "doc-id"),
    ({"path": "/"}, "doc-id"),
    ({"path": ""}, "doc-id"),
    (
        {
            "path": "/some/path",
            "metadata": {"tika_metadata_resourcename": "resource-name"},
            "extractionLevel": 1,
        },
        "resource-name",
    ),
    (
        {
            "path": "/some/path",
            "metadata": {"tika_metadata_resourcename": "resource-name"},
            "extractionLevel": 0,
        },
        "path",
    ),
    (
        {
            "path": "/some/path",
            "metadata": {"tika_metadata_resourcename": "resource-name"},
        },
        "path",
    ),
    (
        {
            "path": "/some/path",
            "metadata": {"tika_metadata_resourcename": " resource-name "},
            "extractionLevel": 1,
        },
        "resource-name",
    ),
    (
        {
            "path": "/some/path",
            "metadata": {
                "tika_metadata_resourcename": f"=?{quote_plus('named=name')}?="
            },
            "extractionLevel": 1,
        },
        "named=name",
    ),
    (
        {"path": "/some/path", "metadata": {"tika_metadata_resourcename": " "}},
        "path",
    ),
    (
        {
            "path": "/some/path",
            "metadata": {"tika_metadata_resourcename": "resource-name"},
            "title": "some-title",
        },
        "some-title",
    ),
    (
        {
            "path": "/some/path",
            "metadata": {"tika_metadata_resourcename": "resource-name"},
            "title": " ",
            "extractionLevel": 1,
        },
        "resource-name",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "message/some-email-type",
            "metadata": {"tika_metadata_dc_title": "email-title"},
        },
        "email-title",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "application/vnd.ms-outlook",
            "metadata": {"tika_metadata_dc_title": "email-title"},
        },
        "email-title",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "message/some-email-type",
            "metadata": {"tika_metadata_dc_title": " email-title "},
        },
        "email-title",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "message/some-email-type",
            "metadata": {"tika_metadata_dc_title": " "},
        },
        "some-title",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "message/some-email-type",
            "metadata": {
                "tika_metadata_dc_title": "email-title",
                "tika_metadata_dc_subject": "email-dc-subject",
            },
        },
        "email-dc-subject",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "message/some-email-type",
            "metadata": {
                "tika_metadata_dc_title": "email-title",
                "tika_metadata_dc_subject": " ",
            },
        },
        "email-title",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "message/some-email-type",
            "metadata": {
                "tika_metadata_dc_title": "email-title",
                "tika_metadata_dc_subject": "email-dc-subject",
                "tika_metadata_subject": "email-subject",
            },
        },
        "email-subject",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "message/some-email-type",
            "metadata": {
                "tika_metadata_dc_title": "email-title",
                "tika_metadata_dc_subject": "email-dc-subject",
                "tika_metadata_subject": " ",
            },
        },
        "email-title",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "application/json; twint",
            "metadata": {"tika_metadata_dc_title": " tweet-title "},
        },
        "tweet-title",
    ),
    (
        {
            "path": "/some/path",
            "title": "some-title",
            "contentType": "application/json; twint",
            "metadata": {"tika_metadata_dc_title": " "},
        },
        "some-title",
    ),
]

SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("id", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("extractionLevel", T.LongType()),
        T.StructField("contentType", T.StringType()),
    ]
)


def test_title_cascade_goldens(spark):
    rows = [
        (
            i,
            "doc-id",
            src.get("path"),
            src.get("title"),
            src.get("metadata"),
            src.get("extractionLevel"),
            src.get("contentType"),
        )
        for i, (src, _) in enumerate(CASES)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = df.select(
        "i",
        doc_title(
            F.col("id"),
            F.col("path"),
            F.col("title"),
            F.col("metadata"),
            F.col("extractionLevel"),
            F.col("contentType"),
        ).alias("t"),
    ).collect()
    got = {r["i"]: r["t"] for r in out}
    for i, (src, expected) in enumerate(CASES):
        assert got[i] == expected, f"case {i}: {src!r} → {got[i]!r} != {expected!r}"


def test_long_id_truncated(spark):
    df = spark.createDataFrame(
        [(0, "a-very-long-document-id", None, None, None, None, None)], SCHEMA
    )
    out = df.select(
        doc_title(
            F.col("id"),
            F.col("path"),
            F.col("title"),
            F.col("metadata"),
            F.col("extractionLevel"),
            F.col("contentType"),
        ).alias("t")
    ).collect()[0]["t"]
    assert out == "a-very-lon"
