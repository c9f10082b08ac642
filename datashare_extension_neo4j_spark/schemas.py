"""StructType schemas for every table the engine touches.

Input shape per BASELINE.json input_hint: pages(url, warc_ts, html,
text, lang). Document / mention row shapes mirror the reference's
fixed column sets (/root/reference/neo4j-app/neo4j_app/constants.py:20-31,95-107).
"""

from pyspark.sql import types as T

# primary input — Common-Crawl-style web pages (BASELINE.json:15)
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# document rows (reference DOC_COLUMNS + rootDocument)
DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("rootDocument", T.StringType(), True),
        T.StructField("dirname", T.StringType(), True),
        T.StructField("contentType", T.StringType(), True),
        T.StructField("contentLength", T.LongType(), True),
        T.StructField("extractionDate", T.StringType(), True),
        T.StructField("extractionLevel", T.LongType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
    ]
)

# mention rows (reference NE_COLUMNS)
MENTION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("documentId", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("mention", T.StringType(), True),
        T.StructField("mentionNorm", T.StringType(), False),
        T.StructField("mentionNormTextLength", T.IntegerType(), True),
        T.StructField("extractor", T.StringType(), True),
        T.StructField("extractorLanguage", T.StringType(), True),
        T.StructField("offsets", T.ArrayType(T.LongType()), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# materialized graph — property tables (SURVEY.md §1.4)
NODES_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
